"""feature_extraction_ray — a Ray-Data-native feature-engineering engine.

A from-scratch rebuild of the capabilities of ``kmatton/Feature-Extraction``
(reference at ``/root/reference``) as a single streaming engine over Parquet
tables of pre-tokenized sequences:

* point-in-time **as-of join** (broadcast and hash-partitioned paths),
* **windowed operators**: lag/lead shift, forward/backward fill, gap-based
  sessionization, sliding-window aggregates,
* per-group **ordered feature aggregates** (verbosity, lexical diversity /
  MATTR, speech-graph metrics, confidence/timing stat packs),
* general **relational core**: M:N partitioned hash join (hot-key
  salting), broadcast / semi / anti / range-lookup / interval / full-outer
  joins, SCD2 history + point-in-time lookup, rollup/cube/grouping sets,
  window-function families, exact global qcut, stable row numbering,
* training-data-scale ops: exact & near **dedup** (MinHash-LSH, SimHash,
  n-gram Jaccard, perceptual image/audio/video), embedding **similarity
  search** (brute / LSH / IVF / PQ / persistent IVF-PQ / MMR, distributed
  PCA), BM25 **retrieval** with a persistent bucket-pruned inverted
  index, text analysis (language-id, quality scoring, fingerprinting,
  TF-IDF/NB/PPMI/BPE), stdlib multimodal codecs (BMP/PNG/JPEG/GIF/WAV/
  concat-video) with resize / frame-sample stages,
* corpus **curation & data selection**: benchmark decontamination (exact
  + fuzzy), PII redaction, Gopher repetition gates, token-budget quota
  sampling, temperature mixture weights, DSIR importance resampling,
  GPT-3-style classifier quality sampling, sequence packing, and the
  end-to-end **training-shard builder** (token-native mode emits exact
  (n, seq_len) int32 training matrices),
* storage-aware layouts: zone-mapped sorted parquet with file-pruned
  reads and a shuffle-free SMB merge join; one-pass column profiler,
* per-partition **checkpoint/lineage** manifests for resumable runs
  (flagship, minhash dedup, shard builds all kill-and-resume tested).

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines with
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, and a single explicit shuffle primitive (entity-hash bucketing)
under every order-sensitive operator. Library code never calls
``ray.init``/``ray.shutdown`` — sessions are owned by entry points only.
"""

__version__ = "0.1.0"
