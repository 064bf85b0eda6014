"""feature_extraction_ray — a Ray-Data-native feature-engineering engine.

A from-scratch rebuild of the capabilities of ``kmatton/Feature-Extraction``
(reference at ``/root/reference``) as a single streaming engine over Parquet
tables of pre-tokenized sequences:

* point-in-time **as-of join** (broadcast and hash-partitioned paths),
* **windowed operators**: lag/lead shift, forward/backward fill, gap-based
  sessionization, sliding-window aggregates,
* per-group **ordered feature aggregates** (verbosity, lexical diversity /
  MATTR, speech-graph metrics, confidence/timing stat packs),
* training-data-scale ops: exact & near **dedup** (MinHash-LSH, SimHash,
  n-gram Jaccard), embedding **similarity search**, text analysis
  (language-id, quality scoring, fingerprinting), stdlib multimodal
  decode (BMP/WAV/concat-video),
* corpus **curation**: benchmark decontamination, PII redaction,
  token-budget quota sampling, repetition statistics, repeated-substring
  detection, sequence packing,
* per-partition **checkpoint/lineage** manifests for resumable runs.

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines with
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, and a single explicit shuffle primitive (entity-hash bucketing)
under every order-sensitive operator. Library code never calls
``ray.init``/``ray.shutdown`` — sessions are owned by entry points only.
"""

__version__ = "0.1.0"
