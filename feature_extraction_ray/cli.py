"""Job entry points — the ``ray job submit`` surface.

On a real cluster each subcommand is submitted as a Ray job; the script
connects to the cluster address the Job API provides (``RAY_ADDRESS``)
and otherwise runs identically to a local invocation:

    ray job submit --working-dir . -- \
        python -m feature_extraction_ray.cli flagship \
        --sf-dir /data/corpus --out /data/features --num-buckets 4096

    python -m feature_extraction_ray.cli dedup --sf-dir /root/testdata/sf0.1 \
        --out /tmp/dedup --threshold 0.8
    python -m feature_extraction_ray.cli query --name q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01

The CLI owns the Ray session (library code never calls ``ray.init`` —
repo convention): init is guarded so a pre-initialized driver (the Job
API, a test harness) is reused, and ``ray.shutdown()`` runs on exit so
consecutive local invocations start clean. Every subcommand prints one
JSON status line; ``flagship`` is resumable — rerunning with the same
``--out`` verifies per-partition lineage manifests and computes only
missing buckets (`state/checkpoint.py`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR",
                 log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_flagship(args) -> dict:
    from .pipelines.flagship import flagship_checkpointed
    stats = flagship_checkpointed(args.sf_dir, args.out,
                                  num_buckets=args.num_buckets,
                                  repeat=args.repeat)
    return {"job": "flagship", "out": args.out, **stats}


def cmd_dedup(args) -> dict:
    from .stages.dedup import minhash_lsh_dedup, truncation_report
    import ray.data as rd
    ds = rd.read_parquet(f"{args.sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = minhash_lsh_dedup(ds, threshold=args.threshold,
                            output="dataset")
    out.write_parquet(args.out)
    return {"job": "dedup", "out": args.out,
            "truncation": truncation_report()}


def cmd_query(args) -> dict:
    from .pipelines.queries import QUERIES
    res = QUERIES[args.name](args.sf_dir)
    if args.out:
        if hasattr(res, "write_parquet"):      # ray.data.Dataset
            res.write_parquet(args.out)
        else:                                  # pandas DataFrame result
            import os
            import pyarrow as pa
            import pyarrow.parquet as pq
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(res, preserve_index=False),
                           os.path.join(args.out, "part-00000.parquet"))
        return {"job": "query", "name": args.name, "out": args.out}
    # row count without collecting: Dataset.count() never materializes
    # the result on the driver (fan-out queries can be huge)
    n = res.count() if hasattr(res, "count") and not hasattr(res, "index") \
        else len(res)
    return {"job": "query", "name": args.name, "rows": int(n)}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="feature_extraction_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("flagship", help="resumable checkpointed flagship")
    f.add_argument("--sf-dir", required=True)
    f.add_argument("--out", required=True)
    f.add_argument("--num-buckets", type=int, default=32)
    f.add_argument("--repeat", type=int, default=1)
    f.set_defaults(fn=cmd_flagship)

    d = sub.add_parser("dedup", help="MinHash-LSH near-dup assignment")
    d.add_argument("--sf-dir", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--threshold", type=float, default=0.8)
    d.set_defaults(fn=cmd_dedup)

    q = sub.add_parser("query", help="run one registered query")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", required=True)
    q.add_argument("--out", default=None)
    q.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    ray = _ray_session()
    t0 = time.perf_counter()
    try:
        status = args.fn(args)
    finally:
        ray.shutdown()
    status["sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(status))
    return 0


if __name__ == "__main__":
    sys.exit(main())
