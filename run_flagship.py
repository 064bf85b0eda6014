"""Cluster entry point for the flagship pipeline (``ray job submit`` style).

Single-node local example (this sandbox):
    python run_flagship.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/flagship_out --num-buckets 32

On a real cluster the same script is the job payload:
    ray job submit --working-dir . -- python run_flagship.py \
        --address auto --sf-dir s3://bucket/corpus --out s3://bucket/features

Output is a resumable per-partition checkpoint directory (parquet +
lineage manifests): re-running after a crash verifies finished partitions
and computes only the missing buckets (north-rule resumability on the
real pipeline, not just the unit).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-buckets", type=int, default=32)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local mode only; omit on a cluster")
    ap.add_argument("--address", default="local")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        kwargs = dict(address=args.address, include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from feature_extraction_ray.pipelines.flagship import flagship_checkpointed

    t0 = time.time()
    stats = flagship_checkpointed(args.sf_dir, args.out,
                                  num_buckets=args.num_buckets,
                                  repeat=args.repeat)
    stats["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(stats))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
