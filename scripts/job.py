"""`ray job submit` entrypoint: the flagship pipeline as a batch job.

On a real cluster:
    ray job submit --working-dir . -- python scripts/job.py \
        --input /data/docs --output /data/out --level 6

Reads an interleaved-doc table (or synthesizes one from an events
table when given --from-events), extracts geo spans, builds the
partitioned spatial index with checkpoint/resume + lineage manifest,
and writes the cell directory. Rerunning after a failure skips
finished partitions (see geograft.pipeline).

Locally (this sandbox) it runs the same code under
ray.init(address="local").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default="/root/testdata/sf0.001")
    p.add_argument("--output", default="/tmp/geograft_job_out")
    p.add_argument("--level", type=int, default=6)
    p.add_argument("--target-rows", type=int, default=500_000)
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from geograft import fixtures as FX
    from geograft import ops, pipeline, synth
    from geograft.io import read_parquet_sized

    t0 = time.perf_counter()
    docs = read_parquet_sized(f"{args.input}/events.parquet").map_batches(
        synth.docs_from_events, batch_format="pyarrow", batch_size=None
    )
    geoms = ops.extract_geometries(docs)
    man = pipeline.build_partitioned_index(
        geoms, os.path.join(args.output, "index"),
        base_level=args.level, bounds=FX.POINTS_BOUNDS,
        target_rows=args.target_rows,
    )
    pipeline.sanity_check_index(os.path.join(args.output, "index"))
    summary = {
        "rows": man["total_rows"],
        "partitions": len(man["partitions"]),
        "built": man["built_cells"],
        "resumed": man["resumed_cells"],
        "wall_sec": round(time.perf_counter() - t0, 2),
        "output": args.output,
    }
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
