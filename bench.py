"""geograft benchmark — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N}

--scaling: runs the same bench in two fresh processes at
RAY_GRAFT_CPUS=8 and =32 on the same input and reports throughput at
both plus scaling efficiency (the sandbox evidence for the north
rule's two-cluster-size criterion — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _pipelines():
    import pyarrow as pa

    from geograft import fixtures as FX
    from geograft.io import read_parquet_sized
    from geograft import ops, synth

    def q_extract_tiles():
        # flagship: events -> interleaved docs -> span explode -> geo parse
        # -> owner cells -> cell directory
        docs = read_parquet_sized(f"{SF_DIR}/events.parquet").map_batches(
            synth.docs_from_events, batch_format="pyarrow", batch_size=None
        )
        geoms = ops.extract_geometries(docs)
        return ops.cell_directory(geoms, level=6, bounds=FX.POINTS_BOUNDS).count()

    def q_spatial_join():
        return ops.spatial_join(
            FX.join_left_ds(SF_DIR), FX.join_right_ds(SF_DIR), level=4, bounds=FX.JOIN_BOUNDS
        ).count()

    def q_knn():
        import numpy as np

        rng = np.random.default_rng(42)
        qn = 100
        q = pa.table(
            {
                "qid": np.arange(qn),
                "x": rng.uniform(0, 560, qn),
                "y": rng.uniform(0, 1500, qn),
            }
        )
        return ops.knn(FX.points_ds(SF_DIR), q, k=10, concurrency=4).count()

    def q_envelope_scan():
        return ops.locate_in_envelope_intersecting(
            FX.rects_ds(SF_DIR), 1000.0, 10.0, 30000.0, 60.0
        ).count()

    return {
        "extract_tiles": q_extract_tiles,
        "spatial_join": q_spatial_join,
        "knn": q_knn,
        "envelope_scan": q_envelope_scan,
    }


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.WARNING)

    # warm the page cache so we measure compute + shuffle, not first disk read
    import pyarrow.parquet as pq

    for t in ("events", "lineitem", "supplier", "part"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    times = {}
    for name, fn in _pipelines().items():
        t0 = time.perf_counter()
        n = fn()
        times[name] = round(time.perf_counter() - t0, 3)
        sys.stderr.write(f"# {name}: {times[name]}s (rows={n})\n")
    ray.shutdown()
    return {
        "metric": "geograft headline pipelines wall-clock",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling efficiency (num_cpus 8 -> 32, fresh processes, same input)",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "queries_8": r_lo["queries"],
        "queries_32": r_hi["queries"],
        "speedup": round(r_lo["value"] / r_hi["value"], 3),
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
