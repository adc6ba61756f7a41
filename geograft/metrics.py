"""Per-stage throughput metrics for executed pipelines.

The reference is a single-process library with no runtime metrics
surface; a distributed engine needs one (north star: "per-partition
lineage records and per-stage throughput metrics").  The per-PARTITION
lineage already lives in the index manifest (pipeline.py: rows / bytes
/ wall_ms / envelope per cell); this module adds the per-STAGE view,
pulled from Ray Data's own execution stats after a dataset has run —
no extra passes, no instrumentation in the hot path.

``stage_metrics(ds)`` -> list of per-operator records (name, wall
seconds, UDF seconds, output rows / bytes, rows per second) in
execution order, walking the full plan including upstream stages.
``run_with_metrics(make_ds)`` executes a pipeline and returns
(result_dataset, report) where the report also carries end-to-end wall
time and total rows; pass ``sidecar=`` to persist it as JSON for a
post-run dashboard or a resume audit.
"""
from __future__ import annotations

import json
import os
import time


def _op_record(op) -> dict:
    rows = op.output_num_rows or {}
    out_rows = int(rows.get("sum") or 0)
    wall = op.wall_time or {}
    # wall_time is per-block {min,max,mean,sum}; the stage's real
    # elapsed span is latest_end - earliest_start when available
    # (blocks run concurrently, so sum overcounts).
    span = None
    if op.latest_end_time and op.earliest_start_time:
        span = max(op.latest_end_time - op.earliest_start_time, 0.0)
    busy = float(wall.get("sum") or 0.0)
    elapsed = span if span is not None else busy
    udf = op.udf_time or {}
    size = op.output_size_bytes or {}
    return {
        "stage": op.operator_name,
        "elapsed_s": round(elapsed, 4),
        "task_busy_s": round(busy, 4),
        "udf_s": round(float(udf.get("sum") or 0.0), 4),
        "output_rows": out_rows,
        "output_bytes": int(size.get("sum") or 0),
        "rows_per_sec": round(out_rows / elapsed, 1) if elapsed > 0 else None,
    }


def stage_metrics(ds) -> list[dict]:
    """Per-operator throughput records for an EXECUTED Dataset, in
    execution (upstream-first) order.  Uses Ray Data's structured stats
    summary; returns [] when the dataset has not executed yet."""
    # The whole walk reads private Ray operator-stats attributes
    # (output_num_rows, wall_time, udf_time, latest_end_time, ...); a
    # Ray minor-version change to any of them must degrade to [] —
    # this runs inside build_partitioned_index's manifest write, and
    # metrics are never worth failing an index build over.
    try:
        summ = ds._plan.stats().to_summary()
        out: list[dict] = []
        seen: set[int] = set()

        def walk(s):
            if id(s) in seen:
                return
            seen.add(id(s))
            for p in s.parents:
                walk(p)
            for op in s.operators_stats:
                out.append(_op_record(op))

        walk(summ)
        return out
    except Exception:
        return []


def run_with_metrics(make_ds, sidecar: str | None = None):
    """Execute ``make_ds()`` (a zero-arg callable returning a Dataset),
    materialize it, and return (dataset, report).  The report has
    end-to-end wall seconds, total output rows, and the per-stage
    records.  ``sidecar``: optional path; the report is written there
    as JSON (atomic rename) so long pipelines leave an auditable
    per-stage throughput record next to their output."""
    t0 = time.perf_counter()
    ds = make_ds()
    ds = ds.materialize()
    wall = time.perf_counter() - t0
    stages = stage_metrics(ds)
    rows = int(ds.count())
    report = {
        "wall_s": round(wall, 4),
        "rows": rows,
        "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
        "stages": stages,
    }
    if sidecar:
        tmp = sidecar + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=1)
        os.replace(tmp, sidecar)
    return ds, report
