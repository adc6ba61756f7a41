"""Data-size-driven shuffle sizing.

Every coarse hash-partition exchange in this engine feeds a
``groupby(bucket).map_groups`` stage whose contract is "one whole
bucket materializes in one task's heap". A FIXED bucket count breaks
that contract at scale: with 32 buckets, a 100 TB input puts ~3 TB in
each task. The bucket count must grow with the data.

``shuffle_buckets`` sizes the exchange from the INPUT's estimated
in-memory bytes — ~``TARGET_BUCKET_BYTES`` per bucket (default 512 MB,
inside the 256 MB-1 GB band a worker heap comfortably holds), floored
at 2x the cluster's cores so small inputs still use every slot, capped
only far beyond any real cluster. The estimate comes from Ray Data's
own plan metadata (parquet row-group statistics / in-memory block
sizes) and NEVER triggers execution — sizing a pipeline must not run
it. Unknown sizes fall back to the floor, which is the pre-round-3
fixed-constant behavior but cluster-proportional.

Checkpoint-resumable sinks must persist the chosen count in their
manifest and REUSE it on resume (bucket ids are only meaningful under
the count that produced them); see ``textops.checkpointed_dedup_exact``
and ``pipeline.checkpointed_spatial_join``.
"""

from __future__ import annotations

import os

TARGET_BUCKET_BYTES = 512 << 20
# Parquet on disk is typically 2-6x smaller than in-memory Arrow; used
# only when plan metadata is absent and we fall back to file sizes.
PARQUET_INFLATION = 4
MAX_BUCKETS = 1 << 20


def cluster_cpus() -> int:
    """Total CPUs Ray sees (driver-side; cheap), or the host count."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 0)) or (
                os.cpu_count() or 8
            )
    except Exception:
        pass
    return os.cpu_count() or 8


def input_bytes_estimate(ds) -> int | None:
    """Estimated in-memory bytes of a Dataset's INPUT, from plan
    metadata only — never executes the pipeline (``ds.size_bytes()``
    does, on any transformed dataset). Walks the logical plan for Read
    operators (datasource row-group estimates survive any chain of
    transforms) and From* operators (local blocks with exact sizes).
    Returns None when nothing in the plan carries a size."""
    try:
        total = 0.0
        found = False
        seen: set[int] = set()
        stack = [ds._logical_plan.dag]
        while stack:
            op = stack.pop()
            if id(op) in seen:
                continue
            seen.add(id(op))
            est = None
            src = getattr(op, "_datasource", None)
            if src is not None and hasattr(src, "estimate_inmemory_data_size"):
                est = src.estimate_inmemory_data_size()
            elif hasattr(op, "input_data"):
                try:
                    est = sum(b.size_bytes() for b in op.input_data)
                except Exception:
                    est = None
            if est:
                total += float(est)
                found = True
            stack.extend(op.input_dependencies)
        return int(total) if found else None
    except Exception:
        return None


def input_rows_estimate(ds) -> int | None:
    """Estimated INPUT row count from plan metadata only (parquet
    footer num_rows / local block counts) — never executes. None when
    nothing in the plan carries a count."""
    try:
        total = 0
        found = False
        seen: set[int] = set()
        stack = [ds._logical_plan.dag]
        while stack:
            op = stack.pop()
            if id(op) in seen:
                continue
            seen.add(id(op))
            src = getattr(op, "_datasource", None)
            meta = getattr(src, "_metadata", None) if src is not None else None
            if meta:
                rows = [getattr(m, "num_rows", None) for m in meta]
                if all(r is not None for r in rows):
                    total += int(sum(rows))
                    found = True
            elif hasattr(op, "input_data"):
                try:
                    total += int(sum(b.num_rows() for b in op.input_data))
                    found = True
                except Exception:
                    pass
            stack.extend(op.input_dependencies)
        return total if found else None
    except Exception:
        return None


def shuffle_buckets(*dss, n_bytes: int | None = None,
                    target_bytes: int = TARGET_BUCKET_BYTES,
                    floor: int | None = None) -> int:
    """Bucket count for a coarse hash exchange over the given
    dataset(s) (a join passes both sides; their estimates sum).

    count = clamp(ceil(input_bytes / target_bytes),
                  floor = max(2 * cluster CPUs, 64), MAX_BUCKETS)

    The memory target only bounds bucket SIZE (an upper bound, i.e. a
    lower bound on count). The floor is a WORK-BALANCE bound: buckets
    are reduce tasks, and coarse granularity starves the cluster —
    measured on the 200k-doc jaccard suite input at 8 CPUs, 16 buckets
    ran 2.4x slower than 64 (155 s vs 65 s) because per-bucket pandas
    merges superlinearize and stragglers idle the other slots. The
    floor is also NOT proportional to CPUs beyond 2x: an 8x multiplier
    put 256 buckets under the sf0.1 bench at 32 CPUs and per-task sort
    overhead regressed the 12-pipeline total 14.8 s -> 24.2 s (256 was
    already within noise of 64 at suite scale, so extra granularity
    buys nothing the data-size term doesn't).

    Callers capture the returned count ONCE at pipeline-build time so
    the map_batches bucket-id closures and the downstream groupby agree.
    Pass ``n_bytes`` to override the estimate (e.g. from a manifest).
    """
    if floor is None:
        floor = max(2 * cluster_cpus(), 64)
    if n_bytes is None:
        total = 0
        found = False
        for ds in dss:
            est = input_bytes_estimate(ds)
            if est:
                total += est
                found = True
        n_bytes = total if found else None
    if not n_bytes:
        return floor
    need = -(-int(n_bytes) // int(target_bytes))
    return int(min(MAX_BUCKETS, max(floor, need)))
