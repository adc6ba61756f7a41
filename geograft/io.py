"""Parquet IO sized for streaming execution.

Ray's read_parquet defaults its output-block count to the CPU count,
which oversplits small inputs (64 blocks for a 5 MB file) and drowns
vectorized kernels in per-task overhead. Block count should follow DATA
SIZE: ~TARGET_BLOCK_BYTES per block — at 100 TB that is ~800k blocks
(streaming, pipelined), in the sandbox it is 1-8 blocks. Column pruning
is mandatory at this layer (prune at the read, SURVEY.md §4.2).
"""

from __future__ import annotations

import os

TARGET_BLOCK_BYTES = 128 * 1024 * 1024


def read_parquet_sized(path: str, columns: list[str] | None = None, **kwargs):
    """read_parquet with block count proportional to file bytes.

    Parquet compresses ~3-4x vs in-memory Arrow, so blocks target
    TARGET_BLOCK_BYTES/4 of file bytes each.
    """
    import ray.data as rd

    size = 0
    if os.path.isfile(path):
        size = os.path.getsize(path)
    elif os.path.isdir(path):
        size = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
        )
    if size and "override_num_blocks" not in kwargs:
        kwargs["override_num_blocks"] = max(1, (size * 4) // TARGET_BLOCK_BYTES)
    return rd.read_parquet(path, columns=columns, **kwargs)
