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


def _pin_fsspec_http_probe() -> None:
    """Make Ray's lazy `from fsspec.implementations.http import
    HTTPFileSystem` probe deterministic under threads. In this
    environment the module always fails to import (no aiohttp); Ray
    catches that ModuleNotFoundError — but when two threads race the
    first import, the loser sees a partially-initialized module and
    gets a bare ImportError instead, which Ray does NOT catch. Pin a
    stub module with a placeholder class: the probe's isinstance checks
    are then simply False, on every thread, every time."""
    import sys

    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import types

        m = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # placeholder — never instantiated
            pass

        m.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = m
        try:
            import fsspec.implementations as _fi

            _fi.http = m
        except ImportError:
            pass


_pin_fsspec_http_probe()

TARGET_BLOCK_BYTES = 128 * 1024 * 1024
# Small inputs are still split for parallelism, but never below this many
# file bytes per block (per-task overhead would dominate), and never into
# more than MAX_SMALL_PARALLELISM blocks.
MIN_BLOCK_FILE_BYTES = 256 * 1024
MAX_SMALL_PARALLELISM = 32


def read_parquet_sized(path: str, columns: list[str] | None = None, **kwargs):
    """read_parquet with block count driven by data volume.

    Large inputs: ~TARGET_BLOCK_BYTES of in-memory Arrow per block
    (parquet compresses ~4x), i.e. ~800k blocks at 100 TB — streaming,
    pipelined, spillable. Small inputs: enough blocks to keep every
    core busy, floored at MIN_BLOCK_FILE_BYTES per block so vectorized
    kernels aren't drowned in per-task overhead.
    """
    import ray.data as rd

    size = 0
    first_file = None
    if os.path.isfile(path):
        size = os.path.getsize(path)
        first_file = path
    elif os.path.isdir(path):
        for r, _, fs in os.walk(path):
            for f in fs:
                size += os.path.getsize(os.path.join(r, f))
                if first_file is None and f.endswith(".parquet"):
                    first_file = os.path.join(r, f)
    if size and "override_num_blocks" not in kwargs:
        by_target = (size * 4) // TARGET_BLOCK_BYTES
        small_par = min(MAX_SMALL_PARALLELISM, size // MIN_BLOCK_FILE_BYTES)
        kwargs["override_num_blocks"] = int(max(1, by_target, small_par))
    if "schema" not in kwargs and first_file is not None:
        # pandas-written parquet carries a b'pandas' schema-metadata
        # dict; pa.Schema.__hash__ chokes on it, which disables Ray's
        # block-schema dedup (unify_schemas warns "Failed to hash the
        # schemas" on every plan). Hand Ray a metadata-free schema so
        # every downstream schema comparison is hashable.
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq

            fsch = pq.read_schema(first_file).remove_metadata()
            kwargs["schema"] = (
                pa.schema([fsch.field(c) for c in columns])
                if columns else fsch
            )
        except Exception:
            pass  # unreadable footer / missing column: let Ray report it
    return rd.read_parquet(path, columns=columns, **kwargs)


def read_table_sized(path: str, columns: list[str] | None = None, **kwargs):
    """Format-dispatching reader: Lance datasets (the north-star input
    format — a `.lance` directory) via `ray.data.read_lance` when the
    `lance` package is importable, parquet otherwise. Lance gives
    column pruning + fragment-level parallelism natively; the parquet
    path adds the data-size-driven block count above. The container
    this engine is developed in has no `lance` wheel, so the Lance
    branch is import-gated with a precise error instead of a silent
    fallback — pointing a Lance URI at the parquet reader would be a
    data-corruption class mistake, not a degradation."""
    is_lance = path.rstrip("/").endswith(".lance") or (
        os.path.isdir(path) and os.path.isdir(os.path.join(path, "_versions"))
    )
    if is_lance:
        try:
            import lance  # noqa: F401
            import ray.data as rd
        except ImportError as e:
            raise ImportError(
                f"{path} looks like a Lance dataset but the 'lance' "
                "package is not installed in this environment; install "
                "pylance or convert the table to parquet"
            ) from e
        return rd.read_lance(path, columns=columns, **kwargs)
    return read_parquet_sized(path, columns=columns, **kwargs)
