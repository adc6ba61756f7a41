"""Dataset-level operators: the rstar query surface re-expressed Ray-Data-first.

Every operator is a composition of ``map_batches`` (vectorized Arrow /
numpy kernels), ``groupby(cell_id)`` (the one shuffle key, SURVEY.md
§7.3) and ``sort/limit``. Per-record Python loops appear nowhere in a
hot path; stateful per-partition R-trees (geograft.ptree) are built
inside ``map_groups`` workers.

Operator → reference parity notes live on each function (citations are
rstar file:line, studied for behaviour only).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import grid as G
from . import kernels as K
from .ptree import PTree

if TYPE_CHECKING:
    import ray.data


ENV_COLS = ["minx", "miny", "maxx", "maxy"]

# Coarse shuffle width: cell keys are folded into this many partitions so
# the exchange produces O(N_SHUFFLE) tasks each processing MANY cells
# vectorized — never one Python call per cell. Sized ~2x a node's cores;
# on a cluster it scales with cluster size, not key cardinality.
N_SHUFFLE = 64


def coarse_bucket_ids(keys: np.ndarray, n_buckets: int = N_SHUFFLE) -> np.ndarray:
    """Fibonacci-hash fold of int keys into n_buckets partitions. The
    >>33 mix matters: without it, power-of-two bucket counts reduce to
    `key % n`, and strided key spaces collapse into one bucket."""
    k = keys.astype(np.uint64)
    return (((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
            % np.uint64(n_buckets)).astype(np.int64)


# Direct (sort-free) exchange gate. Ray Data's groupby().map_groups is
# a SORT: sample + sort-map + sort-reduce waves whose fixed latency
# (~1 s on this box) dwarfs the actual work on small inputs — measured:
# spatial_join @ sf0.1 spends 1.3 s in the Sort operator for ~7 ms of
# remote compute. Below the gate, buckets are exchanged with two raw-Ray
# task waves (per-block split -> per-bucket gather), the classic
# map-side-split shuffle. Above it, the streaming sort path amortizes
# its barrier and keeps driver-side ref bookkeeping O(1) — at 100 TB the
# split matrix (blocks x buckets refs on the driver) would not fit, so
# big exchanges MUST stay on the sort path.
DIRECT_EXCHANGE_MAX_BYTES = 4 << 30
# below this input estimate the two-wave direct exchange's barriers
# (to_arrow_refs drain + split/gather task fan) cost more than the
# sort shuffle they replace — measured at sf0.1 (2 MB docs, 32 cpus):
# neardup_minhash 1.3 s sorted vs 2.3 s direct; at 80 MB (suite corpus)
# direct wins 26 s -> 8 s. Tiny exchanges stay on the streaming path.
DIRECT_EXCHANGE_MIN_BYTES = 16 << 20
_DIRECT_MAX_BLOCKS = 512
_SPLIT_RT = None
_GATHER_RT = None


def arrow_refs(ds):
    """Block refs of a Dataset with exactly ONE execution. Ray 2.49's
    ``Dataset.to_arrow_refs()`` on a LAZY dataset runs the pipeline and
    then RE-EXECUTES the whole upstream chain under ``limit(1)`` for an
    uncached schema probe — measured ~2 s of pure re-read per exchange
    on an 18 M-row parse chain (and worse at low parallelism, where it
    eats straight into scaling efficiency). Materializing first answers
    the probe from block metadata, so every gather/exchange entry point
    routes through here instead of calling ``to_arrow_refs`` directly."""
    from ray.data.dataset import MaterializedDataset

    if not isinstance(ds, MaterializedDataset):
        ds = ds.materialize()
    return ds.to_arrow_refs()


def _split_by_bucket(tbl: pa.Table, nb: int, key_col: str):
    """Ray task: one input block -> nb per-bucket slices (schema kept,
    __cg appended) + an int64 count-per-bucket array as the LAST return
    (the driver reads only the counts — tiny — to skip gather tasks for
    buckets that are empty across every input block, so group fns see
    0-row tables only for a fully-empty input, matching the sort-based
    exchange's behaviour). One argsort + one take; slices are
    zero-copy."""
    if len(tbl) == 0 or key_col not in tbl.column_names:
        e = tbl.append_column("__cg", pa.array([], type=pa.int64())) \
            if "__cg" not in tbl.column_names else tbl
        return (*(e.slice(0, 0) for _ in range(nb)),
                np.zeros(nb, dtype=np.int64))
    cb = coarse_bucket_ids(tbl.column(key_col).to_numpy(), nb)
    t = tbl.append_column("__cg", pa.array(cb))
    order = np.argsort(cb, kind="stable")
    cs = cb[order]
    idx = np.searchsorted(cs, np.arange(nb + 1))
    taken = t.take(pa.array(order))
    return (*(taken.slice(int(idx[j]), int(idx[j + 1] - idx[j]))
              for j in range(nb)),
            np.diff(idx).astype(np.int64))


def _gather_bucket(fn, *parts):
    """Ray task: concat one bucket's splits, run the group fn."""
    tabs = [p for p in parts if p.num_rows > 0]
    t = pa.concat_tables(tabs) if tabs else parts[0]
    out = fn(t)
    if isinstance(out, pd.DataFrame):
        out = pa.Table.from_pandas(out, preserve_index=False)
    return out


def coarse_group_by_cell(ds, fn, key_col: str = "cell_id",
                         n_buckets: int | None = None,
                         exchange: str = "auto"):
    """ONE all-to-all exchange on ``hash(key) % n_buckets``; ``fn`` is
    called once per bucket with every row of every key in that bucket
    co-located (same guarantee a per-key groupby gives, at partition
    granularity). fn must sub-group by ``key_col`` internally.
    ``n_buckets`` defaults to the data-size-driven count
    (scale.shuffle_buckets) so one bucket's rows always fit a task.

    ``exchange``: 'auto' picks 'direct' (two-wave sort-free raw-Ray
    split+gather; latency-optimized) when the input's estimated bytes
    fit DIRECT_EXCHANGE_MAX_BYTES, else 'sort' (Ray Data sort-based
    groupby; streaming, driver-state-free — the only valid choice at
    cluster scale)."""
    import ray

    if n_buckets is None:
        from .scale import shuffle_buckets

        n_buckets = shuffle_buckets(ds)

    if exchange == "auto":
        from .scale import input_bytes_estimate

        est = input_bytes_estimate(ds)
        exchange = ("direct" if est is not None
                    and DIRECT_EXCHANGE_MIN_BYTES <= est
                    <= DIRECT_EXCHANGE_MAX_BYTES else "sort")

    if exchange == "direct" and n_buckets > 1:
        import ray.data as rd

        refs = arrow_refs(ds)
        if refs and len(refs) <= _DIRECT_MAX_BLOCKS:
            global _SPLIT_RT, _GATHER_RT
            if _SPLIT_RT is None:
                _SPLIT_RT = ray.remote(_split_by_bucket)
                _GATHER_RT = ray.remote(_gather_bucket)
            split = _SPLIT_RT.options(num_returns=n_buckets + 1)
            cols = [split.remote(r, n_buckets, key_col) for r in refs]
            # last return of each split is the per-bucket row count —
            # tiny; fetching them lets us skip buckets empty across
            # every block (group fns never see 0-row tables)
            counts = np.sum(ray.get([c[n_buckets] for c in cols]), axis=0)
            # fn may close over sizeable state (a resume manifest, a
            # broadcast lookup): serialize it ONCE, not per bucket task
            fn_ref = ray.put(fn)
            outs = [_GATHER_RT.remote(fn_ref, *[c[j] for c in cols])
                    for j in range(n_buckets) if counts[j] > 0]
            if not outs:  # fully-empty input: one call preserves schema
                outs = [_GATHER_RT.remote(fn_ref, *[c[0] for c in cols])]
            return rd.from_arrow_refs(outs)
        if refs:
            ds = rd.from_arrow_refs(refs)  # blocks already materialized

    def add(b: pa.Table) -> pa.Table:
        cb = coarse_bucket_ids(b.column(key_col).to_numpy(), n_buckets)
        return b.append_column("__cg", pa.array(cb))

    keyed = ds.map_batches(add, batch_format="pyarrow", batch_size=None)
    return keyed.groupby("__cg").map_groups(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
# span explode + geometry extraction (the per-record parser stage, §2.8)
# --------------------------------------------------------------------------

def explode_spans(batch: pa.Table) -> pa.Table:
    """docs(doc_id, spans) -> one row per span, preserving order.

    Zero-copy via Arrow list offsets: the struct child arrays are
    flattened, never round-tripped through Python objects. ``span_idx``
    is the position inside the list — the order half of the
    span-sequence invariant.
    """
    col = batch.column("spans").combine_chunks()
    flat = col.flatten()  # honours slice offsets
    lengths = pc.list_value_length(col).to_numpy().astype(np.int64)
    n = len(lengths)
    parent = np.repeat(np.arange(n, dtype=np.int64), lengths)
    starts = np.cumsum(lengths) - lengths
    span_idx = np.arange(int(lengths.sum()), dtype=np.int64) - np.repeat(starts, lengths)
    return pa.table(
        {
            "doc_id": batch.column("doc_id").take(pa.array(parent)),
            "span_idx": pa.array(span_idx.astype(np.int32)),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
        }
    )


_SHAPE_TO_KIND = {"POINT": "point", "RECT": "rect", "LINE": "line"}


def parse_geo_spans(batch: pa.Table) -> pa.Table:
    """Exploded span rows -> geometry rows for kind='geo' spans.

    Parses ``POINT(x y)`` / ``RECT(minx miny maxx maxy)`` /
    ``LINE(x1 y1 x2 y2)`` with Arrow string kernels (split_pattern +
    cast); float repr round-trips exactly, so coordinates equal the
    values the synthesizer embedded bit-for-bit.

    Output: doc_id, span_idx, geom_kind, x0, y0, x1, y1 (raw geometry:
    the point, the rect corners, or the line endpoints) plus the
    envelope columns minx/miny/maxx/maxy (AABB::from_corners /
    Line envelope semantics, aabb.rs:60-65, line.rs:27-45).
    """
    geo = batch.filter(pc.equal(batch["kind"], "geo"))
    if len(geo) == 0:
        return _empty_geom_table()
    txt = geo.column("text").combine_chunks()
    parts = pc.split_pattern(txt, "(")
    shape = pc.list_element(parts, 0)
    args = pc.utf8_rtrim(pc.list_element(parts, 1), ")")
    nums = pc.split_pattern(args, " ")
    if isinstance(nums, pa.ChunkedArray):
        nums = nums.combine_chunks()
    lens = pc.list_value_length(nums).to_numpy()
    # a span whose shape word is unknown or whose arg count doesn't
    # match its arity would leave coordinates uninitialized (or crash
    # the kind lookup) — drop it, like parse_poly_spans does
    is_point = pc.equal(shape, "POINT").to_numpy(zero_copy_only=False)
    is_rect = pc.equal(shape, "RECT").to_numpy(zero_copy_only=False)
    is_line = pc.equal(shape, "LINE").to_numpy(zero_copy_only=False)
    ok = (is_point & (lens == 2)) | ((is_rect | is_line) & (lens == 4))
    if not ok.all():
        keep = pa.array(ok)
        geo = geo.filter(keep)
        if len(geo) == 0:
            return _empty_geom_table()
        nums = nums.filter(keep)
        lens = lens[ok]
        is_point, is_rect = is_point[ok], is_rect[ok]
    vals = pc.cast(pc.list_flatten(nums), pa.float64()).to_numpy()

    n = len(geo)
    x0 = np.empty(n)
    y0 = np.empty(n)
    x1 = np.empty(n)
    y1 = np.empty(n)
    starts = np.cumsum(lens) - lens
    is2 = lens == 2
    # POINT: degenerate box (AABB::from_point, aabb.rs:36-41)
    x0[is2] = vals[starts[is2]]
    y0[is2] = vals[starts[is2] + 1]
    x1[is2] = x0[is2]
    y1[is2] = y0[is2]
    is4 = lens == 4
    x0[is4] = vals[starts[is4]]
    y0[is4] = vals[starts[is4] + 1]
    x1[is4] = vals[starts[is4] + 2]
    y1[is4] = vals[starts[is4] + 3]

    gk = np.where(is_point, "point", np.where(is_rect, "rect", "line"))
    minx = np.minimum(x0, x1)
    maxx = np.maximum(x0, x1)
    miny = np.minimum(y0, y1)
    maxy = np.maximum(y0, y1)
    # RECT corners are already (min, max) by construction; LINE needs the
    # min/max fold; POINT is degenerate — the unconditional fold is exact
    # for all three.
    return pa.table(
        {
            "doc_id": geo.column("doc_id"),
            "span_idx": geo.column("span_idx"),
            "geom_kind": pa.array(gk),
            "x0": x0, "y0": y0, "x1": x1, "y1": y1,
            "minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy,
        }
    )


def _empty_geom_table() -> pa.Table:
    f = pa.array([], type=pa.float64())
    return pa.table(
        {
            "doc_id": pa.array([], type=pa.string()),
            "span_idx": pa.array([], type=pa.int32()),
            "geom_kind": pa.array([], type=pa.string()),
            "x0": f, "y0": f, "x1": f, "y1": f,
            "minx": f, "miny": f, "maxx": f, "maxy": f,
        }
    )


def extract_geometries(docs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """docs -> geometry rows: explode + parse in one fused stateless stage."""
    return docs_ds.map_batches(
        lambda b: parse_geo_spans(explode_spans(b)), batch_format="pyarrow", batch_size=None
    )


def parse_poly_spans(batch: pa.Table) -> pa.Table:
    """Exploded span rows -> polygon rows for ``POLY(x1 y1 x2 y2 ...)``
    spans: variable-length vertex rings kept as a list<float64> column
    (zero-copy Arrow offsets), plus the ring's envelope columns."""
    geo = batch.filter(pc.match_substring_regex(batch["text"], r"^POLY\("))
    empty = pa.table({
        "doc_id": pa.array([], type=pa.string()),
        "span_idx": pa.array([], type=pa.int32()),
        "coords": pa.array([], type=pa.list_(pa.float64())),
        "minx": pa.array([], type=pa.float64()),
        "miny": pa.array([], type=pa.float64()),
        "maxx": pa.array([], type=pa.float64()),
        "maxy": pa.array([], type=pa.float64()),
    })
    if len(geo) == 0:
        return empty
    txt = geo.column("text").combine_chunks()
    args = pc.utf8_rtrim(pc.list_element(pc.split_pattern(txt, "("), 1), ")")
    nums = pc.split_pattern(args, " ")
    lens = pc.list_value_length(nums).to_numpy().astype(np.int64)
    # a malformed span (odd coordinate count or <3 vertices) would shift
    # the global x/y striding and corrupt every LATER polygon — drop it
    ok = (lens % 2 == 0) & (lens >= 6)
    if not ok.all():
        geo = geo.filter(pa.array(ok))
        if len(geo) == 0:
            return empty
        nums = nums.filter(pa.array(ok)) if not isinstance(nums, pa.ChunkedArray) \
            else nums.combine_chunks().filter(pa.array(ok))
        lens = lens[ok]
    vals = pc.cast(pc.list_flatten(nums), pa.float64()).to_numpy()
    offsets = np.concatenate([[0], np.cumsum(lens)])
    xs = vals[0::2]
    ys = vals[1::2]
    voff = offsets // 2
    minx = np.minimum.reduceat(xs, voff[:-1])
    maxx = np.maximum.reduceat(xs, voff[:-1])
    miny = np.minimum.reduceat(ys, voff[:-1])
    maxy = np.maximum.reduceat(ys, voff[:-1])
    coords = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(vals))
    return pa.table(
        {
            "doc_id": geo.column("doc_id"),
            "span_idx": geo.column("span_idx"),
            "coords": coords,
            "minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy,
        }
    )


def locate_polys_at_point(ds, x: float, y: float):
    """Point-in-polygon over a polygon Dataset (coords + envelope cols):
    envelope prefilter then the exact vectorized ray-cast kernel."""
    q = np.array([x, y])

    def f(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        lo, up = _env_arrays(batch)
        env_ok = K.env_contains_point(lo, up, q)
        batch = batch.filter(pa.array(env_ok))
        if len(batch) == 0:
            return batch
        coords = batch.column("coords").combine_chunks()
        flat = coords.flatten().to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(coords).to_numpy().astype(np.int64) // 2
        offsets = np.concatenate([[0], np.cumsum(lens)])
        flat_xy = flat.reshape(-1, 2)
        keep = K.poly_contains_point(flat_xy, offsets, q)
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# cell assignment (level-1 partitioning)
# --------------------------------------------------------------------------

def assign_owner_cells(batch: pa.Table, level: int, bounds: G.Bounds) -> pa.Table:
    """Adds the owner cell id (cell of the envelope min corner,
    SURVEY.md §7.4) — the partitioning key for build/groupby stages."""
    cid = G.owner_cell(
        batch.column("minx").to_numpy(), batch.column("miny").to_numpy(), level, bounds
    )
    return batch.append_column("cell_id", pa.array(cid))


def replicate_to_cells(batch: pa.Table, level: int, bounds: G.Bounds) -> pa.Table:
    """Multi-cell replication (§7.4): one output row per (geometry, cell
    its envelope touches). Owner-cell dedup downstream restores
    exactly-once semantics."""
    rows, cells = G.covering_cells_of_envelopes(
        batch.column("minx").to_numpy(),
        batch.column("miny").to_numpy(),
        batch.column("maxx").to_numpy(),
        batch.column("maxy").to_numpy(),
        level,
        bounds,
    )
    out = batch.take(pa.array(rows))
    return out.append_column("cell_id", pa.array(cells))


# --------------------------------------------------------------------------
# locate_* family — pure predicates, no shuffle (rtree.rs:351-1060)
# --------------------------------------------------------------------------

def _env_arrays(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    lo = np.c_[batch.column("minx").to_numpy(), batch.column("miny").to_numpy()]
    up = np.c_[batch.column("maxx").to_numpy(), batch.column("maxy").to_numpy()]
    return lo, up


def locate_in_envelope(ds, qminx, qminy, qmaxx, qmaxy) -> "ray.data.Dataset":
    """rtree.rs:351-390 — envelopes FULLY CONTAINED in the query box."""
    qlo = np.array([qminx, qminy])
    qhi = np.array([qmaxx, qmaxy])

    def f(batch: pa.Table) -> pa.Table:
        lo, up = _env_arrays(batch)
        return batch.filter(pa.array(K.env_contains_env(qlo[None], qhi[None], lo, up)))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def locate_in_envelope_intersecting(ds, qminx, qminy, qmaxx, qmaxy) -> "ray.data.Dataset":
    """rtree.rs:447-498 — envelopes INTERSECTING the box (touch counts)."""
    qlo = np.array([qminx, qminy])
    qhi = np.array([qmaxx, qmaxy])

    def f(batch: pa.Table) -> pa.Table:
        lo, up = _env_arrays(batch)
        return batch.filter(pa.array(K.env_intersects(lo, up, qlo, qhi)))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def locate_all_at_point(ds, x, y) -> "ray.data.Dataset":
    """rtree.rs:753-843 — elements whose geometry CONTAINS the point.

    Exact containment per geom kind: point => equality
    (object.rs:221-223); rect => box containment (rectangle.rs:95-97);
    line => distance_2 == 0 (object.rs:154-200 default contains_point).
    For pure-envelope rows (no geom_kind column) the envelope test is
    the containment test.
    """
    q = np.array([x, y])
    reg = _geom_registry()

    def f(batch: pa.Table) -> pa.Table:
        lo, up = _env_arrays(batch)
        keep = K.env_contains_point(lo, up, q)
        if "geom_kind" in batch.column_names and len(batch) > 0:
            gk = np.asarray(batch.column("geom_kind").to_pylist())
            p0 = np.c_[batch.column("x0").to_numpy(), batch.column("y0").to_numpy()]
            p1 = np.c_[batch.column("x1").to_numpy(), batch.column("y1").to_numpy()]
            is_line = gk == "line"
            if is_line.any():
                d2 = K.line_distance_2(p0[is_line], p1[is_line], q)
                line_keep = d2 <= 0.0
                keep[is_line] &= line_keep
            # registered custom kinds: exact contains_point, defaulting
            # to distance_2 <= 0 (the trait default, object.rs:154-200)
            for kind, spec in reg.items():
                m = gk == kind
                if m.any():
                    if spec.contains_point is not None:
                        keep[m] &= spec.contains_point(batch, m, q)
                    else:
                        keep[m] &= spec.distance_2(batch, m, q) <= 0.0
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def locate_at_point(ds, x, y, id_col: str = "id"):
    """locate_at_point (rtree.rs:753-801): ONE element containing the
    point — the reference returns whichever match the pruned descent
    finds first; distributed set-parity needs a deterministic rule, so
    the engine picks the smallest id among matches (the same rule
    remove_at_point uses). Returns a pandas DataFrame with 0 or 1 rows.

    ONE pass over the input, no shuffle: the filtered match set (tiny
    by nature — rows containing a single point) is collected once and
    the min-id row selected driver-side. A second map_batches over the
    un-materialized `matches` dataset would RE-EXECUTE the full scan."""
    import ray

    matches = locate_all_at_point(ds, x, y)
    blocks = [t for t in ray.get(arrow_refs(matches)) if t.num_rows > 0]
    if not blocks:
        return pd.DataFrame({id_col: pd.Series([], dtype=np.int64)})
    tbl = pa.concat_tables(blocks)
    ids = tbl.column(id_col).to_numpy()
    first = ids.min()
    return tbl.filter(pa.array(ids == first)).to_pandas()


def locate_within_distance(ds, x, y, r2) -> "ray.data.Dataset":
    """rtree.rs:1053-1060 — distance_2(geometry, q) <= r2, with the per-kind
    exact distance (point: euclidean^2; rect: clamped envelope distance,
    rectangle.rs:82-94; line: segment distance, line.rs:97-113)."""
    q = np.array([x, y])
    reg = _geom_registry()

    def f(batch: pa.Table) -> pa.Table:
        d2 = _exact_distance_2(batch, q, reg)
        return batch.filter(pa.array(d2 <= r2))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def _geom_registry():
    """Driver-side snapshot of the custom-geometry registry — captured
    into per-batch closures so the specs travel to Ray workers (whose
    own geograft.geom module starts with an empty REGISTRY)."""
    from .geom import registry_snapshot

    return registry_snapshot()


def _exact_distance_2(batch: pa.Table, q: np.ndarray, reg=None) -> np.ndarray:
    lo, up = _env_arrays(batch)
    d2 = K.env_distance_2(lo, up, q)
    if "geom_kind" in batch.column_names and len(batch) > 0:
        gk = np.asarray(batch.column("geom_kind").to_pylist())
        is_line = gk == "line"
        if is_line.any():
            p0 = np.c_[batch.column("x0").to_numpy(), batch.column("y0").to_numpy()]
            p1 = np.c_[batch.column("x1").to_numpy(), batch.column("y1").to_numpy()]
            d2[is_line] = K.line_distance_2(p0[is_line], p1[is_line], q)
        # registered custom kinds (PointDistance impls, object.rs:83-200);
        # reg is the construction-time snapshot shipped in the closure
        if reg:
            for kind, spec in reg.items():
                m = gk == kind
                if m.any():
                    d2[m] = spec.distance_2(batch, m, q)
    return d2


def locate_in_box_nd(ds, axes: list[str], lo: list[float], hi: list[float]):
    """N-dimensional envelope containment over arbitrary coordinate
    columns — the Dataset-layer counterpart of the reference's
    dimension-generic Point/AABB (rstar supports any D >= 2,
    point.rs:295-323); kernels and PTree are already n-dim, this exposes
    the same generality to Dataset pipelines.

    Dtype-preserving: integer coordinate columns compared against
    integer bounds stay int64 end to end (RTreeNum integer scalars,
    point.rs:98-100) — exact beyond 2^53, where a float64 round-trip
    would corrupt the comparison."""
    lo = np.asarray(lo)
    hi = np.asarray(hi)

    def f(batch: pa.Table) -> pa.Table:
        keep = np.ones(len(batch), dtype=bool)
        for i, col in enumerate(axes):
            v = batch.column(col).to_numpy()
            keep &= (v >= lo[i]) & (v <= hi[i])
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def locate_with_selection_function(ds, keep_rows) -> "ray.data.Dataset":
    """The UDF hook (rtree.rs:507-520, SelectionFunction trait):
    ``keep_rows(batch) -> bool mask`` plays should_unpack_leaf; partition
    pruning (should_unpack_parent) happens at the planner via the cell
    directory when an index is attached."""
    return ds.map_batches(
        lambda b: b.filter(pa.array(keep_rows(b))), batch_format="pyarrow", batch_size=None
    )


def drain_in_envelope(ds, qminx, qminy, qmaxx, qmaxy, intersecting: bool = False):
    """drain_* family (rtree.rs:399-410, removal.rs:67-243): split the
    dataset into (drained, surviving). Both sides are lazy Datasets over
    the same input — a split, not a mutation, which is exactly the
    element-set contract the reference's drain tests assert."""
    qlo = np.array([qminx, qminy])
    qhi = np.array([qmaxx, qmaxy])

    def mask(batch: pa.Table) -> np.ndarray:
        lo, up = _env_arrays(batch)
        if intersecting:
            return K.env_intersects(lo, up, qlo, qhi)
        return K.env_contains_env(qlo[None], qhi[None], lo, up)

    drained = ds.map_batches(lambda b: b.filter(pa.array(mask(b))), batch_format="pyarrow", batch_size=None)
    surviving = ds.map_batches(lambda b: b.filter(pa.array(~mask(b))), batch_format="pyarrow", batch_size=None)
    return drained, surviving


def drain_within_distance(ds, x, y, r2):
    """drain_within_distance (rtree.rs:1066-1073): split into
    (drained = distance_2 <= r2, surviving = rest), one pass each."""
    q = np.array([x, y])
    reg = _geom_registry()

    def mk(neg: bool):
        def f(batch: pa.Table) -> pa.Table:
            m = _exact_distance_2(batch, q, reg) <= r2
            return batch.filter(pa.array(~m if neg else m))

        return f

    return (
        ds.map_batches(mk(False), batch_format="pyarrow", batch_size=None),
        ds.map_batches(mk(True), batch_format="pyarrow", batch_size=None),
    )


def drain_limit(ds, keep_rows, n: int, id_col: str = "id"):
    """Partial drain — the reference's 'drop the iterator after n items'
    semantics (removal.rs:113-160: only yielded removals happen).

    Deterministic pick: the n MATCHING rows with smallest ids are
    drained; everything else survives. Two passes: a tiny global top-n
    of matching ids (per-block partial + driver merge), then a
    broadcast anti-filter.
    """
    import ray

    def partial_ids(batch: pa.Table) -> pa.Table:
        m = keep_rows(batch)
        ids = batch.column(id_col).to_numpy()[m]
        if len(ids) > n:
            ids = np.partition(ids, n - 1)[:n]
        return pa.table({id_col: np.sort(ids)})

    cand = ds.map_batches(partial_ids, batch_format="pyarrow", batch_size=None)
    blocks = [t for t in ray.get(arrow_refs(cand)) if t.num_rows > 0]
    if blocks:
        all_ids = np.concatenate([t.column(id_col).to_numpy() for t in blocks])
        victims = np.sort(all_ids)[:n]
    else:
        victims = np.empty(0, dtype=np.int64)
    vref = ray.put(victims)

    def mk(drained_side: bool):
        def f(batch: pa.Table) -> pa.Table:
            v = ray.get(vref)
            m = np.isin(batch.column(id_col).to_numpy(), v)
            return batch.filter(pa.array(m if drained_side else ~m))

        return f

    return (
        ds.map_batches(mk(True), batch_format="pyarrow", batch_size=None),
        ds.map_batches(mk(False), batch_format="pyarrow", batch_size=None),
    )


def remove_at_point(ds, x, y, id_col: str = "id"):
    """remove_at_point (rtree.rs:864-867): remove ONE element containing
    the point — deterministic pick: smallest id among matches (the
    reference picks an arbitrary one; set-level parity needs a rule).
    Returns (removed_df, surviving_ds)."""
    matches = locate_all_at_point(ds, x, y).to_pandas()
    if len(matches) == 0:
        return matches, ds
    victim = int(matches[id_col].min())

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(batch.column(id_col).to_numpy() != victim))

    return (
        matches[matches[id_col] == victim],
        ds.map_batches(f, batch_format="pyarrow", batch_size=None),
    )


def remove_with_selection_function(ds, sel_rows, id_col: str = "id"):
    """remove_with_selection_function (rtree.rs:701-706): remove ONE
    element matched by the selection function. The reference removes an
    arbitrary match; the engine's deterministic pick is the smallest
    matching id (same rule as remove_at_point). Returns
    (removed_df, surviving_ds).

    Two passes, no shuffle: a per-block partial min of matching ids
    (one tiny row per block merged on the driver), then a broadcast
    anti-filter.
    """
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        m = sel_rows(batch)
        ids = batch.column(id_col).to_numpy()[m]
        return pa.table({id_col: ids.min(keepdims=True) if len(ids) else ids[:0]})

    cand = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    blocks = [t for t in ray.get(arrow_refs(cand)) if t.num_rows > 0]
    if not blocks:
        return pd.DataFrame(), ds
    victim = min(int(t.column(id_col)[0].as_py()) for t in blocks)

    def f(keep_victim: bool):
        def g(batch: pa.Table) -> pa.Table:
            m = batch.column(id_col).to_numpy() == victim
            return batch.filter(pa.array(m if keep_victim else ~m))

        return g

    removed = ds.map_batches(f(True), batch_format="pyarrow", batch_size=None).to_pandas()
    return removed, ds.map_batches(f(False), batch_format="pyarrow", batch_size=None)


def remove_equal(ds, x, y, id_col: str = "id"):
    """RTree::remove (rtree.rs:914-917): remove ONE element EQUAL to the
    query element (SelectEqualsFunction, selection_functions.rs:141-169).
    For point rows (degenerate envelopes) equality is coordinate
    equality; duplicates leave the other copies in place."""

    def eq(batch: pa.Table) -> np.ndarray:
        return (
            (batch.column("minx").to_numpy() == x)
            & (batch.column("miny").to_numpy() == y)
            & (batch.column("maxx").to_numpy() == x)
            & (batch.column("maxy").to_numpy() == y)
        )

    return remove_with_selection_function(ds, eq, id_col)


def drain_with_selection_function(ds, sel_rows):
    """drain_with_selection_function (rtree.rs:720-739): split into
    (drained = ALL elements the selection function matches, surviving =
    the rest) — the same lazy two-sided split contract as the other
    drain ops (a split, not a mutation)."""
    drained = ds.map_batches(
        lambda b: b.filter(pa.array(sel_rows(b))), batch_format="pyarrow", batch_size=None
    )
    surviving = ds.map_batches(
        lambda b: b.filter(pa.array(~sel_rows(b))), batch_format="pyarrow", batch_size=None
    )
    return drained, surviving


def nn_stream(ds, x, y, id_col: str = "id"):
    """nearest_neighbor_iter full stream (rtree.rs:1094-1122): EVERY
    element annotated with distance_2 and globally sorted by
    (dist2, id). A distributed sort — use only when the full ranking is
    wanted; k-bounded consumers should use knn()."""
    q = np.array([x, y])
    reg = _geom_registry()

    def f(batch: pa.Table) -> pa.Table:
        return batch.append_column("dist2", pa.array(_exact_distance_2(batch, q, reg)))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None).sort(
        ["dist2", id_col]
    )


def locate_in_envelope_multi(ds, boxes: "pa.Table", intersecting: bool = True):
    """Batched envelope queries: one pass over the data answers ALL query
    boxes (box_id, minx, miny, maxx, maxy), emitting (box_id, id) hits.
    The box table is broadcast once via ray.put; the per-batch kernel is
    a vectorized (rows x boxes) interval test in 4 comparisons."""
    import ray

    bref = ray.put(
        {
            "box_id": boxes.column("box_id").to_numpy(),
            "lo": np.c_[boxes.column("minx").to_numpy(), boxes.column("miny").to_numpy()],
            "up": np.c_[boxes.column("maxx").to_numpy(), boxes.column("maxy").to_numpy()],
        }
    )

    def f(batch: pa.Table, bref=bref) -> pa.Table:
        q = ray.get(bref)
        lo, up = _env_arrays(batch)
        ids = batch.column("id").to_numpy()
        # per-block packed R-tree, built once, amortized over all boxes —
        # pruned traversal beats the dense (rows x boxes) matrix on both
        # work and memory bandwidth
        tree = PTree(lo, up)
        # one vectorized level-wise sweep answers ALL boxes (the same
        # batched kernel the index actors use) — a python loop over
        # boxes re-entered the traversal per query
        rq, ridx = tree.locate_batch(
            q["lo"], q["up"],
            "intersects" if intersecting else "contained")
        if len(rq) == 0:
            return pa.table({"box_id": pa.array([], type=pa.int64()),
                             "id": pa.array([], type=pa.int64())})
        return pa.table({"box_id": q["box_id"][rq], "id": ids[ridx]})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# kNN — broadcast query matrix, per-batch vectorized top-k, small merge
# --------------------------------------------------------------------------

# queries chunk size inside the kNN kernel: bounds the (rows x chunk)
# distance-matrix allocation to ~tens of MB per task regardless of Q.
_KNN_Q_CHUNK = 256


def _topk_rows_per_col(d2: np.ndarray, k: int) -> np.ndarray:
    """Exact (value, row-position) top-k row indices per COLUMN of a
    (n, q) matrix. Callers pre-sort rows ascending by id, so stable tie
    resolution by row position == tie-break by id — the engine's
    deterministic kNN contract. Fast path: argpartition; only columns
    with ties crossing the k-th slot pay a stable argsort."""
    n = d2.shape[0]
    kk = min(k, n)
    part = np.argpartition(d2, kk - 1, axis=0)[:kk]
    kth = np.take_along_axis(d2, part, axis=0).max(axis=0)
    cnt = (d2 <= kth[None, :]).sum(axis=0)
    for c in np.nonzero(cnt > kk)[0]:
        part[:, c] = np.argsort(d2[:, c], kind="stable")[:kk]
    # within-column order does not matter (the reduce re-sorts), only
    # membership does
    return part


def _topk_cols_per_row(d2: np.ndarray, k: int) -> np.ndarray:
    """Row-major twin of _topk_rows_per_col: top-k column indices per ROW
    of a (q, n) matrix; columns pre-sorted ascending by id."""
    n = d2.shape[1]
    kk = min(k, n)
    part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
    kth = np.take_along_axis(d2, part, axis=1).max(axis=1)
    cnt = (d2 <= kth[:, None]).sum(axis=1)
    for r in np.nonzero(cnt > kk)[0]:
        part[r, :] = np.argsort(d2[r, :], kind="stable")[:kk]
    return part


def _knn_partial(batch: pa.Table, qref, k: int, id_col: str) -> pa.Table:
    """Per-block combiner: local top-k per query, vectorized across a
    chunk of queries at a time. Emits <= Q*k candidate rows per block."""
    import ray

    n = len(batch)
    if n == 0:
        return pa.table({
            "qid": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            "dist2": pa.array([], type=pa.float64()),
        })
    q = ray.get(qref)  # zero-copy plasma read; shared across tasks
    qid_all, qxy = q["qid"], q["xy"]
    ids = batch.column(id_col).to_numpy()
    lo, up = _env_arrays(batch)
    # pre-sort rows by id: stable tie resolution == deterministic (d2, id)
    rid = np.argsort(ids, kind="stable")
    ids, lo, up = ids[rid], lo[rid], up[rid]
    k = min(k, n)
    out_q, out_i, out_d = [], [], []
    for s in range(0, len(qid_all), _KNN_Q_CHUNK):
        qx = qxy[s : s + _KNN_Q_CHUNK, 0]
        qy = qxy[s : s + _KNN_Q_CHUNK, 1]
        # (n, chunk) clamped squared distance — same op order as env_distance_2
        dx = np.clip(qx[None, :], lo[:, 0:1], up[:, 0:1]) - qx[None, :]
        dy = np.clip(qy[None, :], lo[:, 1:2], up[:, 1:2]) - qy[None, :]
        d2 = dx * dx + dy * dy
        part = _topk_rows_per_col(d2, k)  # (k, chunk)
        out_q.append(np.repeat(qid_all[s : s + _KNN_Q_CHUNK], k))
        out_i.append(ids[part].ravel(order="F"))
        out_d.append(np.take_along_axis(d2, part, axis=0).ravel(order="F"))
    return pa.table(
        {
            "qid": np.concatenate(out_q),
            id_col: np.concatenate(out_i),
            "dist2": np.concatenate(out_d),
        }
    )


def _topk_per_qid(qid: np.ndarray, ids: np.ndarray, d2: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k smallest (dist2, id) rows per qid — fully
    vectorized (lexsort + group-boundary rank)."""
    order = np.lexsort((ids, d2, qid))
    qs = qid[order]
    n = len(qs)
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    boundary[1:] = qs[1:] != qs[:-1]
    group_start = np.maximum.accumulate(np.where(boundary, np.arange(n), 0))
    rank = np.arange(n) - group_start
    return order[rank < k]


def _knn_reduce(batch: pa.Table, k: int, id_col: str) -> pa.Table:
    if len(batch) == 0 or "qid" not in batch.column_names:
        # repartition can hand over schemaless empty blocks — emit typed
        return pa.table({"qid": pa.array([], type=pa.int64()),
                         id_col: pa.array([], type=pa.int64()),
                         "dist2": pa.array([], type=pa.float64())})
    qid = batch.column("qid").to_numpy()
    ids = batch.column(id_col).to_numpy()
    d2 = batch.column("dist2").to_numpy()
    keep = _topk_per_qid(qid, ids, d2, k)
    return pa.table({"qid": qid[keep], id_col: ids[keep], "dist2": d2[keep]})


def knn(ds, queries: pa.Table, k: int, id_col: str = "id",
        reduce_blocks: int = 8):
    """First k of nearest_neighbor_iter (rtree.rs:1094-1122) for a batch
    of queries. Ties broken by (dist2, id) — deterministic where the
    reference leaves tie order unspecified.

    Shape: the query matrix is broadcast ONCE via ray.put and read
    zero-copy from the object store in every task (never re-shipped per
    batch); each data block emits its local top-k per query; a
    shuffle-free tree-reduce (repartition + combine) collapses the
    candidate stream before a small vectorized merge on the driver.
    """
    import ray

    qref = ray.put(
        {
            "qid": queries.column("qid").to_numpy(),
            "xy": np.c_[queries.column("x").to_numpy(), queries.column("y").to_numpy()],
        }
    )
    cand = ds.map_batches(
        _knn_partial,
        fn_args=(qref, k, id_col),
        batch_format="pyarrow",
        batch_size=None,
    )
    # shuffle-free combine: adjacent candidate blocks concatenated, then
    # top-k of the union of top-ks (associative, so this is exact)
    cand = cand.repartition(reduce_blocks).map_batches(
        _knn_reduce, fn_args=(k, id_col), batch_format="pyarrow", batch_size=None
    )
    blocks = [t for t in ray.get(arrow_refs(cand)) if t.num_rows > 0]
    if not blocks:
        return pd.DataFrame({"qid": [], id_col: [], "dist2": []})
    tbl = pa.concat_tables(blocks)
    qid = tbl.column("qid").to_numpy()
    ids = tbl.column(id_col).to_numpy()
    d2 = tbl.column("dist2").to_numpy()
    keep = _topk_per_qid(qid, ids, d2, k)
    order = np.lexsort((ids[keep], d2[keep], qid[keep]))
    keep = keep[order]
    return pd.DataFrame({"qid": qid[keep], id_col: ids[keep], "dist2": d2[keep]})


def nearest_neighbors_all_ties(ds, x: float, y: float, id_col: str = "id"):
    """nearest_neighbors plural (rtree.rs:1003-1043): ALL elements whose
    distance_2 equals the minimum — exact f64 equality, preserved because
    both the candidate pass and the final filter use the same kernel."""
    q = np.array([x, y])
    reg = _geom_registry()

    def local_min(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        d2 = _exact_distance_2(batch, q, reg)
        m = d2.min()
        keep = d2 == m
        return batch.filter(pa.array(keep)).append_column("dist2", pa.array(d2[keep]))

    cand = ds.map_batches(local_min, batch_format="pyarrow", batch_size=None)
    # small result: at most a handful of rows per input block survive
    pdf = cand.to_pandas()
    if len(pdf) == 0:
        return pdf
    m = pdf["dist2"].min()
    return pdf[pdf["dist2"] == m].sort_values(id_col).reset_index(drop=True)


def indexed_knn(ds, queries: pa.Table, k: int, level: int, bounds: G.Bounds,
                id_col: str = "id", directory=None, planner: str = "auto"):
    """Two-level exact kNN (SURVEY.md §3.3): the scalable path.

    1. PLAN (driver, vectorized over the SMALL cell directory): for each
       query, sort occupied cells by lower-bound distance (cell_min_dist2
       — the partition-granularity analogue of the envelope distance
       pruning in nearest_neighbor.rs:261-270), accumulate counts until
       >= k, take the accumulated cells' max-corner distance as a proven
       upper bound ub, and select every cell with min_dist2 <= ub.
    2. EXECUTE (one co-shuffle): points keyed by owner cell UNION queries
       replicated to their candidate cells -> groupby(cell) -> per-cell
       vectorized exact distances -> local top-k.
    3. REDUCE: top-k of the union of local top-ks (exact, associative).

    Work per query is proportional to the candidate cells' point count,
    not the table size — this is what replaces the O(n*Q) brute force at
    10^12-doc scale.

    ``planner``: 'auto' uses the matrix plan below
    state.ANALYTIC_MIN_PARTS occupied cells and analytic owner-cell +
    ring-expansion cover routes (ringplan.plan_cover) above — planning
    memory is then bounded by the visited rings, not the cell count;
    'matrix'/'rings' force a side.
    """
    import ray

    if directory is None:
        directory = cell_directory(ds, level, bounds)
    dirt = directory if isinstance(directory, pd.DataFrame) else directory.to_pandas()
    cells = dirt["cell_id"].to_numpy()
    counts = dirt["n"].to_numpy()
    clo = np.c_[dirt["minx"].to_numpy(), dirt["miny"].to_numpy()]
    cup = np.c_[dirt["maxx"].to_numpy(), dirt["maxy"].to_numpy()]

    qid = queries.column("qid").to_numpy()
    qx = queries.column("x").to_numpy()
    qy = queries.column("y").to_numpy()
    total = int(counts.sum())

    def plan_chunk(cqid, cqx1, cqy1):
        """Route one chunk of queries -> (qid, cell_id, x, y) replicas."""
        cqx = cqx1[:, None]
        cqy = cqy1[:, None]
        dx = np.clip(cqx, clo[None, :, 0], cup[None, :, 0]) - cqx
        dy = np.clip(cqy, clo[None, :, 1], cup[None, :, 1]) - cqy
        mind2 = dx * dx + dy * dy                      # (q, C) lower bound
        fx = np.maximum(np.abs(cqx - clo[None, :, 0]), np.abs(cqx - cup[None, :, 0]))
        fy = np.maximum(np.abs(cqy - clo[None, :, 1]), np.abs(cqy - cup[None, :, 1]))
        maxd2 = fx * fx + fy * fy                      # (q, C) upper bound
        order = np.argsort(mind2, axis=1, kind="stable")
        csum = np.cumsum(counts[order], axis=1)
        if total <= k:
            ub = np.full(len(csum), np.inf)
        else:
            first_ge = np.argmax(csum >= min(k, total), axis=1)
            rows = np.arange(len(csum))
            # ub = max over the accumulated prefix of cell max-corner dists
            prefix_max = np.maximum.accumulate(
                np.take_along_axis(maxd2, order, axis=1), axis=1
            )
            ub = prefix_max[rows, first_ge]
        qi, ci = np.nonzero(mind2 <= ub[:, None])
        return cqid[qi], cells[ci], cqx1[qi], cqy1[qi]

    from .state import ANALYTIC_MIN_PARTS

    use_rings = (planner == "rings" or
                 (planner == "auto" and len(cells) >= ANALYTIC_MIN_PARTS))
    dirx = None
    if use_rings:
        from . import ringplan as RP

        dirx = RP.GridDirectory(
            cells, counts, clo, cup,
            np.array([bounds.minx, bounds.miny]),
            np.array([bounds.maxx, bounds.maxy]), 2)

        def plan_chunk(cqid, cqx1, cqy1):  # noqa: F811
            qi, ci = RP.plan_cover(dirx, np.stack([cqx1, cqy1], axis=1), k)
            return cqid[qi], cells[ci], cqx1[qi], cqy1[qi]

    # planning is itself a parallel stage for very big query sets; below
    # that the extra Ray stage round-trip costs more than driver planning
    # (~0.1 ms/query) saves
    if len(qid) > 100_000:
        import ray.data as rd

        def plan_batch(b: pa.Table) -> pa.Table:
            pq_, pc_, px_, py_ = plan_chunk(
                b.column("qid").to_numpy(),
                b.column("x").to_numpy(),
                b.column("y").to_numpy(),
            )
            n = len(pq_)
            return pa.table(
                {
                    "cell_id": pc_,
                    "side": np.ones(n, dtype=np.int8),
                    "qid": pq_,
                    id_col: np.zeros(n, dtype=np.int64),
                    "x": px_,
                    "y": py_,
                }
            )

        qds = rd.from_arrow(queries).repartition(
            max(1, len(qid) // (4 * _KNN_Q_CHUNK))
        )
        routed = qds.map_batches(plan_batch, batch_format="pyarrow", batch_size=_KNN_Q_CHUNK)
        hot_cells = None
    else:
        # thread-parallel driver planning: the chunk kernels are pure
        # numpy (GIL released), so a thread pool uses all local cores
        from concurrent.futures import ThreadPoolExecutor

        chunks = [
            (qid[s : s + _KNN_Q_CHUNK], qx[s : s + _KNN_Q_CHUNK], qy[s : s + _KNN_Q_CHUNK])
            for s in range(0, len(qid), _KNN_Q_CHUNK)
        ]
        with ThreadPoolExecutor(max_workers=8) as pool:
            results = list(pool.map(lambda c: plan_chunk(*c), chunks))
        route_q = [r[0] for r in results]
        route_c = [r[1] for r in results]
        route_x = [r[2] for r in results]
        route_y = [r[3] for r in results]
        r_qid = np.concatenate(route_q)
        r_cell = np.concatenate(route_c)
        routed = pa.table(
            {
                "cell_id": r_cell,
                "side": np.ones(len(r_qid), dtype=np.int8),
                "qid": r_qid,
                id_col: np.zeros(len(r_qid), dtype=np.int64),
                "x": np.concatenate(route_x),
                "y": np.concatenate(route_y),
            }
        )
        # points in cells no query candidate touches never enter the shuffle
        hot_cells = np.unique(r_cell)

    def prep_points(batch: pa.Table) -> pa.Table:
        b = assign_owner_cells(batch, level, bounds)
        if hot_cells is not None:
            keep = np.isin(b.column("cell_id").to_numpy(), hot_cells)
            b = b.filter(pa.array(keep))
        n = len(b)
        return pa.table(
            {
                "cell_id": b.column("cell_id"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "qid": pa.array(np.zeros(n, dtype=np.int64)),
                id_col: b.column(id_col),
                "x": b.column("minx"),
                "y": b.column("miny"),
            }
        )

    import ray.data as rd

    pts = ds.map_batches(prep_points, batch_format="pyarrow", batch_size=None)
    routed_ds = routed if not isinstance(routed, pa.Table) else rd.from_arrow(routed)
    both = pts.union(routed_ds)

    def local_knn_bucket(group: pa.Table) -> pa.Table:
        """Answer every cell co-located in this coarse bucket."""
        empty = pa.table({
            "qid": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            "dist2": pa.array([], type=pa.float64()),
        })
        if len(group) == 0 or "cell_id" not in group.column_names:
            return empty
        cell = group.column("cell_id").to_numpy()
        side = group.column("side").to_numpy()
        xs = group.column("x").to_numpy()
        ys = group.column("y").to_numpy()
        ids_all = group.column(id_col).to_numpy()
        qid_all = group.column("qid").to_numpy()
        order = np.argsort(cell, kind="stable")
        cell_s = cell[order]
        bnd = np.concatenate([[0], np.nonzero(cell_s[1:] != cell_s[:-1])[0] + 1, [len(cell_s)]])
        out_q, out_i, out_d = [], [], []
        for gi in range(len(bnd) - 1):
            rows = order[bnd[gi] : bnd[gi + 1]]
            isq = side[rows] == 1
            if not isq.any() or isq.all():
                continue
            p = rows[~isq]
            qr = rows[isq]
            pids = ids_all[p]
            pord = np.argsort(pids, kind="stable")
            p = p[pord]
            pids = pids[pord]
            px, py = xs[p], ys[p]
            kk = min(k, len(p))
            # row-major (queries x points) chunks: each d2 block stays
            # ~L2-sized and argpartition runs along the contiguous axis —
            # keeps 32 concurrent workers from thrashing the shared cache
            for s in range(0, len(qr), 64):
                qs_ = qr[s : s + 64]
                dx = xs[qs_][:, None] - px[None, :]
                dy = ys[qs_][:, None] - py[None, :]
                d2 = dx * dx + dy * dy
                part = _topk_cols_per_row(d2, kk)
                out_q.append(np.repeat(qid_all[qs_], kk))
                out_i.append(pids[part].ravel())
                out_d.append(np.take_along_axis(d2, part, axis=1).ravel())
        if not out_q:
            return empty
        return pa.table({"qid": np.concatenate(out_q),
                         id_col: np.concatenate(out_i),
                         "dist2": np.concatenate(out_d)})

    cand = coarse_group_by_cell(both, local_knn_bucket)

    blocks = [t for t in ray.get(arrow_refs(cand)) if t.num_rows > 0]
    if not blocks:
        return pd.DataFrame({"qid": [], id_col: [], "dist2": []})
    tbl = pa.concat_tables(blocks, promote_options="default")
    g_qid = tbl.column("qid").to_numpy()
    g_ids = tbl.column(id_col).to_numpy()
    g_d2 = tbl.column("dist2").to_numpy()
    keep = _topk_per_qid(g_qid, g_ids, g_d2, k)
    order = np.lexsort((g_ids[keep], g_d2[keep], g_qid[keep]))
    keep = keep[order]
    return pd.DataFrame({"qid": g_qid[keep], id_col: g_ids[keep], "dist2": g_d2[keep]})


# --------------------------------------------------------------------------
# spatial join — the flagship distributed op (rtree.rs:522-534)
# --------------------------------------------------------------------------

def spatial_join(
    left, right, level: int, bounds: G.Bounds,
    left_id: str = "left_id", right_id: str = "right_id",
    id_col: str = "id",
    carry_left: tuple[str, ...] = (), carry_right: tuple[str, ...] = (),
):
    """intersection_candidates_with_other_tree, distributed.

    Both sides are flat-replicated to every grid cell their envelope
    touches, co-partitioned with ONE ``groupby(cell_id)`` shuffle, and
    joined per cell with a dual packed R-tree (PTree.join). A pair whose
    envelopes intersect in several cells is reported only by the OWNER
    cell — the cell containing the intersection box's min corner —
    giving exact pair-set equality with the reference's single-tree
    dual traversal (intersection_iterator.rs:15-104).

    Sides must carry ``id_col`` + envelope columns. Output:
    (left_id, right_id) plus, when ``carry_left`` / ``carry_right``
    name payload columns, one ``left_<col>`` / ``right_<col>`` column
    per pair — the Dataset form of the reference yielding the full
    objects ``(t, u)`` (rtree.rs:522-534). Payloads ride the one
    replication shuffle; prune them to what downstream actually needs.
    """
    l_schema = left.schema() if carry_left else None
    r_schema = right.schema() if carry_right else None
    l_types = {c: dict(zip(l_schema.names, l_schema.types))[c]
               for c in carry_left} if carry_left else {}
    r_types = {c: dict(zip(r_schema.names, r_schema.types))[c]
               for c in carry_right} if carry_right else {}
    out_carry = [(f"left_{c}", c, 0, t) for c, t in l_types.items()] + \
                [(f"right_{c}", c, 1, t) for c, t in r_types.items()]

    def prep(side_tag: int, carry: tuple[str, ...], other: dict):
        def f(batch: pa.Table) -> pa.Table:
            # dedupe: a carry column may itself be an envelope column
            t = batch.select(list(dict.fromkeys([id_col, *ENV_COLS, *carry])))
            t = replicate_to_cells(t, level, bounds)
            # union needs aligned schemas: this side's carries renamed to
            # their output name, the other side's padded with nulls
            out = {id_col: t.column(id_col)}
            for c in ENV_COLS:
                out[c] = t.column(c)
            for name, src, side_of, typ in out_carry:
                out[name] = (t.column(src) if side_of == side_tag
                             else pa.nulls(len(t), type=typ))
            out["cell_id"] = t.column("cell_id")
            out["side"] = pa.array(np.full(len(t), side_tag, dtype=np.int8))
            return pa.table(out)

        return f

    lrep = left.map_batches(prep(0, carry_left, r_types), batch_format="pyarrow", batch_size=None)
    rrep = right.map_batches(prep(1, carry_right, l_types), batch_format="pyarrow", batch_size=None)
    both = lrep.union(rrep)

    def join_bucket(group: pa.Table) -> pa.Table:
        """Dual-tree join for every cell co-located in this bucket."""
        empty = pa.table(
            {left_id: pa.array([], type=pa.int64()),
             right_id: pa.array([], type=pa.int64())}
            | {name: pa.array([], type=typ) for name, _, _, typ in out_carry}
        )
        if len(group) == 0 or "cell_id" not in group.column_names:
            return empty
        side = group.column("side").to_numpy()
        cell = group.column("cell_id").to_numpy()
        lo, up = _env_arrays(group)
        ids = group.column(id_col).to_numpy()
        order = np.argsort(cell, kind="stable")
        cell_s = cell[order]
        bnd = np.concatenate([[0], np.nonzero(cell_s[1:] != cell_s[:-1])[0] + 1, [len(cell_s)]])
        out_l, out_r, keep_l, keep_r = [], [], [], []
        for gi in range(len(bnd) - 1):
            rows = order[bnd[gi] : bnd[gi + 1]]
            lmask = side[rows] == 0
            li, ri = rows[lmask], rows[~lmask]
            if len(li) == 0 or len(ri) == 0:
                continue
            tl = PTree(lo[li], up[li])
            tr = PTree(lo[ri], up[ri])
            a, b = tl.join(tr)
            ga, gb = li[a], ri[b]
            # owner-cell rule: intersection min corner must fall in this cell
            this_cell = cell[rows[0]]
            ixmin = np.maximum(lo[ga, 0], lo[gb, 0])
            iymin = np.maximum(lo[ga, 1], lo[gb, 1])
            owner = G.owner_cell(ixmin, iymin, int(_cell_level(this_cell)), bounds)
            keep = owner == this_cell
            out_l.append(ids[ga[keep]])
            out_r.append(ids[gb[keep]])
            if out_carry:
                keep_l.append(ga[keep])
                keep_r.append(gb[keep])
        if not out_l:
            return empty
        result = {left_id: np.concatenate(out_l), right_id: np.concatenate(out_r)}
        if out_carry:
            gl = pa.array(np.concatenate(keep_l))
            gr = pa.array(np.concatenate(keep_r))
            for name, _, side_of, _typ in out_carry:
                result[name] = group.column(name).take(gl if side_of == 0 else gr)
        return pa.table(result)

    return coarse_group_by_cell(both, join_bucket)


def spatial_self_join(ds, level: int, bounds: G.Bounds,
                      left_id: str = "left_id", right_id: str = "right_id",
                      id_col: str = "id"):
    """Self-join special case of intersection_candidates
    (intersection_iterator.rs:15-104 run on one tree): every unordered
    intersecting pair exactly once, as (left_id < right_id).

    vs spatial_join(ds, ds): the table is replicated ONCE (not once per
    side — half the co-shuffle volume), each cell builds ONE tree and
    joins it with itself, and the id-order filter runs inside the cell
    task — emitting both directed pairs and filtering in a later stage
    doubled the exchanged pair volume (17.4M directed vs 8.4M unordered
    on the sf0.1 rects bench input)."""

    def prep(batch: pa.Table) -> pa.Table:
        return replicate_to_cells(batch.select([id_col, *ENV_COLS]),
                                  level, bounds)

    rep = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)

    def join_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table({left_id: pa.array([], type=pa.int64()),
                          right_id: pa.array([], type=pa.int64())})
        if len(group) == 0 or "cell_id" not in group.column_names:
            return empty
        cell = group.column("cell_id").to_numpy()
        lo, up = _env_arrays(group)
        ids = group.column(id_col).to_numpy()
        order = np.argsort(cell, kind="stable")
        cell_s = cell[order]
        bnd = np.concatenate([[0], np.nonzero(cell_s[1:] != cell_s[:-1])[0] + 1,
                              [len(cell_s)]])
        out_l, out_r = [], []
        for gi in range(len(bnd) - 1):
            rows = order[bnd[gi]: bnd[gi + 1]]
            tree = PTree(lo[rows], up[rows])
            a, b = tree.join(tree)
            ga, gb = rows[a], rows[b]
            # unordered-once + no self pairs, then the owner-cell rule
            m = ids[ga] < ids[gb]
            ga, gb = ga[m], gb[m]
            if len(ga) == 0:
                continue
            this_cell = cell[rows[0]]
            ixmin = np.maximum(lo[ga, 0], lo[gb, 0])
            iymin = np.maximum(lo[ga, 1], lo[gb, 1])
            owner = G.owner_cell(ixmin, iymin, int(_cell_level(this_cell)),
                                 bounds)
            keep = owner == this_cell
            out_l.append(ids[ga[keep]])
            out_r.append(ids[gb[keep]])
        if not out_l:
            return empty
        return pa.table({left_id: np.concatenate(out_l),
                         right_id: np.concatenate(out_r)})

    return coarse_group_by_cell(rep, join_bucket)


def _cell_level(cell_id: int) -> int:
    return int(np.asarray(cell_id).astype(np.uint64) >> np.uint64(58))


# --------------------------------------------------------------------------
# N-dimensional Dataset surface (reference is dimension-generic,
# point.rs:295-323; bulk_load_sequential.rs:113-151 tests 3-d/4-d)
# --------------------------------------------------------------------------

def locate_within_distance_nd(ds, axes: list[str], center, r2: float):
    """locate_within_distance in d dims over arbitrary coordinate
    columns (point rows): sum of squared axis deltas <= r2."""
    c = np.asarray(center, dtype=np.float64)

    def f(batch: pa.Table) -> pa.Table:
        d2 = np.zeros(len(batch))
        for i, col in enumerate(axes):
            dx = batch.column(col).to_numpy().astype(np.float64) - c[i]
            d2 += dx * dx
        return batch.filter(pa.array(d2 <= r2))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def knn_nd(ds, queries: pa.Table, k: int, axes: list[str],
           id_col: str = "id", reduce_blocks: int = 8):
    """Brute-force exact kNN in d dims (point rows; same broadcast +
    per-block top-k + tree-reduce shape as the 2-d knn, same
    deterministic (dist2, id) tie contract)."""
    import ray

    qxy = np.stack([queries.column(c).to_numpy().astype(np.float64) for c in axes], axis=1)
    qref = ray.put({"qid": queries.column("qid").to_numpy(), "xy": qxy})

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        n = len(batch)
        if n == 0:
            return pa.table({"qid": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             "dist2": pa.array([], type=pa.float64())})
        ids = batch.column(id_col).to_numpy()
        pts = np.stack([batch.column(c).to_numpy().astype(np.float64) for c in axes], axis=1)
        rid = np.argsort(ids, kind="stable")
        ids, pts = ids[rid], pts[rid]
        kk = min(k, n)
        out_q, out_i, out_d = [], [], []
        for s in range(0, len(q["qid"]), _KNN_Q_CHUNK):
            qc = q["xy"][s : s + _KNN_Q_CHUNK]
            d2 = np.zeros((n, len(qc)))
            for ax in range(pts.shape[1]):
                diff = pts[:, ax][:, None] - qc[:, ax][None, :]
                d2 += diff * diff
            part = _topk_rows_per_col(d2, kk)
            out_q.append(np.repeat(q["qid"][s : s + _KNN_Q_CHUNK], kk))
            out_i.append(ids[part].ravel(order="F"))
            out_d.append(np.take_along_axis(d2, part, axis=0).ravel(order="F"))
        return pa.table({"qid": np.concatenate(out_q),
                         id_col: np.concatenate(out_i),
                         "dist2": np.concatenate(out_d)})

    cand = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    cand = cand.repartition(reduce_blocks).map_batches(
        _knn_reduce, fn_args=(k, id_col), batch_format="pyarrow", batch_size=None
    )
    blocks = [t for t in ray.get(arrow_refs(cand)) if t.num_rows > 0]
    if not blocks:
        return pd.DataFrame({"qid": [], id_col: [], "dist2": []})
    tbl = pa.concat_tables(blocks)
    qid = tbl.column("qid").to_numpy()
    ids = tbl.column(id_col).to_numpy()
    d2 = tbl.column("dist2").to_numpy()
    keep = _topk_per_qid(qid, ids, d2, k)
    order = np.lexsort((ids[keep], d2[keep], qid[keep]))
    keep = keep[order]
    return pd.DataFrame({"qid": qid[keep], id_col: ids[keep], "dist2": d2[keep]})


def spatial_join_nd(
    left, right, axes_lo: list[str], axes_hi: list[str],
    level: int, bounds: "G.BoundsND",
    left_id: str = "left_id", right_id: str = "right_id", id_col: str = "id",
):
    """intersection_candidates in d dims: the 2-d spatial_join shape
    (flat replication to touched cells -> one coarse shuffle -> dual
    PTree per cell -> owner-cell exactly-once dedup) over a d-axis
    Morton grid. PTree and the envelope kernels are dimension-generic
    already; this extends the Dataset-layer routing."""
    d = len(axes_lo)

    def prep(side_tag: int):
        def f(batch: pa.Table) -> pa.Table:
            t = batch.select([id_col, *axes_lo, *axes_hi])
            lo = np.stack([t.column(c).to_numpy().astype(np.float64) for c in axes_lo], axis=1)
            hi = np.stack([t.column(c).to_numpy().astype(np.float64) for c in axes_hi], axis=1)
            rows, cells = G.covering_cells_of_envelopes_nd(lo, hi, level, bounds)
            out = t.take(pa.array(rows))
            out = out.append_column("cell_id", pa.array(cells))
            return out.append_column("side", pa.array(np.full(len(out), side_tag, dtype=np.int8)))

        return f

    both = left.map_batches(prep(0), batch_format="pyarrow", batch_size=None).union(
        right.map_batches(prep(1), batch_format="pyarrow", batch_size=None)
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table({left_id: pa.array([], type=pa.int64()),
                          right_id: pa.array([], type=pa.int64())})
        if len(group) == 0 or "cell_id" not in group.column_names:
            return empty
        side = group.column("side").to_numpy()
        cell = group.column("cell_id").to_numpy()
        lo = np.stack([group.column(c).to_numpy() for c in axes_lo], axis=1)
        up = np.stack([group.column(c).to_numpy() for c in axes_hi], axis=1)
        ids = group.column(id_col).to_numpy()
        order = np.argsort(cell, kind="stable")
        cell_s = cell[order]
        bnd = np.concatenate([[0], np.nonzero(cell_s[1:] != cell_s[:-1])[0] + 1, [len(cell_s)]])
        out_l, out_r = [], []
        for gi in range(len(bnd) - 1):
            rows = order[bnd[gi] : bnd[gi + 1]]
            lmask = side[rows] == 0
            li, ri = rows[lmask], rows[~lmask]
            if len(li) == 0 or len(ri) == 0:
                continue
            tl = PTree(lo[li], up[li])
            tr = PTree(lo[ri], up[ri])
            a, b = tl.join(tr)
            ga, gb = li[a], ri[b]
            this_cell = cell[rows[0]]
            imin = np.maximum(lo[ga], lo[gb])           # (m, d) min corner
            owner = G.owner_cell_nd(imin, int(_cell_level(this_cell)), bounds)
            keep = owner == this_cell
            out_l.append(ids[ga[keep]])
            out_r.append(ids[gb[keep]])
        if not out_l:
            return empty
        return pa.table({left_id: np.concatenate(out_l),
                         right_id: np.concatenate(out_r)})

    return coarse_group_by_cell(both, join_bucket)


# --------------------------------------------------------------------------
# cell directory — the distributed "root node" (SURVEY.md §2.6)
# --------------------------------------------------------------------------

def _partial_directory(batch: pa.Table, key_cols: list[str]) -> pa.Table:
    """Per-batch combiner: one row per key with envelope union + count
    (envelope_for_children, node.rs:158-167, as an aggregate). Keeps the
    groupby shuffle tiny — partials, not raw rows, are exchanged."""
    if len(batch) == 0:
        return pa.table(
            {c: pa.array([], type=pa.int64()) for c in key_cols}
            | {"n": pa.array([], type=pa.int64())}
            | {c: pa.array([], type=pa.float64()) for c in ENV_COLS}
        )
    keys = np.stack([batch.column(c).to_numpy() for c in key_cols], axis=1)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    k = len(uniq)
    n = np.bincount(inv, minlength=k)
    lo, up = _env_arrays(batch)
    minx = np.full(k, np.inf); miny = np.full(k, np.inf)
    maxx = np.full(k, -np.inf); maxy = np.full(k, -np.inf)
    np.minimum.at(minx, inv, lo[:, 0]); np.minimum.at(miny, inv, lo[:, 1])
    np.maximum.at(maxx, inv, up[:, 0]); np.maximum.at(maxy, inv, up[:, 1])
    return pa.table(
        {key_cols[i]: uniq[:, i] for i in range(len(key_cols))}
        | {"n": n.astype(np.int64), "minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy}
    )


def _combine_directory(part, keys: list[str]):
    """Distributed combine for tiny partial-directory rows
    (keys + n/minx/miny/maxx/maxy): Ray's native groupby().aggregate is
    per-key Python — measured 3.7 s on 31k partial rows (958 cells x 40
    blocks) where one vectorized pandas groupby per coarse bucket does
    the identical combine in ~10 ms. Multi-key directories fold the
    keys into one int64 exchange key (tiles are << 2^31)."""
    agg_cols = ["n", "minx", "miny", "maxx", "maxy"]

    def combine(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or keys[0] not in g.column_names:
            cols = {k: pa.array([], type=pa.int64()) for k in keys}
            cols["n"] = pa.array([], type=pa.int64())
            for c in agg_cols[1:]:
                cols[c] = pa.array([], type=pa.float64())
            return pa.table(cols)
        df = g.select([*keys, *agg_cols]).to_pandas()
        out = df.groupby(keys, sort=False).agg(
            n=("n", "sum"), minx=("minx", "min"), miny=("miny", "min"),
            maxx=("maxx", "max"), maxy=("maxy", "max")).reset_index()
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    if len(keys) == 1:
        keyed, kc = part, keys[0]
    else:
        def addk(b: pa.Table) -> pa.Table:
            k = (b.column(keys[0]).to_numpy() * np.int64(1 << 32)
                 + b.column(keys[1]).to_numpy())
            return b.append_column("__ck", pa.array(k))

        keyed = part.map_batches(addk, batch_format="pyarrow",
                                 batch_size=None)
        kc = "__ck"
    return coarse_group_by_cell(keyed, combine, key_col=kc)


def cell_directory(ds, level: int, bounds: G.Bounds):
    """groupby(cell_id) -> (n, envelope union) per occupied cell.

    The result is SMALL (one row per cell) and is the planner's pruning
    structure — the distributed analogue of the reference tree's upper
    levels. Partial aggregation inside map_batches keeps the all-to-all
    exchange proportional to #cells, not #rows.
    """
    part = ds.map_batches(
        lambda b: _partial_directory(assign_owner_cells(b, level, bounds), ["cell_id"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    return _combine_directory(part, ["cell_id"])


def tile_geometry_join(ds, nx: int, ny: int, bounds: G.Bounds,
                       id_col: str = "id"):
    """Raster-tile <-> vector-geometry join: one output row per
    (tile, geometry whose envelope intersects the tile).

    Stateless flat replication per batch (the tile grid needs no
    shuffle — tiles are addressable by arithmetic), exactly the
    assignment the north star's tile join asks for. Clipping into the
    grid matches tile_histogram's floor arithmetic so both share one
    SQL oracle family.
    """

    def f(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "tile_x": pa.array([], type=pa.int64()),
                "tile_y": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=batch.schema.field(id_col).type),
            })
        x0 = batch.column("minx").to_numpy()
        y0 = batch.column("miny").to_numpy()
        x1 = batch.column("maxx").to_numpy()
        y1 = batch.column("maxy").to_numpy()
        tx0 = np.clip(np.floor((x0 - bounds.minx) / bounds.width * nx).astype(np.int64), 0, nx - 1)
        tx1 = np.clip(np.floor((x1 - bounds.minx) / bounds.width * nx).astype(np.int64), 0, nx - 1)
        ty0 = np.clip(np.floor((y0 - bounds.miny) / bounds.height * ny).astype(np.int64), 0, ny - 1)
        ty1 = np.clip(np.floor((y1 - bounds.miny) / bounds.height * ny).astype(np.int64), 0, ny - 1)
        row_idx, out_tx, out_ty = G.enumerate_cell_ranges(tx0, ty0, tx1, ty1)
        return pa.table(
            {
                "tile_x": out_tx,
                "tile_y": out_ty,
                id_col: batch.column(id_col).take(pa.array(row_idx)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def tile_histogram(ds, nx: int, ny: int, bounds: G.Bounds):
    """Row-major tile assignment + per-tile aggregate — the raster-tile
    side of the tile<->geometry join surface, with an ANSI-SQL oracle
    (floor arithmetic, no Morton interleave)."""

    def tiled(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("tile_x", pa.array([], type=pa.int64())) \
                        .append_column("tile_y", pa.array([], type=pa.int64()))
        x = batch.column("minx").to_numpy()
        y = batch.column("miny").to_numpy()
        tx = np.clip(np.floor((x - bounds.minx) / bounds.width * nx).astype(np.int64), 0, nx - 1)
        ty = np.clip(np.floor((y - bounds.miny) / bounds.height * ny).astype(np.int64), 0, ny - 1)
        return batch.append_column("tile_x", pa.array(tx)).append_column("tile_y", pa.array(ty))

    part = ds.map_batches(
        lambda b: _partial_directory(tiled(b), ["tile_x", "tile_y"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    return _combine_directory(part, ["tile_x", "tile_y"])
