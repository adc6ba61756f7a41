"""Index build pipeline: partitioned, checkpointed, resumable.

The distributed equivalent of ``RTree::bulk_load`` (SURVEY.md §2.1):

  histogram pass -> skew-split hot cells -> groupby(cell) shuffle ->
  one parquet partition per cell + manifest.json

The manifest is the per-partition LINEAGE record (cell -> file, rows,
envelope, bytes, wall_ms): a rerun skips cells already present
(idempotent deterministic filenames), the planner prunes reads against
it, and its invariants (counts sum to the table count, partition
envelope == union of row envelopes) are the distributed
``sanity_check`` (rstar/src/node.rs:106-155).

Skew handling (rstar degrades to O(n) when everything overlaps,
rtree.rs:134-142): cells whose histogram count exceeds
``target_rows`` are re-keyed to descendants ``ceil(log4(n/target))``
levels finer — the cluster-granularity version of OMT's split-until-
small recursion. Duplicate coordinates cannot be split spatially;
those cells stay hot and are simply bounded by the physical data.
"""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import grid as G
from . import metrics
from . import ops

# underscore prefix: pyarrow/Ray dataset discovery skips non-data files
MANIFEST = "_manifest.json"


def plan_skew_split(directory: pd.DataFrame, base_level: int, target_rows: int,
                    max_level: int = G.MAX_LEVEL) -> dict[int, int]:
    """cell_id -> finer level for cells with count > target_rows."""
    hot = directory[directory["n"] > target_rows]
    out: dict[int, int] = {}
    for cid, n in zip(hot["cell_id"], hot["n"]):
        delta = max(1, math.ceil(math.log(n / target_rows, 4)))
        out[int(cid)] = min(base_level + delta, max_level)
    return out


def assign_adaptive_cells(batch: pa.Table, base_level: int,
                          hot_map: dict[int, int], bounds: G.Bounds) -> pa.Table:
    """Owner-cell assignment with per-cell adaptive resolution."""
    x = batch.column("minx").to_numpy()
    y = batch.column("miny").to_numpy()
    cid = G.owner_cell(x, y, base_level, bounds)
    if hot_map:
        # sorted-lookup (searchsorted), not a per-row dict probe: hot
        # cells are by definition the cells with the MOST rows, so this
        # path sees the bulk of a skewed table
        hot_ids = np.fromiter(hot_map.keys(), dtype=np.int64)
        hot_lvls = np.fromiter(hot_map.values(), dtype=np.int64)
        order = np.argsort(hot_ids)
        hot_ids, hot_lvls = hot_ids[order], hot_lvls[order]
        pos = np.searchsorted(hot_ids, cid)
        pos_c = np.minimum(pos, len(hot_ids) - 1)
        mask = hot_ids[pos_c] == cid
        if mask.any():
            sub_lvls = hot_lvls[pos_c[mask]]
            fine = np.empty(int(mask.sum()), dtype=np.int64)
            for lvl in np.unique(sub_lvls):
                m2 = sub_lvls == lvl
                fine[m2] = G.owner_cell(x[mask][m2], y[mask][m2], int(lvl), bounds)
            cid[mask] = fine
    return batch.append_column("cell_id", pa.array(cid))


def build_partitioned_index(
    ds,
    path: str,
    base_level: int,
    bounds: G.Bounds,
    target_rows: int = 200_000,
    resume: bool = True,
) -> dict:
    """Build (or resume) the partitioned spatial index at ``path``.

    Returns the manifest dict. Stage 1 streams a histogram (partial
    count per cell inside map_batches, tiny groupby); stage 2 shuffles
    rows once on the (skew-split) cell key and writes one parquet file
    per cell with a deterministic name, skipping cells already in the
    manifest — that is the checkpoint/resume contract.
    """
    t_start = time.perf_counter()
    os.makedirs(path, exist_ok=True)
    man_path = os.path.join(path, MANIFEST)
    done: dict[str, dict] = {}
    if resume and os.path.exists(man_path):
        with open(man_path) as f:
            done = json.load(f)["partitions"]

    # -- stage 1: histogram + skew plan ------------------------------------
    directory = ops.cell_directory(ds, base_level, bounds).to_pandas()
    hot_map = plan_skew_split(directory, base_level, target_rows)

    # -- stage 2: shuffle on adaptive cell key, write per-cell files -------
    keyed = ds.map_batches(
        lambda b: assign_adaptive_cells(b, base_level, hot_map, bounds),
        batch_format="pyarrow",
        batch_size=None,
    )
    done_ids = {int(k) for k in done}

    def write_bucket(group: pa.Table) -> pd.DataFrame:
        """Write every cell co-located in this coarse bucket to its own
        deterministic file (idempotent; finished cells skipped)."""
        out: list[dict] = []
        if len(group) == 0 or "cell_id" not in group.column_names:
            return pd.DataFrame(
                {c: pd.Series([], dtype=d) for c, d in
                 [("cell_id", np.int64), ("rows", np.int64), ("bytes", np.int64),
                  ("wall_ms", float), ("skipped", bool), ("minx", float),
                  ("miny", float), ("maxx", float), ("maxy", float)]}
            )
        cells = group.column("cell_id").to_numpy()
        order = np.argsort(cells, kind="stable")
        cs = cells[order]
        bnd = np.concatenate([[0], np.nonzero(cs[1:] != cs[:-1])[0] + 1, [len(cs)]])
        for gi in range(len(bnd) - 1):
            rows_idx = order[bnd[gi] : bnd[gi + 1]]
            cid = int(cs[bnd[gi]])
            t0 = time.perf_counter()
            if cid in done_ids:
                p = done[str(cid)]
                out.append({"cell_id": cid, "rows": p["rows"], "bytes": p["bytes"],
                            "wall_ms": 0.0, "skipped": True, "minx": p["minx"],
                            "miny": p["miny"], "maxx": p["maxx"], "maxy": p["maxy"]})
                continue
            part = group.take(pa.array(rows_idx))
            if "__cg" in part.column_names:
                part = part.drop_columns(["__cg"])
            fname = os.path.join(path, f"part-{cid}.parquet")
            tmp = fname + ".tmp"
            pq.write_table(part, tmp)
            os.replace(tmp, fname)  # atomic publish
            out.append({
                "cell_id": cid, "rows": len(part),
                "bytes": os.path.getsize(fname),
                "wall_ms": round((time.perf_counter() - t0) * 1e3, 2),
                "skipped": False,
                "minx": part.column("minx").to_numpy().min(),
                "miny": part.column("miny").to_numpy().min(),
                "maxx": part.column("maxx").to_numpy().max(),
                "maxy": part.column("maxy").to_numpy().max(),
            })
        return pd.DataFrame(out)

    stats_ds = ops.coarse_group_by_cell(keyed, write_bucket)
    stats = stats_ds.to_pandas()

    partitions = {
        str(int(r.cell_id)): {
            "file": f"part-{int(r.cell_id)}.parquet",
            "rows": int(r.rows), "bytes": int(r.bytes),
            "wall_ms": float(r.wall_ms),
            "minx": float(r.minx), "miny": float(r.miny),
            "maxx": float(r.maxx), "maxy": float(r.maxy),
        }
        for r in stats.itertuples()
    }
    manifest = {
        "base_level": base_level,
        "bounds": bounds.to_list(),
        "target_rows": target_rows,
        "hot_map": {str(k): v for k, v in hot_map.items()},
        "total_rows": int(stats["rows"].sum()),
        "built_cells": int((~stats["skipped"]).sum()),
        "resumed_cells": int(stats["skipped"].sum()),
        "wall_sec": round(time.perf_counter() - t_start, 3),
        "stages": metrics.stage_metrics(stats_ds),
        "partitions": partitions,
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, man_path)
    return manifest


def directory_from_manifest(man: dict) -> pd.DataFrame:
    """Cell directory (cell_id, n, envelope) straight from a build
    manifest — lets the planner reuse the build's lineage records
    instead of re-scanning the data. Valid when no hot cells were split
    (the ids are then base-level owner cells)."""
    rows = [
        {"cell_id": int(cid), "n": live_rows(p), "minx": p["minx"],
         "miny": p["miny"], "maxx": p["maxx"], "maxy": p["maxy"]}
        for cid, p in man["partitions"].items()
    ]
    return pd.DataFrame(rows)


def load_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


def sanity_check_index(path: str, expected_rows: int | None = None) -> None:
    """Distributed sanity_check (node.rs:106-155 analogue): partition
    row counts sum to the table count; each partition file's rows all
    fall inside the manifest envelope; manifest envelope == exact union
    of row envelopes."""
    man = load_manifest(path)
    total = 0
    deleted = 0
    for cid, p in man["partitions"].items():
        t = pq.read_table(os.path.join(path, p["file"]))
        assert len(t) == p["rows"], f"cell {cid}: manifest rows mismatch"
        total += len(t)
        lo_x = t.column("minx").to_numpy()
        lo_y = t.column("miny").to_numpy()
        hi_x = t.column("maxx").to_numpy()
        hi_y = t.column("maxy").to_numpy()
        assert lo_x.min() == p["minx"] and lo_y.min() == p["miny"]
        assert hi_x.max() == p["maxx"] and hi_y.max() == p["maxy"]
        cells = t.column("cell_id").to_numpy()
        assert (cells == int(cid)).all(), f"cell {cid}: foreign rows"
        # pending tombstones: unique ids, every one present in the
        # file, and the manifest's deleted == PHYSICAL matching rows
        # (duplicate ids mean one tombstone kills several copies)
        nd = p.get("deleted", 0)
        if nd:
            dl = pq.read_table(
                os.path.join(path, _del_name(int(cid)))).column("id").to_numpy()
            assert len(np.unique(dl)) == len(dl), \
                f"cell {cid}: duplicate tombstones"
            fids = t.column("id").to_numpy()
            assert np.isin(dl, fids).all(), \
                f"cell {cid}: tombstone for absent id"
            assert int(np.isin(fids, dl).sum()) == nd, \
                f"cell {cid}: del count mismatch"
            deleted += nd
    assert total == man["total_rows"]
    assert deleted == man.get("deleted_rows", 0)
    if expected_rows is not None:
        assert total - deleted == expected_rows


def query_index_envelope(path: str, qminx, qminy, qmaxx, qmaxy,
                         intersecting: bool = True):
    """locate_in_envelope against a BUILT index: the planner prunes
    partitions via the manifest (the 'root level' of the distributed
    tree) and reads ONLY the covering cell files — prune-at-the-read.
    """
    man = load_manifest(path)
    files = []
    for p in man["partitions"].values():
        if live_rows(p) == 0:
            continue
        if p["minx"] <= qmaxx and p["maxx"] >= qminx and \
           p["miny"] <= qmaxy and p["maxy"] >= qminy:
            files.append(os.path.join(path, p["file"]))
    import ray.data as rd

    if not files:
        return None
    ds = filter_tombstones(rd.read_parquet(files), load_tombstones(path, man))
    if intersecting:
        return ops.locate_in_envelope_intersecting(ds, qminx, qminy, qmaxx, qmaxy)
    return ops.locate_in_envelope(ds, qminx, qminy, qmaxx, qmaxy)


def query_index_with_selection_function(path: str, keep_rows,
                                        prune_partition=None):
    """locate_with_selection_function against a BUILT index — BOTH
    halves of the SelectionFunction protocol (selection_functions.rs:
    23-37): ``prune_partition(lo, up) -> bool mask`` plays
    should_unpack_parent against the manifest's partition envelopes
    (pruned partitions are never read from storage), ``keep_rows``
    plays should_unpack_leaf on the surviving rows.

    Returns (dataset_or_None, n_files_read, n_files_total) so callers
    and tests can observe the prune.
    """
    from . import ops

    man = load_manifest(path)
    files, los, ups = [], [], []
    for p in man["partitions"].values():
        if live_rows(p) == 0:
            continue
        files.append(os.path.join(path, p["file"]))
        los.append([p["minx"], p["miny"]])
        ups.append([p["maxx"], p["maxy"]])
    total = len(files)
    if prune_partition is not None and files:
        mask = np.asarray(prune_partition(np.asarray(los), np.asarray(ups)),
                          dtype=bool)
        files = [f for f, m in zip(files, mask) if m]
    if not files:
        return None, 0, total
    import ray.data as rd

    ds = filter_tombstones(rd.read_parquet(files), load_tombstones(path, man))
    return ops.locate_with_selection_function(ds, keep_rows), len(files), total


# --------------------------------------------------------------------------
# N-dimensional persisted index (reference is dimension-generic,
# point.rs:295-323; 3-d/4-d bulk loads tested at
# bulk_load_sequential.rs:113-151). Same histogram -> skew-split ->
# one-shuffle -> per-cell-file + manifest contract as the 2-d build;
# partition envelopes are per-axis lo/hi lists.
# --------------------------------------------------------------------------

def build_partitioned_index_nd(
    ds,
    path: str,
    axes: list[str],
    base_level: int,
    bounds: G.BoundsND,
    target_rows: int = 200_000,
    resume: bool = True,
) -> dict:
    """Build (or resume) a partitioned index over point rows whose
    coordinates live in columns ``axes`` (any d >= 2)."""
    t_start = time.perf_counter()
    d = len(axes)
    os.makedirs(path, exist_ok=True)
    man_path = os.path.join(path, MANIFEST)
    done: dict[str, dict] = {}
    if resume and os.path.exists(man_path):
        with open(man_path) as f:
            done = json.load(f)["partitions"]

    # -- stage 1: histogram + skew plan (cells split log_{2^d} deep) -------
    def part_hist(b: pa.Table) -> pa.Table:
        coords = np.stack(
            [b.column(c).to_numpy().astype(np.float64) for c in axes], axis=1)
        cid = G.cell_of_points_nd(coords, base_level, bounds)
        u, c = np.unique(cid, return_counts=True)
        return pa.table({"cell_id": u, "n": c.astype(np.int64)})

    def sum_cells(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "cell_id" not in g.column_names:
            return pa.table({"cell_id": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        df = g.select(["cell_id", "n"]).to_pandas()
        out = df.groupby("cell_id", sort=False)["n"].sum().reset_index()
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    # vectorized combine (Ray's native aggregate is per-key Python)
    hist = ops.coarse_group_by_cell(
        ds.map_batches(part_hist, batch_format="pyarrow", batch_size=None),
        sum_cells, key_col="cell_id").to_pandas()
    hot_map: dict[int, int] = {}
    max_lvl = G.max_level_nd(d)
    for cid, n in zip(hist["cell_id"], hist["n"]):
        if n > target_rows:
            delta = max(1, math.ceil(math.log(n / target_rows, 2 ** d)))
            hot_map[int(cid)] = min(base_level + delta, max_lvl)

    # -- stage 2: adaptive assignment, one coarse shuffle, per-cell files --
    def assign(b: pa.Table) -> pa.Table:
        coords = np.stack(
            [b.column(c).to_numpy().astype(np.float64) for c in axes], axis=1)
        cid = G.cell_of_points_nd(coords, base_level, bounds)
        if hot_map:
            hot_ids = np.fromiter(hot_map.keys(), dtype=np.int64)
            hot_lvls = np.fromiter(hot_map.values(), dtype=np.int64)
            order = np.argsort(hot_ids)
            hot_ids, hot_lvls = hot_ids[order], hot_lvls[order]
            pos = np.minimum(np.searchsorted(hot_ids, cid), len(hot_ids) - 1)
            mask = hot_ids[pos] == cid
            if mask.any():
                sub_lvls = hot_lvls[pos[mask]]
                fine = np.empty(int(mask.sum()), dtype=np.int64)
                for lvl in np.unique(sub_lvls):
                    m2 = sub_lvls == lvl
                    fine[m2] = G.cell_of_points_nd(coords[mask][m2], int(lvl), bounds)
                cid[mask] = fine
        return b.append_column("cell_id", pa.array(cid))

    keyed = ds.map_batches(assign, batch_format="pyarrow", batch_size=None)
    done_ids = {int(k) for k in done}

    def write_bucket(group: pa.Table) -> pd.DataFrame:
        cols = {"cell_id": np.int64, "rows": np.int64, "bytes": np.int64,
                "wall_ms": float, "skipped": bool,
                **{f"lo{i}": float for i in range(d)},
                **{f"hi{i}": float for i in range(d)}}
        if len(group) == 0 or "cell_id" not in group.column_names:
            return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})
        cells = group.column("cell_id").to_numpy()
        order = np.argsort(cells, kind="stable")
        cs = cells[order]
        bnd = np.concatenate([[0], np.nonzero(cs[1:] != cs[:-1])[0] + 1, [len(cs)]])
        out: list[dict] = []
        for gi in range(len(bnd) - 1):
            rows_idx = order[bnd[gi] : bnd[gi + 1]]
            cid = int(cs[bnd[gi]])
            t0 = time.perf_counter()
            if cid in done_ids:
                p = done[str(cid)]
                out.append({"cell_id": cid, "rows": p["rows"], "bytes": p["bytes"],
                            "wall_ms": 0.0, "skipped": True,
                            **{f"lo{i}": p["lo"][i] for i in range(d)},
                            **{f"hi{i}": p["hi"][i] for i in range(d)}})
                continue
            part = group.take(pa.array(rows_idx))
            if "__cg" in part.column_names:
                part = part.drop_columns(["__cg"])
            fname = os.path.join(path, f"part-{cid}.parquet")
            tmp = fname + ".tmp"
            pq.write_table(part, tmp)
            os.replace(tmp, fname)
            rec = {"cell_id": cid, "rows": len(part),
                   "bytes": os.path.getsize(fname),
                   "wall_ms": round((time.perf_counter() - t0) * 1e3, 2),
                   "skipped": False}
            for i, c in enumerate(axes):
                v = part.column(c).to_numpy()
                rec[f"lo{i}"] = float(v.min())
                rec[f"hi{i}"] = float(v.max())
            out.append(rec)
        return pd.DataFrame(out)

    stats_ds = ops.coarse_group_by_cell(keyed, write_bucket)
    stats = stats_ds.to_pandas()
    partitions = {
        str(int(r.cell_id)): {
            "file": f"part-{int(r.cell_id)}.parquet",
            "rows": int(r.rows), "bytes": int(r.bytes),
            "wall_ms": float(r.wall_ms),
            "lo": [float(getattr(r, f"lo{i}")) for i in range(d)],
            "hi": [float(getattr(r, f"hi{i}")) for i in range(d)],
        }
        for r in stats.itertuples()
    }
    manifest = {
        "axes": axes,
        "base_level": base_level,
        "bounds": bounds.to_list(),
        "target_rows": target_rows,
        "hot_map": {str(k): v for k, v in hot_map.items()},
        "total_rows": int(stats["rows"].sum()),
        "built_cells": int((~stats["skipped"]).sum()),
        "resumed_cells": int(stats["skipped"].sum()),
        "wall_sec": round(time.perf_counter() - t_start, 3),
        "stages": metrics.stage_metrics(stats_ds),
        "partitions": partitions,
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, man_path)
    return manifest


def query_index_box_nd(path: str, lo, hi):
    """locate_in_box_nd against a BUILT n-d index: partitions whose
    envelope intersects the box are read; everything else is pruned at
    the manifest (prune-at-the-read, dimension-generic)."""
    man = load_manifest(path)
    axes = man["axes"]
    lo = np.asarray(lo, dtype=np.float64)
    hi = np.asarray(hi, dtype=np.float64)
    files = []
    for p in man["partitions"].values():
        if live_rows(p) == 0:
            continue
        plo = np.asarray(p["lo"])
        phi = np.asarray(p["hi"])
        if (plo <= hi).all() and (phi >= lo).all():
            files.append(os.path.join(path, p["file"]))
    if not files:
        return None
    import ray.data as rd

    ds = filter_tombstones(rd.read_parquet(files), load_tombstones(path, man))
    return ops.locate_in_box_nd(ds, axes, lo.tolist(), hi.tolist())


def query_index_within_distance_nd(path: str, center, r2: float):
    """locate_within_distance in d dims against a BUILT index: prune by
    clamped envelope distance on the manifest, exact kernel on rows."""
    man = load_manifest(path)
    axes = man["axes"]
    c = np.asarray(center, dtype=np.float64)
    files = []
    for p in man["partitions"].values():
        if live_rows(p) == 0:
            continue
        plo = np.asarray(p["lo"])
        phi = np.asarray(p["hi"])
        diff = np.clip(c, plo, phi) - c
        if float((diff * diff).sum()) <= r2:
            files.append(os.path.join(path, p["file"]))
    if not files:
        return None
    import ray.data as rd

    ds = filter_tombstones(rd.read_parquet(files), load_tombstones(path, man))
    return ops.locate_within_distance_nd(ds, axes, c.tolist(), r2)


def sanity_check_index_nd(path: str, expected_rows: int | None = None) -> None:
    """node.rs:106-155 analogue for the n-d index: counts sum, per-axis
    envelopes exact, no foreign rows."""
    man = load_manifest(path)
    axes = man["axes"]
    total = 0
    for cid, p in man["partitions"].items():
        t = pq.read_table(os.path.join(path, p["file"]))
        assert len(t) == p["rows"], f"cell {cid}: manifest rows mismatch"
        total += len(t)
        for i, c in enumerate(axes):
            v = t.column(c).to_numpy()
            assert v.min() == p["lo"][i] and v.max() == p["hi"][i]
        cells = t.column("cell_id").to_numpy()
        assert (cells == int(cid)).all(), f"cell {cid}: foreign rows"
    assert total == man["total_rows"]
    if expected_rows is not None:
        assert total == expected_rows


def checkpointed_spatial_join(
    left, right, level: int, bounds: G.Bounds, out_dir: str,
    id_col: str = "id", resume: bool = True,
) -> dict:
    """spatial_join with resumable, partitioned output.

    Pairs are written one parquet file per shuffle bucket
    (`pairs-{bucket}.parquet`, atomic rename) plus a manifest recording
    rows/bytes/wall_ms per bucket. On rerun, finished buckets are
    filtered out BEFORE the shuffle — their rows never enter the
    exchange, so a resumed run only pays for the missing partitions.
    Returns the manifest; read results with read_parquet(out_dir).
    """
    import numpy as np
    import pyarrow as pa

    from .ops import (PTree, _cell_level, _env_arrays,
                      coarse_bucket_ids, replicate_to_cells)
    from .scale import shuffle_buckets

    os.makedirs(out_dir, exist_ok=True)
    man_path = os.path.join(out_dir, MANIFEST)
    done: dict[str, dict] = {}
    nb: int | None = None
    if resume and os.path.exists(man_path):
        with open(man_path) as f:
            man0 = json.load(f)
        done = man0["buckets"]
        # bucket ids only mean anything under the count that produced
        # them — resume MUST reuse the manifest's count
        nb = int(man0.get("n_buckets") or 0) or None
    if nb is None:
        nb = shuffle_buckets(left, right)
    done_ids = np.fromiter((int(k) for k in done), dtype=np.int64,
                           count=len(done))

    def prep(side_tag: int):
        def f(batch: pa.Table) -> pa.Table:
            t = batch.select([id_col, "minx", "miny", "maxx", "maxy"])
            t = replicate_to_cells(t, level, bounds)
            cg = coarse_bucket_ids(t.column("cell_id").to_numpy(), nb)
            keep = ~np.isin(cg, done_ids)
            t = t.append_column("side", pa.array(np.full(len(t), side_tag, dtype=np.int8)))
            t = t.append_column("__cg", pa.array(cg))
            return t.filter(pa.array(keep))

        return f

    both = left.map_batches(prep(0), batch_format="pyarrow", batch_size=None).union(
        right.map_batches(prep(1), batch_format="pyarrow", batch_size=None)
    )

    def join_and_write(group: pa.Table) -> pd.DataFrame:
        cols = ["bucket", "rows", "bytes", "wall_ms"]
        if len(group) == 0 or "cell_id" not in group.column_names:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64 if c != "wall_ms" else float)
                                 for c in cols})
        t0 = time.perf_counter()
        bucket = int(group.column("__cg")[0].as_py())
        side = group.column("side").to_numpy()
        cell = group.column("cell_id").to_numpy()
        lo, up = _env_arrays(group)
        ids = group.column(id_col).to_numpy()
        order = np.argsort(cell, kind="stable")
        cs = cell[order]
        bnd = np.concatenate([[0], np.nonzero(cs[1:] != cs[:-1])[0] + 1, [len(cs)]])
        out_l, out_r = [], []
        for gi in range(len(bnd) - 1):
            rows = order[bnd[gi] : bnd[gi + 1]]
            lmask = side[rows] == 0
            li, ri = rows[lmask], rows[~lmask]
            if len(li) == 0 or len(ri) == 0:
                continue
            a, b = PTree(lo[li], up[li]).join(PTree(lo[ri], up[ri]))
            ga, gb = li[a], ri[b]
            this_cell = cell[rows[0]]
            ixmin = np.maximum(lo[ga, 0], lo[gb, 0])
            iymin = np.maximum(lo[ga, 1], lo[gb, 1])
            owner = G.owner_cell(ixmin, iymin, int(_cell_level(this_cell)), bounds)
            keep = owner == this_cell
            out_l.append(ids[ga[keep]])
            out_r.append(ids[gb[keep]])
        pairs = pa.table(
            {
                "left_id": np.concatenate(out_l) if out_l else np.empty(0, dtype=np.int64),
                "right_id": np.concatenate(out_r) if out_r else np.empty(0, dtype=np.int64),
            }
        )
        fname = os.path.join(out_dir, f"pairs-{bucket}.parquet")
        tmp = fname + ".tmp"
        pq.write_table(pairs, tmp)
        os.replace(tmp, fname)
        return pd.DataFrame(
            {"bucket": [bucket], "rows": [len(pairs)],
             "bytes": [os.path.getsize(fname)],
             "wall_ms": [round((time.perf_counter() - t0) * 1e3, 2)]}
        )

    stats = both.groupby("__cg").map_groups(join_and_write, batch_format="pyarrow").to_pandas()
    buckets = dict(done)
    for r in stats.itertuples():
        buckets[str(int(r.bucket))] = {
            "file": f"pairs-{int(r.bucket)}.parquet",
            "rows": int(r.rows), "bytes": int(r.bytes), "wall_ms": float(r.wall_ms),
        }
    man = {
        "level": level, "bounds": bounds.to_list(),
        "n_buckets": nb,
        "total_pairs": sum(b["rows"] for b in buckets.values()),
        "built_buckets": len(stats), "resumed_buckets": len(done),
        "buckets": buckets,
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, man_path)
    return man


# --------------------------------------------------------------------------
# Index-integrated removal: per-cell tombstone lists + compaction.
#
# The reference mutates the tree in place (removal.rs:67-243) and tests
# remove-then-insert round-trips (removal.rs:257-302, rtree.rs:1140-1150).
# The distributed equivalent: removal writes a small `del-{cell}.parquet`
# id list next to the partition file (data files untouched — cheap,
# idempotent, resumable), every query path anti-filters those ids at
# read time, and compaction / delta-ingest rewrites the touched
# partitions without the dead rows. Manifest partition envelopes stay
# as-built until compaction — conservative but sound for pruning, the
# same way the reference tolerates under-full nodes after removal
# (removal.rs:137-139).
# --------------------------------------------------------------------------

def _del_name(cid: int) -> str:
    return f"del-{cid}.parquet"


def live_rows(p: dict) -> int:
    """Rows of a manifest partition net of pending tombstones."""
    return p["rows"] - p.get("deleted", 0)


def load_tombstones(path: str, man: dict | None = None) -> dict[int, np.ndarray]:
    """cell_id -> sorted deleted ids for every partition with pending
    tombstones (empty dict when the index is fully compacted)."""
    man = man if man is not None else load_manifest(path)
    out: dict[int, np.ndarray] = {}
    for cid, p in man["partitions"].items():
        if p.get("deleted", 0) > 0:
            t = pq.read_table(os.path.join(path, _del_name(int(cid))))
            out[int(cid)] = np.sort(t.column("id").to_numpy())
    return out


def filter_tombstones(ds, dels: dict[int, np.ndarray], id_col: str = "id"):
    """Anti-filter deleted ids out of partition rows (rows carry their
    cell_id column). The tombstone map is broadcast ONCE via ray.put and
    read zero-copy in every task — never re-shipped per batch."""
    if not dels:
        return ds
    import ray

    ref = ray.put(dels)

    def f(b: pa.Table) -> pa.Table:
        d = ray.get(ref)
        cells = b.column("cell_id").to_numpy()
        ids = b.column(id_col).to_numpy()
        keep = np.ones(len(b), dtype=bool)
        for cid in np.unique(cells):
            dl = d.get(int(cid))
            if dl is not None:
                m = cells == cid
                keep[m] &= ~np.isin(ids[m], dl)
        return b.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def read_index(path: str, columns: list[str] | None = None):
    """All LIVE rows of a built index as a Dataset (tombstones applied)."""
    import ray.data as rd

    man = load_manifest(path)
    files = [os.path.join(path, p["file"]) for p in man["partitions"].values()
             if live_rows(p) > 0]
    if not files:
        return None
    ds = rd.read_parquet(files, columns=columns)
    return filter_tombstones(ds, load_tombstones(path, man))


def _write_cell_dels(path: str, cid: int, new_ids: np.ndarray) -> int:
    """Merge ids into del-{cid}.parquet (atomic publish); returns the
    PHYSICAL deleted row count for the cell — the number of rows in the
    partition file matching a tombstoned id, which can exceed the id
    count when duplicates exist ('rstar' ingest explicitly allows them;
    filter_tombstones kills every copy, so the manifest accounting must
    count copies too). The del-file column is ALWAYS named "id" whatever
    the index's id column is called — load_tombstones reads it by that
    name."""
    f = os.path.join(path, _del_name(cid))
    if os.path.exists(f):
        old = pq.read_table(f).column(0).to_numpy()
        merged = np.union1d(old, new_ids)
    else:
        merged = np.unique(new_ids)
    tmp = f + ".tmp"
    pq.write_table(pa.table({"id": merged}), tmp)
    os.replace(tmp, f)
    part = os.path.join(path, f"part-{cid}.parquet")
    file_ids = pq.read_table(part, columns=["id"]).column("id").to_numpy()
    return int(np.isin(file_ids, merged).sum())


def tombstone_index(path: str, sel_rows, prune_partition=None,
                    limit: int | None = None, id_col: str = "id") -> dict:
    """Remove elements from a BUILT index without rewriting data files.

    ``sel_rows(batch) -> bool mask`` picks victims (should_unpack_leaf);
    ``prune_partition(lo, up) -> bool mask`` prunes partitions against
    the manifest so pruned files are never read (should_unpack_parent).
    ``limit=None`` drains ALL matches (drain_* semantics,
    rtree.rs:399-410); ``limit=n`` removes the n smallest matching ids
    (the deterministic pick rule shared with ops.remove_*).

    Returns the updated manifest. Queries served through this module
    and geograft.state see the removal immediately; compact_index()
    or ingest_delta() later fold the tombstones into the data files.
    """
    import ray
    import ray.data as rd

    man = load_manifest(path)
    dels = load_tombstones(path, man)
    files, plo, pup = [], [], []
    for cid, p in man["partitions"].items():
        if live_rows(p) > 0:
            files.append(os.path.join(path, p["file"]))
            if "lo" in p:  # n-d manifest (per-axis envelope lists)
                plo.append(list(p["lo"]))
                pup.append(list(p["hi"]))
            else:
                plo.append([p["minx"], p["miny"]])
                pup.append([p["maxx"], p["maxy"]])
    if prune_partition is not None and files:
        mask = np.asarray(prune_partition(np.asarray(plo), np.asarray(pup)),
                          dtype=bool)
        files = [f for f, m in zip(files, mask) if m]
    if not files:
        return man
    ds = filter_tombstones(rd.read_parquet(files), dels, id_col)

    def matches(b: pa.Table) -> pa.Table:
        m = np.asarray(sel_rows(b), dtype=bool)
        return pa.table({"cell_id": b.column("cell_id").to_numpy()[m],
                         id_col: b.column(id_col).to_numpy()[m]})

    cand = ds.map_batches(matches, batch_format="pyarrow", batch_size=None)

    if limit is not None:
        # tiny global top-n of matching ids: per-block partial + driver merge
        def partial(b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy()
            cells = b.column("cell_id").to_numpy()
            if len(ids) > limit:
                sel = np.argpartition(ids, limit - 1)[:limit]
                ids, cells = ids[sel], cells[sel]
            return pa.table({"cell_id": cells, id_col: ids})

        blocks = [t for t in ray.get(ops.arrow_refs(
            cand.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)))
            if t.num_rows > 0]
        if not blocks:
            return man
        t = pa.concat_tables(blocks)
        ids = t.column(id_col).to_numpy()
        cells = t.column("cell_id").to_numpy()
        sel = np.argsort(ids, kind="stable")[:limit]
        for cid_v, grp in pd.DataFrame(
                {"cell_id": cells[sel], id_col: ids[sel]}).groupby("cell_id"):
            total = _write_cell_dels(path, int(cid_v),
                                     grp[id_col].to_numpy())
            man["partitions"][str(int(cid_v))]["deleted"] = total
    else:
        # drain-all: distributed del writes, one task per coarse bucket
        from . import ops as _ops

        def del_bucket(group: pa.Table) -> pd.DataFrame:
            if len(group) == 0 or "cell_id" not in group.column_names:
                return pd.DataFrame({"cell_id": pd.Series([], dtype=np.int64),
                                     "deleted": pd.Series([], dtype=np.int64)})
            if "__cg" in group.column_names:
                group = group.drop_columns(["__cg"])
            cells = group.column("cell_id").to_numpy()
            ids = group.column(id_col).to_numpy()
            order = np.argsort(cells, kind="stable")
            cs = cells[order]
            bnd = np.concatenate(
                [[0], np.nonzero(cs[1:] != cs[:-1])[0] + 1, [len(cs)]])
            out = []
            for gi in range(len(bnd) - 1):
                cid = int(cs[bnd[gi]])
                total = _write_cell_dels(
                    path, cid, ids[order[bnd[gi]:bnd[gi + 1]]])
                out.append({"cell_id": cid, "deleted": total})
            return pd.DataFrame(out)

        stats = _ops.coarse_group_by_cell(cand, del_bucket).to_pandas()
        for r in stats.itertuples():
            man["partitions"][str(int(r.cell_id))]["deleted"] = int(r.deleted)

    man["deleted_rows"] = sum(p.get("deleted", 0)
                              for p in man["partitions"].values())
    man["live_rows"] = man["total_rows"] - man["deleted_rows"]
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, os.path.join(path, MANIFEST))
    return man


def remove_index_at_point(path: str, x: float, y: float) -> dict:
    """remove_at_point against the persisted index (rtree.rs:864-867):
    tombstone the smallest-id element containing the point."""
    from . import kernels as K

    q = np.array([x, y])

    def sel(b: pa.Table) -> np.ndarray:
        lo = np.c_[b.column("minx").to_numpy(), b.column("miny").to_numpy()]
        up = np.c_[b.column("maxx").to_numpy(), b.column("maxy").to_numpy()]
        return K.env_contains_point(lo, up, q)

    def prune(lo: np.ndarray, up: np.ndarray) -> np.ndarray:
        return ((lo[:, 0] <= x) & (up[:, 0] >= x)
                & (lo[:, 1] <= y) & (up[:, 1] >= y))

    return tombstone_index(path, sel, prune_partition=prune, limit=1)


def drain_index_in_envelope(path: str, qminx, qminy, qmaxx, qmaxy,
                            intersecting: bool = False) -> dict:
    """drain_in_envelope against the persisted index (rtree.rs:399-410):
    tombstone EVERY element selected by the envelope predicate; pruned
    partitions are never read."""
    from . import kernels as K

    qlo = np.array([qminx, qminy])
    qhi = np.array([qmaxx, qmaxy])

    def sel(b: pa.Table) -> np.ndarray:
        lo = np.c_[b.column("minx").to_numpy(), b.column("miny").to_numpy()]
        up = np.c_[b.column("maxx").to_numpy(), b.column("maxy").to_numpy()]
        if intersecting:
            return K.env_intersects(lo, up, qlo, qhi)
        return K.env_contains_env(qlo[None], qhi[None], lo, up)

    def prune(lo: np.ndarray, up: np.ndarray) -> np.ndarray:
        return ((lo[:, 0] <= qmaxx) & (up[:, 0] >= qminx)
                & (lo[:, 1] <= qmaxy) & (up[:, 1] >= qminy))

    return tombstone_index(path, sel, prune_partition=prune)


def compact_index(path: str, id_col: str = "id") -> dict:
    """Fold pending tombstones into the data files: rewrite each touched
    partition without its dead rows (atomic), recompute its envelope,
    drop emptied partitions entirely (the reference drops emptied nodes,
    removal.rs:137-139), clear the del files, update the manifest.
    One Ray task per group of touched cells — the rewrite is
    distributed, the driver only touches the manifest. Dimension-
    generic: a manifest with ``axes`` (n-d point index) recomputes the
    per-axis lo/hi envelope instead of minx..maxy."""
    import ray.data as rd

    man = load_manifest(path)
    axes = man.get("axes")  # None for the 2-d envelope index
    touched = [int(c) for c, p in man["partitions"].items()
               if p.get("deleted", 0) > 0]
    if not touched:
        return man

    def compact_cells(b: pa.Table) -> pa.Table:
        out = []
        for cid in b.column("cell_id").to_pylist():
            cid = int(cid)
            fname = os.path.join(path, f"part-{cid}.parquet")
            dfile = os.path.join(path, _del_name(cid))
            dl = pq.read_table(dfile).column("id").to_numpy()
            t = pq.read_table(fname)
            keep = ~np.isin(t.column(id_col).to_numpy(), dl)
            t2 = t.filter(pa.array(keep))
            if len(t2) == 0:
                os.remove(fname)
                rec = {"cell_id": cid, "rows": 0, "bytes": 0,
                       "env": json.dumps([])}
            else:
                tmp = fname + ".tmp"
                pq.write_table(t2, tmp)
                os.replace(tmp, fname)
                if axes is not None:
                    cols = [t2.column(c).to_numpy() for c in axes]
                    env = [[float(v.min()) for v in cols],
                           [float(v.max()) for v in cols]]
                else:
                    env = [
                        [float(t2.column("minx").to_numpy().min()),
                         float(t2.column("miny").to_numpy().min())],
                        [float(t2.column("maxx").to_numpy().max()),
                         float(t2.column("maxy").to_numpy().max())],
                    ]
                rec = {"cell_id": cid, "rows": len(t2),
                       "bytes": os.path.getsize(fname),
                       "env": json.dumps(env)}
            os.remove(dfile)
            out.append(rec)
        return pa.Table.from_pylist(out)

    stats = (rd.from_items([{"cell_id": c} for c in touched])
             .map_batches(compact_cells, batch_format="pyarrow").to_pandas())
    for r in stats.itertuples():
        key = str(int(r.cell_id))
        if int(r.rows) == 0:
            del man["partitions"][key]
            continue
        env = json.loads(r.env)
        rec = {
            "file": f"part-{int(r.cell_id)}.parquet",
            "rows": int(r.rows), "bytes": int(r.bytes),
            "wall_ms": man["partitions"][key].get("wall_ms", 0.0),
        }
        if axes is not None:
            rec["lo"], rec["hi"] = env[0], env[1]
        else:
            rec["minx"], rec["miny"] = env[0]
            rec["maxx"], rec["maxy"] = env[1]
        man["partitions"][key] = rec
    man["total_rows"] = sum(p["rows"] for p in man["partitions"].values())
    man["deleted_rows"] = 0
    man["live_rows"] = man["total_rows"]
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, os.path.join(path, MANIFEST))
    return man


def _insert_rstar(old: pa.Table | None, new: pa.Table) -> pa.Table:
    """Default strategy: old + new rows, partition rebuilt at read time
    (the distributed equivalence class of R* insert — the contract is
    SET equality with a from-scratch bulk build, rtree.rs:905-909
    explicitly allows duplicates)."""
    if old is None:
        return new
    return pa.concat_tables([old, new.select(old.column_names)])


# the InsertionStrategy trait surface (params.rs:82-88,
# algorithm/rstar.rs:20): HOW delta rows merge into a touched
# partition is pluggable. A strategy is {"merge": (old_table | None,
# new_table) -> merged_table, "replace_by_id": bool}; merge runs
# per-partition with the old and new rows of that cell co-located.
# replace_by_id=True additionally tombstones every EXISTING row whose
# id appears in the delta BEFORE the merge — the cross-partition half
# of upsert (a moved geometry routes to a new cell, so its old copy
# must die in its OLD cell; that pass reads the id column of every
# live partition, the honest cost of upsert without an id->cell
# index). Built-ins: 'rstar' (duplicates allowed, rtree.rs:905-909)
# and 'upsert' (remove-then-insert fused, removal.rs:257-302 + insert
# as one ingest).
INSERTION_STRATEGIES: dict[str, dict] = {
    "rstar": {"merge": _insert_rstar, "replace_by_id": False},
    "upsert": {"merge": _insert_rstar, "replace_by_id": True},
}


def register_insertion_strategy(name: str, merge_fn,
                                replace_by_id: bool = False) -> None:
    """Register a custom insertion strategy (InsertionStrategy trait
    analogue — rstar ships exactly one impl, RStarInsertionStrategy;
    this is the extension point user code plugs into)."""
    if name in ("rstar", "upsert"):
        raise ValueError(f"'{name}' is a built-in strategy")
    INSERTION_STRATEGIES[name] = {"merge": merge_fn,
                                  "replace_by_id": bool(replace_by_id)}


def ingest_delta(path: str, delta_ds, strategy: str = "rstar") -> dict:
    """Incremental insert (rstar R* insert, SURVEY.md §2.1): route delta
    rows to their cells, REBUILD only the touched partitions (merge old
    + new rows via the named insertion STRATEGY, rewrite file), update
    the manifest. The tested contract is bulk-vs-incremental
    equivalence: query answers equal a from-scratch bulk build over the
    strategy-applied union (bulk_load_sequential.rs:111-151
    re-expressed)."""
    import ray

    try:
        spec = INSERTION_STRATEGIES[strategy]
    except KeyError:
        raise ValueError(
            f"unknown insertion strategy {strategy!r}; registered: "
            f"{sorted(INSERTION_STRATEGIES)} (add more via "
            "register_insertion_strategy)") from None
    merge_rows = spec["merge"]
    if spec.get("replace_by_id"):
        # materialize ONCE: the ids-only gather below and the cell
        # routing afterwards both consume the delta — on a lazy
        # dataset each would re-execute the whole upstream chain (the
        # arrow_refs double-execution pattern)
        delta_ds = delta_ds.materialize()
        # cross-partition replace: tombstone the delta's ids wherever
        # they currently live (ids-only driver gather — 8 B/row; split
        # the ingest if a delta's id set exceeds driver memory)
        id_blocks = ray.get(ops.arrow_refs(delta_ds.select_columns(["id"])))
        del_ids = np.unique(np.concatenate(
            [b.column("id").to_numpy() for b in id_blocks]
        )) if id_blocks else np.empty(0, dtype=np.int64)
        if len(del_ids):
            ids_ref = ray.put(del_ids)

            def _sel(b: pa.Table) -> np.ndarray:
                return np.isin(b.column("id").to_numpy(), ray.get(ids_ref))

            tombstone_index(path, _sel)
    man = load_manifest(path)
    base_level = man["base_level"]
    bounds = G.Bounds(*man["bounds"])
    hot_map = {int(k): v for k, v in man["hot_map"].items()}
    # pending tombstones of TOUCHED cells are folded into the rewrite
    # (compaction rides the delta merge); untouched cells keep theirs
    dels = load_tombstones(path, man)

    keyed = delta_ds.map_batches(
        lambda b: assign_adaptive_cells(b, base_level, hot_map, bounds),
        batch_format="pyarrow",
        batch_size=None,
    )

    def merge_bucket(group: pa.Table) -> pd.DataFrame:
        """Merge every touched cell co-located in this coarse bucket —
        one Python call per BUCKET, cells sub-grouped vectorized (the
        per-key map_groups trap costs one Ray round-trip per cell)."""
        if len(group) == 0 or "cell_id" not in group.column_names:
            return pd.DataFrame(
                {c: pd.Series([], dtype=d) for c, d in
                 [("cell_id", np.int64), ("rows", np.int64), ("bytes", np.int64),
                  ("wall_ms", float), ("minx", float), ("miny", float),
                  ("maxx", float), ("maxy", float)]}
            )
        if "__cg" in group.column_names:
            group = group.drop_columns(["__cg"])
        cells = group.column("cell_id").to_numpy()
        order = np.argsort(cells, kind="stable")
        cs = cells[order]
        bnd = np.concatenate([[0], np.nonzero(cs[1:] != cs[:-1])[0] + 1, [len(cs)]])
        out: list[dict] = []
        for gi in range(len(bnd) - 1):
            rows_idx = order[bnd[gi] : bnd[gi + 1]]
            cid = int(cs[bnd[gi]])
            t0 = time.perf_counter()
            part = group.take(pa.array(rows_idx))
            fname = os.path.join(path, f"part-{cid}.parquet")
            if os.path.exists(fname):
                old = pq.read_table(fname)
                dl = dels.get(cid)
                if dl is not None:
                    old = old.filter(
                        pa.array(~np.isin(old.column("id").to_numpy(), dl)))
                part = merge_rows(old, part)
            else:
                part = merge_rows(None, part)
            dfile = os.path.join(path, _del_name(cid))
            if len(part) == 0:
                # a custom strategy may reject every row of a cell:
                # drop the partition (file + tombstones) instead of
                # publishing a 0-row file; the driver removes the
                # manifest entry for rows == 0
                if os.path.exists(fname):
                    os.remove(fname)
                if os.path.exists(dfile):
                    os.remove(dfile)
                out.append({"cell_id": cid, "rows": 0, "bytes": 0,
                            "wall_ms": 0.0, "minx": 0.0, "miny": 0.0,
                            "maxx": 0.0, "maxy": 0.0})
                continue
            tmp = fname + ".tmp"
            pq.write_table(part, tmp)
            os.replace(tmp, fname)
            if os.path.exists(dfile):
                os.remove(dfile)
            out.append({
                "cell_id": cid, "rows": len(part),
                "bytes": os.path.getsize(fname),
                "wall_ms": round((time.perf_counter() - t0) * 1e3, 2),
                "minx": part.column("minx").to_numpy().min(),
                "miny": part.column("miny").to_numpy().min(),
                "maxx": part.column("maxx").to_numpy().max(),
                "maxy": part.column("maxy").to_numpy().max(),
            })
        return pd.DataFrame(out)

    stats = ops.coarse_group_by_cell(keyed, merge_bucket).to_pandas()
    for r in stats.itertuples():
        if int(r.rows) == 0:  # strategy rejected the whole cell
            man["partitions"].pop(str(int(r.cell_id)), None)
            continue
        man["partitions"][str(int(r.cell_id))] = {
            "file": f"part-{int(r.cell_id)}.parquet",
            "rows": int(r.rows), "bytes": int(r.bytes), "wall_ms": float(r.wall_ms),
            "minx": float(r.minx), "miny": float(r.miny),
            "maxx": float(r.maxx), "maxy": float(r.maxy),
        }
    man["total_rows"] = sum(p["rows"] for p in man["partitions"].values())
    man["deleted_rows"] = sum(p.get("deleted", 0)
                              for p in man["partitions"].values())
    man["live_rows"] = man["total_rows"] - man["deleted_rows"]
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, os.path.join(path, MANIFEST))
    return man
