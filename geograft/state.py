"""Stateful actor-pool query serving over a built index.

The distributed analogue of holding an ``RTree`` in memory and running
many queries against it (the reference's primary usage pattern): an
actor pool (`map_batches(PartitionQuerier, concurrency=N)`) where each
actor lazily loads index partitions (parquet -> packed PTree) and
CACHES them across query batches — setup cost paid once per actor per
partition, not once per query (the 'model loaded once per worker'
rule).

Queries are routed by the planner against the manifest (partition
envelopes = the root level), shuffled on cell_id so each task sees one
partition's queries together, then answered by the cached tree.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .pipeline import _del_name, live_rows, load_manifest
from .ptree import PTree


def _arrow_refs(ds):
    """Single-execution block refs (ops.arrow_refs; import deferred
    to keep this module import-light)."""
    from .ops import arrow_refs

    return arrow_refs(ds)


def _manifest_arrays(man: dict, with_counts: bool = False):
    """(cell_ids, lower, upper[, counts]) of the non-empty partitions —
    the planner's pruning arrays, built once per query batch. Counts are
    LIVE rows (net of tombstones): kNN candidate-availability proofs
    must not count dead rows, and envelopes stay conservative (sound
    for pruning) until compaction."""
    cids, counts, plo, pup = [], [], [], []
    for cid, p in man["partitions"].items():
        if live_rows(p) > 0:
            cids.append(int(cid)); counts.append(live_rows(p))
            plo.append([p["minx"], p["miny"]])
            pup.append([p["maxx"], p["maxy"]])
    out = (np.asarray(cids, dtype=np.int64), np.asarray(plo), np.asarray(pup))
    if with_counts:
        return (*out, np.asarray(counts, dtype=np.int64))
    return out


class PartitionQuerier:
    """Actor: cell_id -> (ids, PTree) cache, built from index files."""

    def __init__(self, index_path: str):
        self.path = index_path
        self.man = load_manifest(index_path)
        self.cache: dict[int, tuple[np.ndarray, PTree]] = {}
        self.loads = 0  # observable cache behaviour for tests/metrics

    def _tree(self, cid: int) -> tuple[np.ndarray, PTree]:
        hit = self.cache.get(cid)
        if hit is None:
            p = self.man["partitions"][str(cid)]
            t = pq.read_table(
                os.path.join(self.path, p["file"]),
                columns=["id", "minx", "miny", "maxx", "maxy"],
            )
            if p.get("deleted", 0):
                # pending tombstones: dead rows never enter the tree
                dl = pq.read_table(
                    os.path.join(self.path, _del_name(cid))).column("id").to_numpy()
                t = t.filter(pa.array(~np.isin(t.column("id").to_numpy(), dl)))
            lo = np.c_[t.column("minx").to_numpy(), t.column("miny").to_numpy()]
            up = np.c_[t.column("maxx").to_numpy(), t.column("maxy").to_numpy()]
            ids = t.column("id").to_numpy()
            # ascending-id order => stable tie resolution downstream
            o = np.argsort(ids, kind="stable")
            hit = (ids[o], PTree(lo[o], up[o]))
            self.cache[cid] = hit
            self.loads += 1
        return hit

    # query modes (routed `mode` column)
    INTERSECTS = 0
    CONTAINED = 1
    AT_POINT = 2       # point in (minx, miny)
    WITHIN_DIST = 3    # point in (minx, miny), r2 in maxx

    _MODE_NAMES = {INTERSECTS: "intersects", CONTAINED: "contained",
                   AT_POINT: "at_point", WITHIN_DIST: "within"}

    def __call__(self, batch: pa.Table) -> pa.Table:
        """batch: routed queries (cell_id, qid, minx, miny, maxx, maxy,
        mode:int8) -> (qid, id) hits from this partition.

        One PTree.locate_batch call per (cell, mode) group — all queries
        of a group traverse the tree together in vectorized frontiers;
        no Python-level per-query loop."""
        cells = batch.column("cell_id").to_numpy()
        qid = batch.column("qid").to_numpy()
        qlo = np.c_[batch.column("minx").to_numpy(), batch.column("miny").to_numpy()]
        qhi = np.c_[batch.column("maxx").to_numpy(), batch.column("maxy").to_numpy()]
        mode = batch.column("mode").to_numpy()
        out_q, out_i = [], []
        for cid in np.unique(cells):
            ids, tree = self._tree(int(cid))
            rows = np.nonzero(cells == cid)[0]
            for mv in np.unique(mode[rows]):
                sub = rows[mode[rows] == mv]
                rq, ridx = tree.locate_batch(
                    qlo[sub], qhi[sub], self._MODE_NAMES[int(mv)],
                    r2=qhi[sub, 0] if mv == self.WITHIN_DIST else None,
                )
                if len(rq):
                    out_q.append(qid[sub][rq])
                    out_i.append(ids[ridx])
        if not out_q:
            return pa.table({"qid": pa.array([], type=pa.int64()),
                             "id": pa.array([], type=pa.int64())})
        return pa.table({"qid": np.concatenate(out_q), "id": np.concatenate(out_i)})


def query_index_batch(index_path: str, boxes: pa.Table, intersecting: bool = True,
                      concurrency: int = 2):
    """Batched envelope queries against a built index via the actor pool.

    Plan: (box x partition-envelope) intersection on the manifest ->
    routed (cell_id, query) rows; rows are stored exactly once (owner
    cell), so hits need no dedup. Sorting the routed table on cell_id
    gives each actor task whole-partition batches (cache locality).
    """
    import ray.data as rd

    man = load_manifest(index_path)
    cids, plo, pup = _manifest_arrays(man)

    qid = boxes.column("box_id").to_numpy()
    qlo = np.c_[boxes.column("minx").to_numpy(), boxes.column("miny").to_numpy()]
    qhi = np.c_[boxes.column("maxx").to_numpy(), boxes.column("maxy").to_numpy()]
    hit = (qlo[:, None, :] <= pup[None, :, :]).all(axis=2) & (
        qhi[:, None, :] >= plo[None, :, :]
    ).all(axis=2)
    qi, pi = np.nonzero(hit)
    mode = (PartitionQuerier.INTERSECTS if intersecting
            else PartitionQuerier.CONTAINED)
    routed = pa.table(
        {
            "cell_id": cids[pi],
            "qid": qid[qi],
            "minx": qlo[qi, 0], "miny": qlo[qi, 1],
            "maxx": qhi[qi, 0], "maxy": qhi[qi, 1],
            "mode": np.full(len(qi), mode, dtype=np.int8),
        }
    )
    return _serve_routed(index_path, routed, concurrency)


def _serve_routed(index_path: str, routed: pa.Table, concurrency: int):
    import ray.data as rd

    ds = rd.from_arrow(routed).sort("cell_id")
    return ds.map_batches(
        PartitionQuerier,
        fn_constructor_args=(index_path,),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )


def query_index_at_point(index_path: str, points: pa.Table, concurrency: int = 2):
    """locate_all_at_point for a batch of points (pid, x, y) against the
    index: route each point to partitions whose envelope contains it."""
    man = load_manifest(index_path)
    cids, plo, pup = _manifest_arrays(man)
    qid = points.column("pid").to_numpy()
    px = points.column("x").to_numpy()
    py = points.column("y").to_numpy()
    hit = (
        (plo[None, :, 0] <= px[:, None]) & (pup[None, :, 0] >= px[:, None])
        & (plo[None, :, 1] <= py[:, None]) & (pup[None, :, 1] >= py[:, None])
    )
    qi, pi = np.nonzero(hit)
    routed = pa.table(
        {
            "cell_id": cids[pi], "qid": qid[qi],
            "minx": px[qi], "miny": py[qi],
            "maxx": px[qi], "maxy": py[qi],
            "mode": np.full(len(qi), PartitionQuerier.AT_POINT, dtype=np.int8),
        }
    )
    return _serve_routed(index_path, routed, concurrency)


def query_index_within_distance(index_path: str, discs: pa.Table,
                                concurrency: int = 2):
    """locate_within_distance for a batch of discs (qid, x, y, r2):
    route to partitions whose envelope is within sqrt(r2) of the point."""
    man = load_manifest(index_path)
    cids, plo, pup = _manifest_arrays(man)
    qid = discs.column("qid").to_numpy()
    px = discs.column("x").to_numpy()
    py = discs.column("y").to_numpy()
    r2 = discs.column("r2").to_numpy()
    dx = np.clip(px[:, None], plo[None, :, 0], pup[None, :, 0]) - px[:, None]
    dy = np.clip(py[:, None], plo[None, :, 1], pup[None, :, 1]) - py[:, None]
    qi, pi = np.nonzero(dx * dx + dy * dy <= r2[:, None])
    routed = pa.table(
        {
            "cell_id": cids[pi], "qid": qid[qi],
            "minx": px[qi], "miny": py[qi],
            "maxx": r2[qi], "maxy": np.zeros(len(qi)),
            "mode": np.full(len(qi), PartitionQuerier.WITHIN_DIST, dtype=np.int8),
        }
    )
    return _serve_routed(index_path, routed, concurrency)


def _plan_knn_seed_refine(qc, plo, pup, counts, k, dk2=None):
    """One chunked, threaded pass over the (query x partition) min-dist
    matrix. ``dk2 is None`` -> SEED routes: per query, partitions in
    ascending min-dist order until their cumulative count reaches k
    (usually just the home cell). ``dk2`` given -> REFINE routes:
    partitions with mind2 <= dk2[q] (inclusive — equal-distance ties in
    other cells must compete on the id tie-break) EXCLUDING the seed
    set, which is recomputed deterministically from the same inputs.

    The seed is found with argpartition over an escalating window (8 ->
    x4 ...) instead of a full per-query argsort of every partition —
    the full sort made planning cost grow with PARTITION COUNT (2.5 s
    per call at 958 partitions x 20k queries; worse at 3k) when only
    the nearest handful matter. Seed membership does not need a global
    tie order: any prefix covering k rows yields a valid exact dk2, and
    both passes recompute the identical selection from identical
    inputs."""
    from concurrent.futures import ThreadPoolExecutor

    d = qc.shape[1]
    m = plo.shape[0]
    if m == 0 or qc.shape[0] == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    kk = min(k, max(int(counts.sum()), 1))
    # float32 planning: the (query x partition) matrix is memory-traffic
    # bound (it dominated planning at 3k partitions); float32 halves it.
    # Seed selection needs no exactness (any cover of k rows yields a
    # valid exact dk2); the refine radius test is made SOUND under f32
    # rounding by widening the radius with an ABSOLUTE margin scaled to
    # coordinate magnitude: err(clip-ca) <= ~eps32*C per axis, so
    # err(d2) <= (sqrt(d2) + d*eps32*C)^2 - d2. A relative margin alone
    # would be unsound when dk2 << C^2. Widening only ever ADMITS extra
    # partitions — the kernel decides with exact f64 distances.
    _C = float(max(np.abs(plo).max(initial=0.0), np.abs(pup).max(initial=0.0),
                   np.abs(qc).max(initial=0.0), 1.0))
    _ERRC = 8.0 * float(np.finfo(np.float32).eps) * _C * d
    plo32 = plo.astype(np.float32)
    pup32 = pup.astype(np.float32)
    qc32 = qc.astype(np.float32)

    def plan_chunk(sl):
        nq = sl.stop - sl.start
        mind2 = np.zeros((nq, m), dtype=np.float32)
        buf = np.empty((nq, m), dtype=np.float32)
        for ax in range(d):
            ca = qc32[sl, ax][:, None]
            np.clip(ca, plo32[None, :, ax], pup32[None, :, ax], out=buf)
            buf -= ca
            buf *= buf
            mind2 += buf
        P = min(8, m)
        while True:
            if P < m:
                part = np.argpartition(mind2, P - 1, axis=1)[:, :P]
            else:
                part = np.argsort(mind2, axis=1, kind="stable")
            sd = np.take_along_axis(mind2, part, axis=1)
            o = np.argsort(sd, axis=1, kind="stable")
            part = np.take_along_axis(part, o, axis=1)
            csum = np.cumsum(counts[part], axis=1)
            if P >= m or bool((csum[:, P - 1] >= kk).all()):
                break
            P = min(P * 4, m)
        first_ge = np.argmax(csum >= kk, axis=1)
        col = np.arange(part.shape[1])[None, :]
        seed_mask = col <= first_ge[:, None]
        if dk2 is None:
            ci, oi = np.nonzero(seed_mask)
            return ci + sl.start, part[ci, oi]
        # refine: full-row radius test minus the seed set (dk2 widened
        # for f32 soundness; exact f64 distances decide in the kernel).
        # Seed slots are masked with NaN, not inf: when dk2 is inf (the
        # query saw fewer than k rows — k >= total live rows), the
        # radius bound is inf and `inf <= inf` would re-admit every
        # seed partition, duplicating its rows in the merged result.
        # NaN fails every comparison, so seeds stay excluded.
        md = mind2
        ri, oi = np.nonzero(seed_mask)
        md[ri, part[ri, oi]] = np.nan
        fin = np.isfinite(dk2[sl])
        root = np.sqrt(np.maximum(dk2[sl], 0.0), where=fin,
                       out=np.full(sl.stop - sl.start, np.inf))
        bound = ((root + _ERRC) ** 2 * (1.0 + 1e-6)).astype(np.float32)
        with np.errstate(invalid="ignore"):
            ci, pi_ = np.nonzero(md <= bound[:, None])
        return ci + sl.start, pi_

    slices = [slice(s, min(s + 2048, qc.shape[0]))
              for s in range(0, qc.shape[0], 2048)]
    with ThreadPoolExecutor(max_workers=8) as pool:
        parts = list(pool.map(plan_chunk, slices))
    if not parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]))


def _kth_dist_per_qid(qid_rows, d2_rows, all_qids, k):
    """Exact per-query kth smallest distance from pass-1 rows (an upper
    bound on the true kth-NN distance); +inf where a query got fewer
    than k rows (undersized / tombstone-thinned seed)."""
    from .ops import _topk_per_qid

    dk2 = np.full(len(all_qids), np.inf)
    if len(qid_rows) == 0:
        return dk2
    keep = _topk_per_qid(qid_rows, np.zeros(len(qid_rows), dtype=np.int64),
                         d2_rows, k)
    kq, kd = qid_rows[keep], d2_rows[keep]  # qid-grouped, d2-ascending
    n = len(kq)
    last = np.nonzero(np.concatenate([kq[1:] != kq[:-1], [True]]))[0]
    first = np.concatenate([[0], last[:-1] + 1])
    got_k = (last - first + 1) >= k
    pos = np.searchsorted(all_qids, kq[last])
    ok = (pos < len(all_qids))
    sel = ok & (all_qids[np.minimum(pos, len(all_qids) - 1)] == kq[last]) & got_k
    dk2[pos[sel]] = kd[last[sel]]
    return dk2


def _cell_knn_2d(batch: pa.Table, rt: dict, k: int) -> pa.Table:
    """Per-file-group kNN kernel: answer every routed query of every
    cell present in ``batch`` (clamped envelope distance — rows may be
    rects), k best per (query, cell), deterministic (d2, id) ties."""
    from .ops import _topk_cols_per_row

    cells = batch.column("cell_id").to_numpy()
    lo0 = batch.column("minx").to_numpy()
    lo1 = batch.column("miny").to_numpy()
    up0 = batch.column("maxx").to_numpy()
    up1 = batch.column("maxy").to_numpy()
    ids = batch.column("id").to_numpy()
    out_q, out_i, out_d = [], [], []
    ordr = np.argsort(cells, kind="stable")
    cs = cells[ordr]
    bnd = np.concatenate([[0], np.nonzero(cs[1:] != cs[:-1])[0] + 1, [len(cs)]])
    for gi in range(len(bnd) - 1):
        rows = ordr[bnd[gi] : bnd[gi + 1]]
        cell = int(cs[bnd[gi]])
        s0 = np.searchsorted(rt["cells"], cell, side="left")
        s1 = np.searchsorted(rt["cells"], cell, side="right")
        if s1 == s0:
            continue
        # ascending-id columns => deterministic (d2, id) ties
        io = np.argsort(ids[rows], kind="stable")
        rows = rows[io]
        gqid = rt["qid"][s0:s1]
        gqx = rt["x"][s0:s1]
        gqy = rt["y"][s0:s1]
        kk = min(k, len(rows))
        for s in range(0, len(gqid), 64):
            sqx = gqx[s : s + 64][:, None]
            sqy = gqy[s : s + 64][:, None]
            ddx = np.clip(sqx, lo0[rows][None, :], up0[rows][None, :]) - sqx
            ddy = np.clip(sqy, lo1[rows][None, :], up1[rows][None, :]) - sqy
            d2 = ddx * ddx + ddy * ddy
            part = _topk_cols_per_row(d2, kk)
            out_q.append(np.repeat(gqid[s : s + 64], kk))
            out_i.append(ids[rows][part].ravel())
            out_d.append(np.take_along_axis(d2, part, axis=1).ravel())
    if not out_q:
        return pa.table({"qid": pa.array([], type=pa.int64()),
                         "id": pa.array([], type=pa.int64()),
                         "dist2": pa.array([], type=pa.float64())})
    return pa.table({"qid": np.concatenate(out_q),
                     "id": np.concatenate(out_i),
                     "dist2": np.concatenate(out_d)})


def _drop_tombstoned(t: pa.Table, dels: dict | None,
                     id_col: str = "id") -> pa.Table:
    """Filter pending-tombstone rows out of concatenated partition rows
    (shared by the 2-d and n-d raw-task kNN paths)."""
    if not dels:
        return t
    cells = t.column("cell_id").to_numpy()
    ids = t.column(id_col).to_numpy()
    keep = np.ones(len(t), dtype=bool)
    for cid in np.unique(cells):
        d = dels.get(int(cid))
        if d is not None:
            m = cells == cid
            keep[m] = ~np.isin(ids[m], d)
    if not keep.all():
        t = t.filter(pa.array(keep))
    return t


def _knn_file_task(paths: list, rt: dict, k: int, dels: dict) -> pa.Table:
    """Ray task: read a group of partition files, drop tombstoned rows,
    run the kNN kernel. One task per file group — no streaming-executor
    round for small indexes."""
    t = pa.concat_tables([
        pq.read_table(p, columns=["id", "cell_id", "minx", "miny",
                                  "maxx", "maxy"]) for p in paths])
    return _cell_knn_2d(_drop_tombstoned(t, dels), rt, k)


# task handle cache (ray.remote() re-exports the function per call)
_KNN_TASK = None
# above this many touched files a pass uses the streaming Dataset path:
# the raw-task path holds one ref per file group on the driver and reads
# without backpressure, which is only safe when everything fits
KNN_DIRECT_MAX_FILES = 2048

# at or above this many live partitions the planners switch from the
# dense (query x partition) matrix to analytic owner-cell + ring
# expansion (ringplan.py): the matrix is faster below (one vectorized
# pass, no per-ring bookkeeping) but its memory/compute grow O(Q*M) —
# ~8 GB per 2048-query chunk at 1M partitions even in f32 — while ring
# planning is bounded by the visited-ring volume per query
ANALYTIC_MIN_PARTS = 4096


def _knn_planner(cids, plo, pup, counts, bounds_lo, bounds_hi, d,
                 planner: str = "auto"):
    """Seed/refine planner pair over the manifest directory: returns
    (seed(qc, k) -> (qi, pi, aux), refine(qc, k, dk2, aux) -> (qi, pi)).
    ``planner``: 'auto' switches on ANALYTIC_MIN_PARTS; 'matrix' /
    'rings' force a side (tests assert both produce identical kNN)."""
    use_rings = (planner == "rings" or
                 (planner == "auto" and len(cids) >= ANALYTIC_MIN_PARTS))
    if use_rings:
        from . import ringplan as RP

        dirx = RP.GridDirectory(cids, counts, plo, pup,
                                np.asarray(bounds_lo), np.asarray(bounds_hi), d)

        def seed(qc, k):
            return RP.plan_seed(dirx, qc, k)

        def refine(qc, k, dk2, aux):
            return RP.plan_refine(dirx, qc, k, dk2, r_stop=aux)

        return seed, refine

    def seed(qc, k):
        qi, pi = _plan_knn_seed_refine(qc, plo, pup, counts, k)
        return qi, pi, None

    def refine(qc, k, dk2, aux):
        return _plan_knn_seed_refine(qc, plo, pup, counts, k, dk2=dk2)

    return seed, refine


def knn_on_index(index_path: str, queries: pa.Table, k: int,
                 planner: str = "auto"):
    """Shuffle-free exact kNN over a BUILT index, in two planned passes:

    1. SEED — each query routes to its nearest partitions until their
       cumulative count reaches k (usually exactly its home cell); the
       pass returns an exact per-query kth distance dk2.
    2. REFINE — only partitions with min-dist <= dk2 (beyond the seed
       prefix) are visited. Most interior queries need none; edge
       queries add a neighbor or two.

    vs the one-pass max-corner bound (ops.indexed_knn's planner) this
    cuts routed (query, partition) pairs ~8x at 256 partitions / k=10 —
    the bound there is the home cell's far corner, which admits every
    neighbor. Partitions are cell-pure, so no exchange is needed in
    either pass; the only data movement is the pruned partition read.
    This is the build-once/query-many fast path.

    ``planner``: 'auto' uses the dense matrix planner below
    ANALYTIC_MIN_PARTS partitions and analytic owner-cell + ring
    expansion (ringplan.py) above; 'matrix'/'rings' force a side."""
    import ray
    import ray.data as rd

    from .ops import _topk_per_qid

    man = load_manifest(index_path)
    cids, plo, pup, counts = _manifest_arrays(man, with_counts=True)
    files = {int(c): os.path.join(index_path, man["partitions"][str(int(c))]["file"])
             for c in cids}
    total = int(counts.sum())

    qid = queries.column("qid").to_numpy()
    qx = queries.column("x").to_numpy()
    qy = queries.column("y").to_numpy()
    qc = np.stack([qx, qy], axis=1)

    from .pipeline import filter_tombstones, load_tombstones
    from .scale import cluster_cpus

    dels = load_tombstones(index_path, man)
    # broadcast once: the tombstone map would otherwise re-pickle into
    # every file-group task (import inside the fn body keeps it lazy)
    import ray as _ray

    dels_ref = _ray.put(dels) if dels else None

    def run_pass(qi, pi) -> list:
        """Execute one routed pass; returns non-empty candidate blocks
        (qid, id, dist2) with k best per (query, visited partition)."""
        if len(qi) == 0:
            return []
        # broadcast: FLAT arrays sorted by cell (zero-copy plasma
        # reads; a dict of many small per-cell arrays would be
        # re-pickled per task)
        r_cells = cids[pi]
        order = np.argsort(r_cells, kind="stable")
        rt = {
            "cells": np.ascontiguousarray(r_cells[order]),
            "qid": np.ascontiguousarray(qid[qi][order]),
            "x": np.ascontiguousarray(qx[qi][order]),
            "y": np.ascontiguousarray(qy[qi][order]),
        }
        touched = sorted(set(np.unique(r_cells).tolist()))
        if not touched:
            return []
        if len(touched) <= KNN_DIRECT_MAX_FILES:
            # raw-task path: one task per file group, no
            # streaming-executor round (its fixed latency is the whole
            # cost at this scale). Routes are broadcast once.
            global _KNN_TASK
            if _KNN_TASK is None:
                _KNN_TASK = ray.remote(_knn_file_task)
            rref = ray.put(rt)
            paths = [files[c] for c in touched]
            ngrp = min(len(paths), 4 * cluster_cpus())
            groups = [paths[i::ngrp] for i in range(ngrp)]
            out = ray.get([_KNN_TASK.remote(g, rref, k, dels_ref)
                           for g in groups if g])
            return [t for t in out if t.num_rows > 0]
        rref = ray.put(rt)
        ds = rd.read_parquet(
            [files[c] for c in touched],
            columns=["id", "cell_id", "minx", "miny", "maxx", "maxy"],
            # bundle small per-cell files into fewer read tasks; the
            # kernel handles multi-cell batches
            override_num_blocks=min(64, len(touched)),
        )
        ds = filter_tombstones(ds, dels)
        cand = ds.map_batches(
            lambda b, r=rref: _cell_knn_2d(b, ray.get(r), k),
            batch_format="pyarrow", batch_size=None)
        return [t for t in ray.get(_arrow_refs(cand)) if t.num_rows > 0]

    import pandas as pd

    b = man["bounds"]
    seed, refine = _knn_planner(cids, plo, pup, counts, b[:2], b[2:], 2,
                                planner=planner)
    # pass 1: seed (nearest partitions covering >= k rows per query)
    qi, pi, aux = seed(qc, k)
    blocks = run_pass(qi, pi)
    # pass 2: refine — only partitions provably able to beat the seed
    # pass's exact kth distance (qids sorted for the searchsorted map)
    qsort = np.argsort(qid, kind="stable")
    if blocks:
        p1 = pa.concat_tables(blocks)
        dk2_sorted = _kth_dist_per_qid(p1.column("qid").to_numpy(),
                                       p1.column("dist2").to_numpy(),
                                       qid[qsort], k)
        dk2 = np.empty_like(dk2_sorted)
        dk2[qsort] = dk2_sorted
    else:
        dk2 = np.full(len(qid), np.inf)
    qi2, pi2 = refine(qc, k, dk2, aux)
    blocks += run_pass(qi2, pi2)
    if not blocks:
        return pd.DataFrame({"qid": [], "id": [], "dist2": []})
    tbl = pa.concat_tables(blocks)
    g_qid = tbl.column("qid").to_numpy()
    g_ids = tbl.column("id").to_numpy()
    g_d2 = tbl.column("dist2").to_numpy()
    keep = _topk_per_qid(g_qid, g_ids, g_d2, k)
    order2 = np.lexsort((g_ids[keep], g_d2[keep], g_qid[keep]))
    keep = keep[order2]
    return pd.DataFrame({"qid": g_qid[keep], "id": g_ids[keep], "dist2": g_d2[keep]})


def knn_index_batch(index_path: str, queries: pa.Table, k: int,
                    concurrency: int = 2):
    """Exact kNN against a built index: manifest-directory planning
    (same bound derivation as ops.indexed_knn), actor-pool per-partition
    tree kNN, global top-k merge."""
    import ray
    import ray.data as rd

    man = load_manifest(index_path)
    cids, counts, plo, pup = [], [], [], []
    for cid, p in man["partitions"].items():
        if live_rows(p) > 0:
            cids.append(int(cid)); counts.append(live_rows(p))
            plo.append([p["minx"], p["miny"]])
            pup.append([p["maxx"], p["maxy"]])
    cids = np.asarray(cids, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    plo = np.asarray(plo); pup = np.asarray(pup)
    total = int(counts.sum())

    qid = queries.column("qid").to_numpy()
    qx = queries.column("x").to_numpy()
    qy = queries.column("y").to_numpy()
    dx = np.clip(qx[:, None], plo[None, :, 0], pup[None, :, 0]) - qx[:, None]
    dy = np.clip(qy[:, None], plo[None, :, 1], pup[None, :, 1]) - qy[:, None]
    mind2 = dx * dx + dy * dy
    fx = np.maximum(np.abs(qx[:, None] - plo[None, :, 0]), np.abs(qx[:, None] - pup[None, :, 0]))
    fy = np.maximum(np.abs(qy[:, None] - plo[None, :, 1]), np.abs(qy[:, None] - pup[None, :, 1]))
    maxd2 = fx * fx + fy * fy
    order = np.argsort(mind2, axis=1, kind="stable")
    csum = np.cumsum(counts[order], axis=1)
    if total <= k:
        ub = np.full(len(qid), np.inf)
    else:
        first_ge = np.argmax(csum >= min(k, total), axis=1)
        prefix_max = np.maximum.accumulate(np.take_along_axis(maxd2, order, axis=1), axis=1)
        ub = prefix_max[np.arange(len(qid)), first_ge]
    qi, pi = np.nonzero(mind2 <= ub[:, None])

    routed = pa.table(
        {
            "cell_id": cids[pi],
            "qid": qid[qi],
            "x": qx[qi],
            "y": qy[qi],
        }
    )

    class KnnQuerier(PartitionQuerier):
        """Per cell: ONE vectorized (points x queries) distance matrix +
        per-query partial top-k — queries hitting the same partition are
        answered together, never one tree walk per query."""

        def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
            from .ops import _topk_cols_per_row

            cells = batch.column("cell_id").to_numpy()
            bqid = batch.column("qid").to_numpy()
            bx = batch.column("x").to_numpy()
            by = batch.column("y").to_numpy()
            out_q, out_i, out_d = [], [], []
            for cid in np.unique(cells):
                ids, tree = self._tree(int(cid))  # id-sorted by _tree
                rows = np.nonzero(cells == cid)[0]
                kk = min(k, len(ids))
                # row-major query chunks: bounded allocation, contiguous
                # argpartition axis, deterministic (d2, id) ties
                for s in range(0, len(rows), 64):
                    rs = rows[s : s + 64]
                    qx = bx[rs][:, None]
                    qy = by[rs][:, None]
                    dx = np.clip(qx, tree.lower[None, :, 0], tree.upper[None, :, 0]) - qx
                    dy = np.clip(qy, tree.lower[None, :, 1], tree.upper[None, :, 1]) - qy
                    d2 = dx * dx + dy * dy
                    part = _topk_cols_per_row(d2, kk)
                    out_q.append(np.repeat(bqid[rs], kk))
                    out_i.append(ids[part].ravel())
                    out_d.append(np.take_along_axis(d2, part, axis=1).ravel())
            if not out_q:
                return pa.table({"qid": pa.array([], type=pa.int64()),
                                 "id": pa.array([], type=pa.int64()),
                                 "dist2": pa.array([], type=pa.float64())})
            return pa.table({"qid": np.concatenate(out_q),
                             "id": np.concatenate(out_i),
                             "dist2": np.concatenate(out_d)})

    ds = rd.from_arrow(routed).sort("cell_id")
    cand = ds.map_batches(
        KnnQuerier,
        fn_constructor_args=(index_path,),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )
    from .ops import _topk_per_qid

    blocks = [t for t in ray.get(_arrow_refs(cand)) if t.num_rows > 0]
    if not blocks:
        return pd.DataFrame({"qid": [], "id": [], "dist2": []})
    tbl = pa.concat_tables(blocks)
    g_qid = tbl.column("qid").to_numpy()
    g_ids = tbl.column("id").to_numpy()
    g_d2 = tbl.column("dist2").to_numpy()
    keep = _topk_per_qid(g_qid, g_ids, g_d2, k)
    order2 = np.lexsort((g_ids[keep], g_d2[keep], g_qid[keep]))
    keep = keep[order2]
    return pd.DataFrame({"qid": g_qid[keep], "id": g_ids[keep], "dist2": g_d2[keep]})

def _cell_knn_nd(batch: pa.Table, rt: dict, k: int, axes: list,
                 id_col: str) -> pa.Table:
    """Dimension-generic per-file-group kNN kernel (true point
    distances over the manifest axes)."""
    from .ops import _topk_cols_per_row

    d = len(axes)
    cells = batch.column("cell_id").to_numpy()
    pts = np.stack([batch.column(c).to_numpy().astype(np.float64)
                    for c in axes], axis=1)
    ids = batch.column(id_col).to_numpy()
    out_q, out_i, out_d = [], [], []
    ordr = np.argsort(cells, kind="stable")
    cs = cells[ordr]
    bnd = np.concatenate([[0], np.nonzero(cs[1:] != cs[:-1])[0] + 1, [len(cs)]])
    for gi in range(len(bnd) - 1):
        rows = ordr[bnd[gi] : bnd[gi + 1]]
        cell = int(cs[bnd[gi]])
        s0 = np.searchsorted(rt["cells"], cell, side="left")
        s1 = np.searchsorted(rt["cells"], cell, side="right")
        if s1 == s0:
            continue
        # ascending-id rows => deterministic (d2, id) ties
        io = np.argsort(ids[rows], kind="stable")
        rows = rows[io]
        gids = ids[rows]
        gpts = pts[rows]
        gqid = rt["qid"][s0:s1]
        gqc = rt["qc"][s0:s1]
        kk = min(k, len(rows))
        for s in range(0, len(gqid), 64):
            sq = gqc[s : s + 64]
            d2 = np.zeros((len(sq), len(rows)))
            for ax in range(d):
                da = sq[:, ax][:, None] - gpts[:, ax][None, :]
                d2 += da * da
            part = _topk_cols_per_row(d2, kk)
            out_q.append(np.repeat(gqid[s : s + 64], kk))
            out_i.append(gids[part].ravel())
            out_d.append(np.take_along_axis(d2, part, axis=1).ravel())
    if not out_q:
        return pa.table({"qid": pa.array([], type=pa.int64()),
                         id_col: pa.array([], type=pa.int64()),
                         "dist2": pa.array([], type=pa.float64())})
    return pa.table({"qid": np.concatenate(out_q),
                     id_col: np.concatenate(out_i),
                     "dist2": np.concatenate(out_d)})


def _knn_file_task_nd(paths: list, rt: dict, k: int, axes: list,
                      id_col: str, dels: dict | None = None) -> pa.Table:
    """Ray task: read a file group of the n-d index, drop tombstoned
    rows, run the kernel."""
    t = pa.concat_tables([
        pq.read_table(p, columns=[id_col, "cell_id", *axes]) for p in paths])
    return _cell_knn_nd(_drop_tombstoned(t, dels, id_col), rt, k, axes, id_col)


_KNN_TASK_ND = None


def knn_on_index_nd(index_path: str, queries: pa.Table, k: int,
                    id_col: str = "id", planner: str = "auto"):
    """Shuffle-free exact kNN against a BUILT n-d index (the
    dimension-generic twin of knn_on_index; nearest-neighbour search is
    dimension-generic in the reference, rstar/src/algorithm/nearest_neighbor.rs
    over Point<d>): plan candidate partitions from the manifest's
    per-axis lo/hi envelopes with the same proven min/max distance
    bounds, read only candidate cell files, answer routed queries with
    chunked (queries x points) distance sums per axis, merge top-k on
    the driver. Query table: qid + one column per manifest axis."""
    import ray
    import ray.data as rd

    from .ops import _topk_cols_per_row, _topk_per_qid

    from .pipeline import filter_tombstones, live_rows, load_tombstones

    man = load_manifest(index_path)
    axes = man["axes"]
    d = len(axes)
    # live counts (net of tombstones): candidate-availability proofs
    # must not count dead rows — same contract as _manifest_arrays
    cids, counts, plo, pup = [], [], [], []
    for cid, p in man["partitions"].items():
        if live_rows(p) > 0:
            cids.append(int(cid)); counts.append(live_rows(p))
            plo.append(p["lo"]); pup.append(p["hi"])
    cids = np.asarray(cids, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    plo = np.asarray(plo, dtype=np.float64).reshape(len(cids), d)
    pup = np.asarray(pup, dtype=np.float64).reshape(len(cids), d)
    total = int(counts.sum())
    files = {int(c): os.path.join(index_path, man["partitions"][str(int(c))]["file"])
             for c in cids}

    qid = queries.column("qid").to_numpy()
    qc = np.stack([queries.column(c).to_numpy().astype(np.float64) for c in axes],
                  axis=1)

    dels = load_tombstones(index_path, man)
    dels_ref = ray.put(dels) if dels else None

    def run_pass(qi, pi) -> list:
        if len(qi) == 0:
            return []
        r_cells = cids[pi]
        order = np.argsort(r_cells, kind="stable")
        rt = {
            "cells": np.ascontiguousarray(r_cells[order]),
            "qid": np.ascontiguousarray(qid[qi][order]),
            "qc": np.ascontiguousarray(qc[qi][order]),
        }
        touched = sorted(set(np.unique(r_cells).tolist()))
        if not touched:
            return []
        rref = ray.put(rt)
        if len(touched) <= KNN_DIRECT_MAX_FILES:
            # raw-task path, one task per file group (see knn_on_index)
            global _KNN_TASK_ND
            if _KNN_TASK_ND is None:
                _KNN_TASK_ND = ray.remote(_knn_file_task_nd)
            from .scale import cluster_cpus

            paths = [files[c] for c in touched]
            ngrp = min(len(paths), 4 * cluster_cpus())
            groups = [paths[i::ngrp] for i in range(ngrp)]
            out = ray.get([_KNN_TASK_ND.remote(g, rref, k, axes, id_col,
                                               dels_ref)
                           for g in groups if g])
            return [t for t in out if t.num_rows > 0]
        ds = rd.read_parquet(
            [files[c] for c in touched],
            columns=[id_col, "cell_id", *axes],
            override_num_blocks=min(64, len(touched)),
        )
        ds = filter_tombstones(ds, dels, id_col)
        cand = ds.map_batches(
            lambda b, r=rref: _cell_knn_nd(b, ray.get(r), k, axes, id_col),
            batch_format="pyarrow", batch_size=None)
        return [t for t in ray.get(_arrow_refs(cand)) if t.num_rows > 0]

    # seed + refine, same two-pass protocol as the 2-d knn_on_index
    # (both planners are dimension-generic over qc's axes)
    b = man["bounds"]
    seed, refine = _knn_planner(cids, plo, pup, counts, b[0], b[1], d,
                                planner=planner)
    qi, pi, aux = seed(qc, k)
    blocks = run_pass(qi, pi)
    qsort = np.argsort(qid, kind="stable")
    if blocks:
        p1 = pa.concat_tables(blocks)
        dk2_sorted = _kth_dist_per_qid(p1.column("qid").to_numpy(),
                                       p1.column("dist2").to_numpy(),
                                       qid[qsort], k)
        dk2 = np.empty_like(dk2_sorted)
        dk2[qsort] = dk2_sorted
    else:
        dk2 = np.full(len(qid), np.inf)
    qi2, pi2 = refine(qc, k, dk2, aux)
    blocks += run_pass(qi2, pi2)
    if not blocks:
        return pd.DataFrame({"qid": [], id_col: [], "dist2": []})
    tbl = pa.concat_tables(blocks)
    g_qid = tbl.column("qid").to_numpy()
    g_ids = tbl.column(id_col).to_numpy()
    g_d2 = tbl.column("dist2").to_numpy()
    keep = _topk_per_qid(g_qid, g_ids, g_d2, k)
    order2 = np.lexsort((g_ids[keep], g_d2[keep], g_qid[keep]))
    keep = keep[order2]
    return pd.DataFrame({"qid": g_qid[keep], id_col: g_ids[keep],
                         "dist2": g_d2[keep]})
