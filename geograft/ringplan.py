"""Analytic owner-cell + ring-expansion kNN planning.

The matrix planners (ops.indexed_knn's plan_chunk, state's
_plan_knn_seed_refine) materialize a dense (query x partition)
min-distance matrix — fine through ~10k partitions, O(Q*M) memory and
compute past that (~8 GB per 2048-query chunk at 1M partitions even in
f32).  This module replaces the scan with arithmetic grid-neighbor
enumeration: each query seeds at its OWNER cell and expands Chebyshev
RINGS outward, consulting the cell directory only for the enumerated
cells — the partition-granularity analogue of the reference's pruned
best-first descent (rstar/src/algorithm/nearest_neighbor.rs:232-295),
where the heap pops envelopes in min-dist order and never touches
subtrees the current kth distance prunes.  Planning cost is bounded by
the VISITED ring volume per query, independent of the total partition
count.

Geometry of the bound: for a query q and a cell at Chebyshev index
distance r from q's owner cell, at least r-1 full cells separate them
along the offset-r axis, so min_dist(q, cell) >= (r-1) * w_min (w_min =
smallest per-axis cell width at the directory's coarsest level).  A
query outside the grid only ever gets FARTHER than its clipped
projection, so the bound holds there too.  Rings are therefore
enumerated in nondecreasing lower-bound order and expansion stops as
soon as ((r-1)*w_min)^2 exceeds the query's radius.

Mixed-level directories (skew-split children coexist with base cells,
grid.py packing) are handled by keying every partition under its
ANCESTOR cell at the coarsest level present: ring enumeration happens
on that uniform coarse grid, and each enumerated coarse cell expands to
its member partitions (1 for an unsplit cell, a handful for a split
one).  The coarse cell envelope contains every member's envelope, so
coarse-ring lower bounds stay sound; members are then filtered by their
own tight envelopes.

Degenerate inputs (a query in a vast empty region, a radius spanning
most of the grid) would make ring enumeration quadratic in the ring
count, so any query whose walk exceeds FALLBACK_RINGS falls back to a
dense distance row against all partitions — for THAT query only; the
common case never allocates anything proportional to M.
"""

from __future__ import annotations

import numpy as np

from . import grid as G

# a query whose ring walk exceeds this many rings is answered with a
# dense per-partition row instead (O(M) for that query only): beyond
# this point enumeration cost (~(2r)^d cells) rivals the dense scan
FALLBACK_RINGS = 64

_OFFSETS_CACHE: dict[tuple[int, int], np.ndarray] = {}


def ring_offsets(d: int, r: int) -> np.ndarray:
    """(m, d) integer offsets with Chebyshev norm exactly r, each cell
    exactly once.  Generated face-by-face (axis ax pinned to +-r, axes
    before it restricted to |.| < r, axes after it free) so the cost is
    the SHELL size, never the (2r+1)^d box."""
    hit = _OFFSETS_CACHE.get((d, r))
    if hit is not None:
        return hit
    if r == 0:
        out = np.zeros((1, d), dtype=np.int64)
    else:
        faces = []
        for ax in range(d):
            lo = np.empty(d, dtype=np.int64)
            hi = np.empty(d, dtype=np.int64)
            lo[:ax], hi[:ax] = -(r - 1), r - 1
            lo[ax + 1:], hi[ax + 1:] = -r, r
            for sign in (-r, r):
                lo[ax] = hi[ax] = sign
                _, cells = G.enumerate_cell_ranges_nd(lo[None, :], hi[None, :])
                faces.append(cells)
        out = np.concatenate(faces)
    _OFFSETS_CACHE[(d, r)] = out
    return out


class GridDirectory:
    """Occupancy directory for ring planning: partitions keyed by their
    ancestor cell at the coarsest level present, with sorted-key lookup
    and tight per-partition envelopes for the final filter."""

    def __init__(self, cell_ids: np.ndarray, counts: np.ndarray,
                 lo: np.ndarray, up: np.ndarray,
                 blo: np.ndarray, bhi: np.ndarray, d: int):
        self.d = d
        self.counts = np.asarray(counts, dtype=np.int64)
        self.lo = np.asarray(lo, dtype=np.float64).reshape(-1, d)
        self.up = np.asarray(up, dtype=np.float64).reshape(-1, d)
        self.blo = np.asarray(blo, dtype=np.float64)
        self.bhi = np.asarray(bhi, dtype=np.float64)
        cell_ids = np.asarray(cell_ids, dtype=np.int64)
        if d == 2:
            cx, cy, lvl = G.unpack(cell_ids)
            coords = np.stack([cx, cy], axis=1)
        else:
            coords, lvl = G.unpack_nd(cell_ids, d)
        self.L0 = int(lvl.min()) if len(lvl) else 0
        self.n0 = 1 << self.L0
        self.anc = coords >> (lvl - self.L0)[:, None]
        self.w = (self.bhi - self.blo) / self.n0
        self.w_min = float(self.w.min()) if len(self.w) else 1.0
        # linearized coarse keys, sorted, with member-group offsets
        keys = self.anc[:, 0].astype(np.int64)
        for ax in range(1, d):
            keys = keys * self.n0 + self.anc[:, ax]
        self.order = np.argsort(keys, kind="stable")
        skeys = keys[self.order]
        if len(skeys):
            b = np.concatenate([[True], skeys[1:] != skeys[:-1]])
            self.ukeys = skeys[b]
            starts = np.nonzero(b)[0]
            self.ustarts = np.concatenate([starts, [len(skeys)]])
            self.amin = self.anc.min(axis=0)
            self.amax = self.anc.max(axis=0)
        else:
            self.ukeys = np.empty(0, dtype=np.int64)
            self.ustarts = np.zeros(1, dtype=np.int64)
            self.amin = np.zeros(d, dtype=np.int64)
            self.amax = np.zeros(d, dtype=np.int64)

    def owners(self, qc: np.ndarray) -> np.ndarray:
        c = np.floor((qc - self.blo) / self.w).astype(np.int64)
        return np.clip(c, 0, self.n0 - 1)

    def max_ring(self, owner: np.ndarray) -> np.ndarray:
        """Largest ring that can contain ANY occupied cell per owner —
        Chebyshev distance to the occupied coord bounding box (rings
        past it are provably empty, so every walk terminates there)."""
        return np.maximum(owner - self.amin, self.amax - owner) \
            .clip(min=0).max(axis=1)

    def members(self, qrows: np.ndarray, cells: np.ndarray):
        """(query row, coarse cell coords) -> (member query rows,
        member partition indices), vectorized sorted-key lookup."""
        if len(qrows) == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z
        keys = cells[:, 0].astype(np.int64)
        for ax in range(1, self.d):
            keys = keys * self.n0 + cells[:, ax]
        pos = np.searchsorted(self.ukeys, keys)
        hit = pos < len(self.ukeys)
        hit[hit] = self.ukeys[pos[hit]] == keys[hit]
        s = self.ustarts[pos[hit]]
        e = self.ustarts[pos[hit] + 1]
        mc = e - s
        total = int(mc.sum())
        memq = np.repeat(qrows[hit], mc)
        base = np.repeat(s, mc)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(mc) - mc, mc)
        return memq, self.order[base + offs]

    def ring_members(self, qidx: np.ndarray, owner: np.ndarray, r: int):
        """All (query, partition) members of ring ``r`` around each
        query's owner cell; out-of-grid cells dropped before lookup."""
        offs = ring_offsets(self.d, r)
        cells = owner[qidx][:, None, :] + offs[None, :, :]
        valid = ((cells >= 0) & (cells < self.n0)).all(axis=2)
        qrows = np.repeat(qidx, offs.shape[0])[valid.ravel()]
        return self.members(qrows, cells[valid])

    def cheb_to_owner(self, owner_q: np.ndarray) -> np.ndarray:
        """Chebyshev index distance from ONE owner coord to every
        partition's ancestor cell — the dense fallback's ring metric."""
        return np.abs(self.anc - owner_q[None, :]).max(axis=1)

    def mind2(self, qc_rows: np.ndarray, pidx: np.ndarray) -> np.ndarray:
        """Exact f64 clamped envelope distance for (query, partition)
        pairs — tight per-partition envelopes, same op order as the
        query kernels."""
        lo = self.lo[pidx]
        up = self.up[pidx]
        c = np.clip(qc_rows, lo, up) - qc_rows
        return (c * c).sum(axis=1)


def _seed_walk(dirx: GridDirectory, qc: np.ndarray, owner: np.ndarray,
               k: int, emit: bool):
    """Ring walk until each query's cumulative member count reaches k
    (or its rings are exhausted).  Returns (qi, pi, r_stop, fb) where fb
    marks queries handed to the dense fallback.  The seed set is the
    FULL Chebyshev ball of radius r_stop — deterministic from (owner,
    k, directory) alone, so the refine pass can recompute and exclude
    it exactly."""
    Q = len(qc)
    maxr = dirx.max_ring(owner)
    cum = np.zeros(Q, dtype=np.int64)
    r_stop = np.full(Q, -1, dtype=np.int64)
    fb = np.zeros(Q, dtype=bool)
    out_q: list[np.ndarray] = []
    out_p: list[np.ndarray] = []
    r = 0
    while True:
        act = np.nonzero((r_stop < 0) & ~fb)[0]
        if len(act) == 0:
            break
        if r > FALLBACK_RINGS:
            fb[act] = True
            break
        inb = act[maxr[act] >= r]
        if len(inb):
            memq, memp = dirx.ring_members(inb, owner, r)
            if len(memq):
                if emit:
                    out_q.append(memq)
                    out_p.append(memp)
                np.add.at(cum, memq, dirx.counts[memp])
        done = act[(cum[act] >= k) | (maxr[act] <= r)]
        r_stop[done] = r
        r += 1
    if fb.any():
        # dense fallback: per straggler, partitions sorted by Chebyshev
        # ring; r_stop = first ring whose cumulative count covers k
        for q in np.nonzero(fb)[0]:
            cheb = dirx.cheb_to_owner(owner[q])
            o = np.argsort(cheb, kind="stable")
            cs = np.cumsum(dirx.counts[o])
            j = int(np.argmax(cs >= k)) if cs[-1] >= k else len(o) - 1
            r_stop[q] = int(cheb[o[j]])
            sel = o[cheb[o] <= r_stop[q]]
            if emit:
                out_q.append(np.full(len(sel), q, dtype=np.int64))
                out_p.append(sel)
    qi = np.concatenate(out_q) if out_q else np.empty(0, dtype=np.int64)
    pi = np.concatenate(out_p) if out_p else np.empty(0, dtype=np.int64)
    return qi, pi, r_stop, fb


def _widen(dk2: np.ndarray, dirx: GridDirectory, qc: np.ndarray) -> np.ndarray:
    """Sound f64 widening of the radius test: mind2 here and dist2 in
    the kernels are both f64 but not bit-identical computations, so the
    bound is padded by a few ulps scaled to coordinate magnitude —
    padding only ever ADMITS partitions; exact distances decide."""
    C = float(max(np.abs(dirx.lo).max(initial=0.0),
                  np.abs(dirx.up).max(initial=0.0),
                  np.abs(qc).max(initial=0.0), 1.0))
    err = 8.0 * float(np.finfo(np.float64).eps) * C * dirx.d
    fin = np.isfinite(dk2)
    root = np.sqrt(np.maximum(dk2, 0.0), where=fin,
                   out=np.full(len(dk2), np.inf))
    return (root + err) ** 2 * (1.0 + 1e-12)


def plan_seed(dirx: GridDirectory, qc: np.ndarray, k: int):
    """SEED routes: for each query, the full ring ball out to the first
    ring covering >= k rows.  Returns (qi, pi, r_stop); keep r_stop and
    pass it to plan_refine to skip the recompute."""
    if len(qc) == 0 or len(dirx.counts) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, np.empty(0, dtype=np.int64)
    owner = dirx.owners(qc)
    qi, pi, r_stop, _ = _seed_walk(dirx, qc, owner, k, emit=True)
    return qi, pi, r_stop


def plan_refine(dirx: GridDirectory, qc: np.ndarray, k: int,
                dk2: np.ndarray, r_stop: np.ndarray | None = None):
    """REFINE routes: partitions with tight-envelope mind2 <= dk2
    (inclusive — equal-distance ties in other cells must compete on the
    id tie-break) EXCLUDING the seed ball, which is recomputed
    deterministically when ``r_stop`` is not supplied."""
    if len(qc) == 0 or len(dirx.counts) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    owner = dirx.owners(qc)
    if r_stop is None:
        _, _, r_stop, _ = _seed_walk(dirx, qc, owner, k, emit=False)
    bound = _widen(dk2, dirx, qc)
    maxr = dirx.max_ring(owner)
    # rings with lb > bound can't contain a winner: (r-1)*w_min bound
    with np.errstate(over="ignore"):
        r_need = np.where(np.isfinite(bound),
                          np.floor(np.sqrt(bound) / dirx.w_min) + 2,
                          np.inf)
    r_max = np.minimum(r_need, maxr.astype(np.float64))
    fb = (r_max - r_stop) > FALLBACK_RINGS
    out_q: list[np.ndarray] = []
    out_p: list[np.ndarray] = []
    walkers = np.nonzero(~fb & (r_max > r_stop))[0]
    if len(walkers):
        r = int(r_stop[walkers].min()) + 1
        top = int(r_max[walkers].max())
        while r <= top:
            act = walkers[(r_stop[walkers] < r) & (r <= r_max[walkers])]
            if len(act):
                memq, memp = dirx.ring_members(act, owner, r)
                if len(memq):
                    d2 = dirx.mind2(qc[memq], memp)
                    keep = d2 <= bound[memq]
                    out_q.append(memq[keep])
                    out_p.append(memp[keep])
            r += 1
    for q in np.nonzero(fb)[0]:
        # dense row for this query only: radius test over all
        # partitions minus the seed ball (ball membership is arithmetic
        # — Chebyshev distance of the ancestor cell)
        cheb = dirx.cheb_to_owner(owner[q])
        d2 = dirx.mind2(np.broadcast_to(qc[q], (len(cheb), dirx.d)),
                        np.arange(len(cheb)))
        sel = np.nonzero((cheb > r_stop[q]) & (d2 <= bound[q]))[0]
        out_q.append(np.full(len(sel), q, dtype=np.int64))
        out_p.append(sel)
    if not out_q:
        z = np.empty(0, dtype=np.int64)
        return z, z
    return np.concatenate(out_q), np.concatenate(out_p)


def plan_cover(dirx: GridDirectory, qc: np.ndarray, k: int):
    """One-pass cover routes for indexed_knn's single co-shuffle shape:
    seed ball -> per-query upper bound ub = max member max-corner
    distance over the ball (a proven kth-distance bound: the ball holds
    >= k rows, all within ub) -> all partitions with tight mind2 <= ub.
    Same bound derivation as the matrix planner, visiting only
    enumerated rings."""
    if len(qc) == 0 or len(dirx.counts) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    owner = dirx.owners(qc)
    sqi, spi, r_stop, _ = _seed_walk(dirx, qc, owner, k, emit=True)
    total = int(dirx.counts.sum())
    ub = np.full(len(qc), np.inf)
    if total > k and len(sqi):
        lo = dirx.lo[spi]
        up = dirx.up[spi]
        q = qc[sqi]
        far = np.maximum(np.abs(q - lo), np.abs(q - up))
        maxd2 = (far * far).sum(axis=1)
        ub_fill = np.zeros(len(qc))
        np.maximum.at(ub_fill, sqi, maxd2)
        covered = np.zeros(len(qc), dtype=np.int64)
        np.add.at(covered, sqi, dirx.counts[spi])
        ok = covered >= k
        ub[ok] = ub_fill[ok]
    qi2, pi2 = plan_refine(dirx, qc, k, ub, r_stop=r_stop)
    # seed members always qualify (they define ub); refine adds the rest
    return (np.concatenate([sqi, qi2]), np.concatenate([spi, pi2]))
