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
# this point enumeration cost (~(2r)^d cells) rivals the dense scan.
# The walk ALSO falls back as soon as the enumerated ball volume
# exceeds the partition count (cost-based: the dense row IS the matrix
# planner's row, and it is cheaper than walking a ball bigger than M) —
# the fixed ring cap alone let a 20k-query out-of-distribution lap
# walk ~38 rings x 20k queries (14 s planning) when 958 dense rows
# (0.9 s total) answered the same thing.
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


def _cover_ub(dirx: GridDirectory, qc: np.ndarray, qidx: np.ndarray,
              pidx: np.ndarray, k: int, Q: int) -> np.ndarray:
    """Per-query envelope upper bound on the kth-NN distance from the
    collected ball members: cover >= k rows greedily in ascending
    tight-envelope min-dist order; every cover row lies within its
    member's max-corner distance, so the cover's max max-corner bounds
    the true kth distance.  inf where the members cover < k rows."""
    ub = np.full(Q, np.inf)
    if len(qidx) == 0:
        return ub
    mind2 = dirx.mind2(qc[qidx], pidx)
    q = qc[qidx]
    far = np.maximum(np.abs(q - dirx.lo[pidx]), np.abs(q - dirx.up[pidx]))
    maxd2 = (far * far).sum(axis=1)
    order = np.lexsort((mind2, qidx))
    qs = qidx[order]
    cnt = dirx.counts[pidx[order]]
    xs = maxd2[order]
    n = len(qs)
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    boundary[1:] = qs[1:] != qs[:-1]
    seg_start = np.maximum.accumulate(np.where(boundary, np.arange(n), 0))
    cum = np.cumsum(cnt)
    base = np.where(seg_start > 0, cum[np.maximum(seg_start - 1, 0)], 0)
    inseg = cum - base
    # per-segment running max of xs via the add-big trick; the rounding
    # it can introduce only matters through the final ub, which is
    # inflated below — a wider ub only ever ADMITS more
    seg_id = np.cumsum(boundary) - 1
    big = float(xs.max(initial=0.0)) + 1.0
    rm = np.maximum.accumulate(xs + seg_id * big) - seg_id * big
    covered = inseg >= k
    if covered.any():
        idx = np.nonzero(covered)[0]
        qcv = qs[idx]
        first = np.ones(len(idx), dtype=bool)
        first[1:] = qcv[1:] != qcv[:-1]
        sel = idx[first]
        ub[qs[sel]] = rm[sel] * (1.0 + 1e-9)
    return ub


def _matrix_routes(dirx: GridDirectory, qc_sub: np.ndarray, k: int,
                   dk2_sub: np.ndarray | None = None):
    """Dense-matrix routes for fallback stragglers — delegates to the
    f32 chunked/threaded matrix planner (state._plan_knn_seed_refine):
    for a query whose ring ball would exceed the partition count, the
    dense row IS the optimal plan, and the matrix implementation
    (argpartition escalation, f32 traffic, thread pool) is ~20x faster
    than any per-query numpy loop here.  Runtime import: state imports
    ringplan lazily and vice versa — no module-level cycle."""
    from .state import _plan_knn_seed_refine

    return _plan_knn_seed_refine(qc_sub, dirx.lo, dirx.up, dirx.counts,
                                 k, dk2=dk2_sub)


def _seed_walk(dirx: GridDirectory, qc: np.ndarray, owner: np.ndarray,
               k: int, emit: bool):
    """Two-phase ring walk.  Phase 1 expands until each query's
    cumulative member count reaches k (or its rings are exhausted).
    Phase 2 computes the greedy cover's envelope bound ub (_cover_ub)
    and KEEPS WALKING until the ring lower bound exceeds sqrt(ub): the
    walked ball then provably contains every partition that can hold a
    true top-k row, so pass 1's kth distance is EXACT and the refine
    pass admits (almost) nothing.  Without phase 2 the first covering
    ring can be distance-far on anisotropic grids (clipped owners,
    w_max >> w_min), the pass-1 kth distance is loose, and the refine
    annulus explodes — measured 1.37M routed pairs vs the matrix
    planner's 444 on a 958-cell index with out-of-grid queries.

    Queries whose walk would touch more cells than the partition count
    (upfront: the owner is so far outside the occupied box that the
    first-contact ball already exceeds M; mid-walk: the ring caps) are
    flagged fb and NOT walked — plan_seed/plan_refine route them
    through the dense matrix planner, which is optimal there.

    Returns (qi, pi, r_stop, fb, ub): qi/pi are the non-fb ball routes
    filtered to mind2 <= widen(ub) (refine's bound is <= widen(ub)
    because the pass-1 kth distance is <= ub, so skipping the others is
    sound); r_stop/ub/fb are deterministic from (owner, k, directory)
    alone, so the refine pass can recompute and exclude exactly."""
    Q = len(qc)
    maxr = dirx.max_ring(owner)
    cum = np.zeros(Q, dtype=np.int64)
    r_cover = np.full(Q, -1, dtype=np.int64)
    M = len(dirx.counts)
    cap = max(64, M)
    # upfront fallback: Chebyshev index distance from the owner to the
    # occupied bounding box — if the first ring that can CONTACT any
    # occupied cell already implies a ball bigger than M, walking is
    # never worth it
    r_near = np.maximum(np.maximum(dirx.amin - owner, owner - dirx.amax),
                        0).max(axis=1)
    fb = (2 * r_near + 1) ** dirx.d > cap
    ub = np.full(Q, np.inf)
    col_q: list[np.ndarray] = []
    col_p: list[np.ndarray] = []
    r = 0
    # -- phase 1: first covering ring ------------------------------------
    while True:
        act = np.nonzero((r_cover < 0) & ~fb)[0]
        if len(act) == 0:
            break
        if r > FALLBACK_RINGS or (2 * r + 1) ** dirx.d > cap:
            fb[act] = True
            break
        inb = act[maxr[act] >= r]
        if len(inb):
            memq, memp = dirx.ring_members(inb, owner, r)
            if len(memq):
                col_q.append(memq)
                col_p.append(memp)
                np.add.at(cum, memq, dirx.counts[memp])
        done = act[(cum[act] >= k) | (maxr[act] <= r)]
        r_cover[done] = r
        r += 1
    qidx = np.concatenate(col_q) if col_q else np.empty(0, dtype=np.int64)
    pidx = np.concatenate(col_p) if col_p else np.empty(0, dtype=np.int64)
    # -- phase 2: extend the ball to the cover's envelope bound ----------
    ub_walk = _cover_ub(dirx, qc, qidx, pidx, k, Q)
    ub[~fb] = ub_walk[~fb]
    with np.errstate(over="ignore", invalid="ignore"):
        r_need = np.where(np.isfinite(ub),
                          np.floor(np.sqrt(np.maximum(ub, 0.0))
                                   / dirx.w_min) + 2.0,
                          np.inf)
    r_final = np.minimum(np.maximum(r_cover, r_need),
                         maxr.astype(np.float64))
    # cost fallback for phase 2, same rule as phase 1
    deep = (~fb) & ((r_final - r_cover > FALLBACK_RINGS)
                    | ((2.0 * r_final + 1.0) ** dirx.d > cap))
    fb |= deep
    ub[fb] = np.inf  # fb queries route through the matrix planner
    r_final = np.where(fb, 0.0, r_final).astype(np.int64)
    walkers = np.nonzero(~fb & (r_final > r_cover))[0]
    if len(walkers):
        r2 = int(r_cover[walkers].min()) + 1
        top = int(r_final[walkers].max())
        while r2 <= top:
            act = walkers[(r_cover[walkers] < r2)
                          & (r2 <= r_final[walkers])
                          & (maxr[walkers] >= r2)]
            if len(act):
                memq, memp = dirx.ring_members(act, owner, r2)
                if len(memq):
                    col_q.append(memq)
                    col_p.append(memp)
            r2 += 1
        qidx = np.concatenate(col_q)
        pidx = np.concatenate(col_p)
    r_stop = np.where(fb, np.int64(-1), np.maximum(r_final, r_cover))
    out_q: list[np.ndarray] = []
    out_p: list[np.ndarray] = []
    if emit and len(qidx):
        keep = ~fb[qidx]
        if keep.any():
            kq, kp = qidx[keep], pidx[keep]
            bound = _widen(ub, dirx, qc)
            adm = dirx.mind2(qc[kq], kp) <= bound[kq]
            out_q.append(kq[adm])
            out_p.append(kp[adm])
    qi = np.concatenate(out_q) if out_q else np.empty(0, dtype=np.int64)
    pi = np.concatenate(out_p) if out_p else np.empty(0, dtype=np.int64)
    return qi, pi, r_stop, fb, ub


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
    """SEED routes: for each query, the ring ball extended to the
    greedy cover's envelope bound (plus matrix-style dense seeds for
    fallback stragglers), filtered to mind2 <= widen(ub).  Returns
    (qi, pi, aux); pass aux to plan_refine to skip the recompute."""
    if len(qc) == 0 or len(dirx.counts) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, (np.empty(0, dtype=np.int64),
                      np.empty(0), np.empty(0, dtype=bool))
    owner = dirx.owners(qc)
    qi, pi, r_stop, fb, ub = _seed_walk(dirx, qc, owner, k, emit=True)
    if fb.any():
        fi = np.nonzero(fb)[0]
        mq, mp = _matrix_routes(dirx, qc[fi], k)
        qi = np.concatenate([qi, fi[mq]])
        pi = np.concatenate([pi, mp])
    return qi, pi, (r_stop, ub, fb)


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
        _, _, r_stop, seed_fb, seed_ub = _seed_walk(dirx, qc, owner, k,
                                                    emit=False)
    elif isinstance(r_stop, tuple):
        r_stop, seed_ub, seed_fb = r_stop
    else:  # bare r_stop array (older callers/tests): recompute the rest
        _, _, _, seed_fb, seed_ub = _seed_walk(dirx, qc, owner, k,
                                               emit=False)
    bound = _widen(dk2, dirx, qc)
    maxr = dirx.max_ring(owner)
    # rings with lb > bound can't contain a winner: (r-1)*w_min bound
    with np.errstate(over="ignore"):
        r_need = np.where(np.isfinite(bound),
                          np.floor(np.sqrt(bound) / dirx.w_min) + 2,
                          np.inf)
    r_max = np.minimum(r_need, maxr.astype(np.float64))
    out_q: list[np.ndarray] = []
    out_p: list[np.ndarray] = []
    # ball-seeded queries: in the kNN flow dk2 <= seed ub (pass 1 read
    # the whole widen(ub) ball), so the walk below is a no-op; it only
    # runs when a caller hands a LOOSER bound (e.g. plan_cover's
    # envelope ub can exceed the seed ub)
    walkers = np.nonzero(~seed_fb & (r_max > r_stop))[0]
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
    # fallback-seeded queries ride the matrix planner's refine, which
    # recomputes and excludes its own deterministic seed cover
    if seed_fb.any():
        fi = np.nonzero(seed_fb)[0]
        mq, mp = _matrix_routes(dirx, qc[fi], k, dk2_sub=dk2[fi])
        out_q.append(fi[mq])
        out_p.append(mp)
    if not out_q:
        z = np.empty(0, dtype=np.int64)
        return z, z
    return np.concatenate(out_q), np.concatenate(out_p)


def plan_cover(dirx: GridDirectory, qc: np.ndarray, k: int):
    """One-pass cover routes for indexed_knn's single co-shuffle shape:
    the seed walk already routes EVERY partition with tight mind2 <=
    widen(ub), where ub is the greedy cover's envelope bound — a proven
    kth-distance bound (the cover holds >= k rows, all within ub).
    Same bound derivation as the matrix planner, visiting only
    enumerated rings (dense rows only for fallback stragglers)."""
    if len(qc) == 0 or len(dirx.counts) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    owner = dirx.owners(qc)
    sqi, spi, _, fb, _ = _seed_walk(dirx, qc, owner, k, emit=True)
    if not fb.any():
        return sqi, spi
    # fallback stragglers: matrix seed cover + its envelope-bound
    # annulus (the cover holds >= k rows, all within the max max-corner
    # distance ub_env, so partitions outside widen(ub_env) are out)
    fi = np.nonzero(fb)[0]
    mq, mp = _matrix_routes(dirx, qc[fi], k)
    q = qc[fi][mq]
    far = np.maximum(np.abs(q - dirx.lo[mp]), np.abs(q - dirx.up[mp]))
    maxd2 = (far * far).sum(axis=1)
    ub_env = np.full(len(fi), np.inf)
    covered = np.zeros(len(fi), dtype=np.int64)
    np.add.at(covered, mq, dirx.counts[mp])
    ub_fill = np.zeros(len(fi))
    np.maximum.at(ub_fill, mq, maxd2)
    ok = covered >= k
    ub_env[ok] = ub_fill[ok] * (1.0 + 1e-9)
    rq, rp = _matrix_routes(dirx, qc[fi], k, dk2_sub=ub_env)
    return (np.concatenate([sqi, fi[mq], fi[rq]]),
            np.concatenate([spi, mp, rp]))
