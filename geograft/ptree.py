"""Per-partition packed R-tree — level 2 of the two-level index.

A numpy re-expression of rstar's OMT bulk load
(rstar/src/algorithm/bulk_load/bulk_load_sequential.rs:15-101 +
cluster_group_iterator.rs:10-79): elements are recursively partitioned
into near-square tiles axis by axis (Sort-Tile-Recursive packing, the
same family the OMT paper builds on), leaves hold up to ``max_size``
rows, and upper levels group ``max_size`` consecutive nodes. The
result is a *packed* static tree held in flat arrays — no pointers, so
it serializes cheaply into an actor and queries run as vectorized
frontier traversals instead of per-node recursion.

Contract parity with the reference is SET equality of query answers,
not structural equality (rstar's own bulk-load tests assert multiset
membership, bulk_load_sequential.rs:111-151); rstar explicitly leaves
iteration order unspecified (rtree.rs:303).

All query methods return ROW INDICES into the arrays the tree was
built from; exact leaf predicates replay the reference's
SelectionFunction semantics (rstar/src/selection_functions.rs).
"""

from __future__ import annotations

import math

import numpy as np

from . import kernels as K

DEFAULT_MAX_SIZE = 32


def _str_leaf_slices(lower: np.ndarray, max_size: int) -> list[np.ndarray]:
    """Recursive sort-tile partitioning: slab counts follow the OMT
    closed form (cluster_group_iterator.rs:63-79) generalized per
    remaining axis; the last axis packs sorted runs into leaves."""
    n, d = lower.shape

    def rec(idx: np.ndarray, axis: int) -> list[np.ndarray]:
        m = len(idx)
        if m <= max_size:
            return [idx]
        order = idx[np.argsort(lower[idx, axis], kind="stable")]
        if axis == d - 1:
            return [order[i : i + max_size] for i in range(0, m, max_size)]
        n_leaves = math.ceil(m / max_size)
        slabs = max(2, math.ceil(n_leaves ** (1.0 / (d - axis))))
        slab_size = math.ceil(m / slabs)
        out: list[np.ndarray] = []
        for i in range(0, m, slab_size):
            out.extend(rec(order[i : i + slab_size], axis + 1))
        return out

    return rec(np.arange(n, dtype=np.int64), 0)


class PTree:
    """Packed static R-tree over n envelopes (points: lower == upper)."""

    def __init__(self, lower: np.ndarray, upper: np.ndarray | None = None,
                 max_size: int = DEFAULT_MAX_SIZE):
        lower = np.ascontiguousarray(np.atleast_2d(np.asarray(lower, dtype=np.float64)))
        upper = lower if upper is None else np.ascontiguousarray(
            np.atleast_2d(np.asarray(upper, dtype=np.float64)))
        if lower.shape != upper.shape:
            raise ValueError("lower/upper shape mismatch")
        # rstar's envelope sort panics on un-orderable (NaN) coordinates
        # (aabb.rs partial_cmp().unwrap()); a NaN here would instead silently
        # poison a leaf envelope and drop valid rows — reject it loudly.
        if not (np.isfinite(lower).all() and np.isfinite(upper).all()):
            raise ValueError("non-finite coordinates; filter upstream")
        self.lower, self.upper = lower, upper
        self.n, self.d = lower.shape
        self.max_size = max_size
        if self.n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.leaf_offsets = np.zeros(1, dtype=np.int64)
            self.levels: list[tuple[np.ndarray, np.ndarray]] = []
            return
        slices = _str_leaf_slices(lower, max_size)
        self.order = np.concatenate(slices)
        sizes = np.fromiter((len(s) for s in slices), dtype=np.int64)
        self.leaf_offsets = np.concatenate([[0], np.cumsum(sizes)])
        # leaf envelopes: union of member rows (node.rs:158-167)
        lo_o, up_o = lower[self.order], upper[self.order]
        lvl_lo = np.minimum.reduceat(lo_o, self.leaf_offsets[:-1], axis=0)
        lvl_up = np.maximum.reduceat(up_o, self.leaf_offsets[:-1], axis=0)
        self.levels = [(lvl_lo, lvl_up)]
        while len(self.levels[-1][0]) > max_size:
            lo, up = self.levels[-1]
            starts = np.arange(0, len(lo), max_size)
            self.levels.append((
                np.minimum.reduceat(lo, starts, axis=0),
                np.maximum.reduceat(up, starts, axis=0),
            ))

    # ---- traversal ------------------------------------------------------

    def _expand(self, keep: np.ndarray, size_below: int) -> np.ndarray:
        """Child indices of the kept nodes (children are contiguous runs)."""
        starts = keep * self.max_size
        ends = np.minimum(starts + self.max_size, size_below)
        lens = ends - starts
        total = int(lens.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64)
        out = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
        return out + np.repeat(starts, lens)

    def _candidate_rows(self, node_pred) -> np.ndarray:
        """Pruned descent (SelectionIterator, iterators.rs:42-95) run
        level-wise: `node_pred(lo, up) -> mask` plays
        should_unpack_parent; returns surviving row indices."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        frontier = np.arange(len(self.levels[-1][0]), dtype=np.int64)
        for li in range(len(self.levels) - 1, -1, -1):
            lo, up = self.levels[li]
            frontier = frontier[node_pred(lo[frontier], up[frontier])]
            if len(frontier) == 0:
                return np.empty(0, dtype=np.int64)
            if li > 0:
                frontier = self._expand(frontier, len(self.levels[li - 1][0]))
        # frontier is now leaf ids -> gather member rows
        starts = self.leaf_offsets[frontier]
        ends = self.leaf_offsets[frontier + 1]
        lens = ends - starts
        total = int(lens.sum())
        out = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
        return self.order[out + np.repeat(starts, lens)]

    # ---- queries (rstar locate_* family) --------------------------------

    def locate_in_envelope(self, qlo, qhi) -> np.ndarray:
        """rtree.rs:351-390: envelopes fully contained in the query box;
        parents pruned by intersects, leaves kept by contains_envelope."""
        qlo = np.asarray(qlo, dtype=np.float64)
        qhi = np.asarray(qhi, dtype=np.float64)
        cand = self._candidate_rows(lambda lo, up: K.env_intersects(lo, up, qlo, qhi))
        keep = K.env_contains_env(qlo[None, :], qhi[None, :],
                                  self.lower[cand], self.upper[cand])
        return cand[keep]

    def locate_in_envelope_intersecting(self, qlo, qhi) -> np.ndarray:
        """rtree.rs:447-498: envelopes intersecting the box (touch counts)."""
        qlo = np.asarray(qlo, dtype=np.float64)
        qhi = np.asarray(qhi, dtype=np.float64)
        cand = self._candidate_rows(lambda lo, up: K.env_intersects(lo, up, qlo, qhi))
        keep = K.env_intersects(self.lower[cand], self.upper[cand], qlo, qhi)
        return cand[keep]

    def locate_all_at_point(self, pt) -> np.ndarray:
        """rtree.rs:753-843: envelope containment then exact containment.
        For point rows (lower==upper) exact containment is equality
        (object.rs:221-223); for boxes it is box containment
        (rectangle.rs:95-97) — both are the envelope test here."""
        pt = np.asarray(pt, dtype=np.float64)
        cand = self._candidate_rows(lambda lo, up: K.env_contains_point(lo, up, pt))
        keep = K.env_contains_point(self.lower[cand], self.upper[cand], pt)
        return cand[keep]

    def locate_within_distance(self, pt, r2: float) -> np.ndarray:
        """rtree.rs:1053-1060: distance_2 <= r2, parents pruned by
        envelope distance (selection_functions.rs:171-207)."""
        pt = np.asarray(pt, dtype=np.float64)
        cand = self._candidate_rows(lambda lo, up: K.env_distance_2(lo, up, pt) <= r2)
        keep = K.env_distance_2(self.lower[cand], self.upper[cand], pt) <= r2
        return cand[keep]

    def locate_batch(self, qlo, qhi=None, mode: str = "intersects",
                     r2: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
        """Answer Q queries in ONE level-wise sweep of (query, node)
        pairs — the batched counterpart of the single-query locate_*
        methods above, with identical pruning (should_unpack_parent) and
        leaf predicates, so answers are set-equal per query.

        mode: "intersects" | "contained" | "at_point" | "within".
        For "at_point" qlo holds the points; for "within" qlo holds the
        points and r2 the per-query squared radii. Returns
        (q_idx, row_idx) pairs; q_idx indexes into the input arrays.

        Per-query asymptotics match the pruned descent, but every numpy
        op spans ALL active pairs — this is what lets an actor serve a
        routed batch of thousands of queries without a Python-level
        per-query loop.
        """
        qlo = np.atleast_2d(np.asarray(qlo, dtype=np.float64))
        if qhi is not None:
            qhi = np.atleast_2d(np.asarray(qhi, dtype=np.float64))
        if r2 is not None:
            r2 = np.asarray(r2, dtype=np.float64)
        nq = len(qlo)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        if self.n == 0 or nq == 0:
            return empty

        def prune(lo, up, fq):
            if mode == "within":
                return K.env_distance_2(lo, up, qlo[fq]) <= r2[fq]
            if mode == "at_point":
                return K.env_contains_point(lo, up, qlo[fq])
            return K.env_intersects(lo, up, qlo[fq], qhi[fq])

        nroot = len(self.levels[-1][0])
        fq = np.repeat(np.arange(nq, dtype=np.int64), nroot)
        fn = np.tile(np.arange(nroot, dtype=np.int64), nq)
        for li in range(len(self.levels) - 1, -1, -1):
            lo, up = self.levels[li]
            m = prune(lo[fn], up[fn], fq)
            fq, fn = fq[m], fn[m]
            if len(fq) == 0:
                return empty
            if li > 0:
                below = len(self.levels[li - 1][0])
                starts = fn * self.max_size
                lens = np.minimum(starts + self.max_size, below) - starts
                total = int(lens.sum())
                pos = np.arange(total, dtype=np.int64) - np.repeat(
                    np.cumsum(lens) - lens, lens)
                fn = pos + np.repeat(starts, lens)
                fq = np.repeat(fq, lens)
        starts = self.leaf_offsets[fn]
        lens = self.leaf_offsets[fn + 1] - starts
        total = int(lens.sum())
        pos = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
        rows = self.order[pos + np.repeat(starts, lens)]
        rq = np.repeat(fq, lens)
        if mode == "within":
            keep = K.env_distance_2(self.lower[rows], self.upper[rows], qlo[rq]) <= r2[rq]
        elif mode == "at_point":
            keep = K.env_contains_point(self.lower[rows], self.upper[rows], qlo[rq])
        elif mode == "contained":
            keep = K.env_contains_env(qlo[rq], qhi[rq], self.lower[rows], self.upper[rows])
        else:
            keep = K.env_intersects(self.lower[rows], self.upper[rows], qlo[rq], qhi[rq])
        return rq[keep], rows[keep]

    def knn(self, pt, k: int) -> tuple[np.ndarray, np.ndarray]:
        """First k of nearest_neighbor_iter (rtree.rs:1094-1122): rows
        sorted by distance_2, ties broken by row index for determinism
        (the reference leaves tie order unspecified).

        Best-first over leaves: scan leaves in mindist order, stop when
        the next leaf's mindist exceeds the current kth distance — the
        leaf-granular analogue of the node heap in
        nearest_neighbor.rs:56-125. Returns (rows, dist2) ascending.
        """
        if self.n == 0 or k <= 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        pt = np.asarray(pt, dtype=np.float64)
        leaf_lo, leaf_up = self.levels[0]
        leaf_d2 = K.env_distance_2(leaf_lo, leaf_up, pt)
        leaf_order = np.argsort(leaf_d2, kind="stable")
        best_rows: list[np.ndarray] = []
        best_d2: list[np.ndarray] = []
        count = 0
        bound = np.inf
        for lf in leaf_order:
            if count >= k and leaf_d2[lf] > bound:
                break
            rows = self.order[self.leaf_offsets[lf] : self.leaf_offsets[lf + 1]]
            if self.n and (self.lower is self.upper):
                d2 = K.point_distance_2(self.lower[rows], pt)
            else:
                d2 = K.env_distance_2(self.lower[rows], self.upper[rows], pt)
            best_rows.append(rows)
            best_d2.append(d2)
            count += len(rows)
            if count >= k:
                alld2 = np.concatenate(best_d2)
                bound = np.partition(alld2, k - 1)[k - 1]
        rows = np.concatenate(best_rows)
        d2 = np.concatenate(best_d2)
        sel = np.lexsort((rows, d2))[:k]
        return rows[sel], d2[sel]

    def nearest_neighbors(self, pt) -> np.ndarray:
        """rtree.rs:1003-1043: ALL elements tied at the minimum distance
        (exact f64 equality of distance_2, matching the take_while in
        nearest_neighbor.rs:297-321)."""
        rows, d2 = self.knn(pt, 1)
        if len(rows) == 0:
            return rows
        cand = self.locate_within_distance(pt, float(d2[0]))
        if self.lower is self.upper:
            cd2 = K.point_distance_2(self.lower[cand], np.asarray(pt, dtype=np.float64))
        else:
            cd2 = K.env_distance_2(self.lower[cand], self.upper[cand],
                                   np.asarray(pt, dtype=np.float64))
        return np.sort(cand[cd2 == d2[0]])

    def join(self, other: "PTree") -> tuple[np.ndarray, np.ndarray]:
        """intersection_candidates_with_other_tree (rtree.rs:522-534,
        intersection_iterator.rs:15-104): every (self_row, other_row)
        pair whose envelopes intersect. Leaf-blocked dual traversal:
        for each of our leaves, prune the other tree with the leaf box,
        then test the member-row cross product vectorized."""
        if self.n == 0 or other.n == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        small, big, flip = (self, other, False) if self.n <= other.n else (other, self, True)
        # ONE batched traversal: small's leaf boxes are the query batch
        # against big (locate_batch applies the row-level intersect test
        # itself), then each surviving (leaf, big_row) pair expands to
        # the leaf's member rows for one flat member-level test — same
        # element-test count as a per-leaf dense loop, no Python loop.
        leaf_lo, leaf_up = small.levels[0]
        lq, brow = big.locate_batch(leaf_lo, leaf_up, "intersects")
        if len(lq) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        out_s: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        starts_all = small.leaf_offsets[lq]
        lens_all = (small.leaf_offsets[lq + 1] - starts_all).astype(np.int64)
        # chunk on expanded size so the flat test stays cache/RAM-bounded
        CHUNK = 1 << 22
        csum = np.cumsum(lens_all)
        cut = [0]
        while cut[-1] < len(lq):
            base = csum[cut[-1] - 1] if cut[-1] else 0
            nxt = int(np.searchsorted(csum, base + CHUNK, side="left")) + 1
            cut.append(min(max(nxt, cut[-1] + 1), len(lq)))
        for c0, c1 in zip(cut[:-1], cut[1:]):
            lens = lens_all[c0:c1]
            starts = starts_all[c0:c1]
            total = int(lens.sum())
            if total == 0:
                continue
            pos = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(lens) - lens, lens)
            srow = small.order[pos + np.repeat(starts, lens)]
            bb = np.repeat(brow[c0:c1], lens)
            keep = ((small.lower[srow] <= big.upper[bb]).all(axis=1)
                    & (small.upper[srow] >= big.lower[bb]).all(axis=1))
            out_s.append(srow[keep])
            out_b.append(bb[keep])
        if not out_s:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        s = np.concatenate(out_s)
        b = np.concatenate(out_b)
        return (b, s) if flip else (s, b)

    # ---- invariants (node.rs:106-155 sanity_check analogue) -------------

    def sanity_check(self) -> None:
        if self.n == 0:
            return
        assert len(self.order) == self.n
        assert np.array_equal(np.sort(self.order), np.arange(self.n)), "rows covered exactly once"
        lo_o, up_o = self.lower[self.order], self.upper[self.order]
        want_lo = np.minimum.reduceat(lo_o, self.leaf_offsets[:-1], axis=0)
        want_up = np.maximum.reduceat(up_o, self.leaf_offsets[:-1], axis=0)
        assert np.array_equal(self.levels[0][0], want_lo), "leaf envelope == union of members"
        assert np.array_equal(self.levels[0][1], want_up)
        for i in range(1, len(self.levels)):
            lo, up = self.levels[i - 1]
            starts = np.arange(0, len(lo), self.max_size)
            assert np.array_equal(self.levels[i][0], np.minimum.reduceat(lo, starts, axis=0))
            assert np.array_equal(self.levels[i][1], np.maximum.reduceat(up, starts, axis=0))
        assert len(self.levels[-1][0]) <= self.max_size, "root fanout bounded"
        sizes = np.diff(self.leaf_offsets)
        assert (sizes <= self.max_size).all() and (sizes >= 1).all()
