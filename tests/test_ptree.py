"""PTree oracles — the reference's own test strategy (SURVEY.md §5):
every query compared against a linear-scan brute force, mirroring
nearest_neighbor.rs:336-397, iterators.rs:283-410,
intersection_iterator.rs:112-134, bulk_load_sequential.rs:111-151."""

from __future__ import annotations

import numpy as np
import pytest

from geograft import kernels as K
from geograft.ptree import PTree


def random_points(rng, n, d=2):
    return rng.uniform(0, 1, (n, d))


def random_rects(rng, n, d=2, extent=0.05):
    lo = rng.uniform(0, 1, (n, d))
    return lo, lo + rng.uniform(0, extent, (n, d))


@pytest.mark.parametrize("n", [0, 1, 5, 32, 33, 100, 693, 3000])
def test_build_covers_all_rows(rng, n):
    pts = random_points(rng, n)
    t = PTree(pts)
    t.sanity_check()
    assert len(t.order) == n


@pytest.mark.parametrize("d", [2, 3, 4])
def test_locate_in_envelope_vs_bruteforce(rng, d):
    # mirrors iterators.rs:309-325
    lo, up = random_rects(rng, 1000, d)
    t = PTree(lo, up)
    for _ in range(50):
        qlo = rng.uniform(0, 0.8, d)
        qhi = qlo + rng.uniform(0, 0.5, d)
        got = np.sort(t.locate_in_envelope(qlo, qhi))
        want = np.nonzero(K.env_contains_env(qlo[None], qhi[None], lo, up))[0]
        np.testing.assert_array_equal(got, want)
        got_i = np.sort(t.locate_in_envelope_intersecting(qlo, qhi))
        want_i = np.nonzero(K.env_intersects(lo, up, qlo, qhi))[0]
        np.testing.assert_array_equal(got_i, want_i)


def test_locate_all_at_point_vs_bruteforce(rng):
    # mirrors iterators.rs:283-306 — duplicated points included
    pts = random_points(rng, 500)
    pts = np.vstack([pts, pts[:100]])  # duplicates allowed (rtree.rs:905-909)
    t = PTree(pts)
    for i in range(0, 600, 23):
        q = pts[i]
        got = np.sort(t.locate_all_at_point(q))
        want = np.nonzero((pts == q).all(axis=1))[0]
        np.testing.assert_array_equal(got, want)
    assert len(t.locate_all_at_point([2.0, 2.0])) == 0


def test_locate_within_distance_vs_bruteforce(rng):
    # mirrors iterators.rs:389-410
    pts = random_points(rng, 2000)
    t = PTree(pts)
    for _ in range(30):
        q = rng.uniform(0, 1, 2)
        r2 = rng.uniform(0.001, 0.1)
        got = np.sort(t.locate_within_distance(q, r2))
        want = np.nonzero(K.point_distance_2(pts, q) <= r2)[0]
        np.testing.assert_array_equal(got, want)


def test_knn_vs_full_sort(rng):
    # mirrors nearest_neighbor.rs:336-354 and the iterator-vs-sort test :383-397
    pts = random_points(rng, 1000)
    t = PTree(pts)
    for _ in range(100):
        q = rng.uniform(0, 1, 2)
        d2 = K.point_distance_2(pts, q)
        full = np.lexsort((np.arange(len(pts)), d2))
        for k in (1, 7, 40):
            rows, rd2 = t.knn(q, k)
            np.testing.assert_array_equal(rows, full[:k])
            np.testing.assert_array_equal(rd2, d2[full[:k]])


def test_knn_on_rect_tree(rng):
    lo, up = random_rects(rng, 800)
    t = PTree(lo, up)
    q = rng.uniform(0, 1, 2)
    d2 = K.env_distance_2(lo, up, q)
    full = np.lexsort((np.arange(len(lo)), d2))
    rows, rd2 = t.knn(q, 11)
    np.testing.assert_array_equal(rows, full[:11])


def test_nearest_neighbors_all_ties(rng):
    # plural-NN tie semantics (nearest_neighbor.rs:297-321): exact equality
    pts = np.array([[0.5, 0.5], [0.5, 0.5], [0.25, 0.5], [0.75, 0.5], [0.9, 0.9]])
    t = PTree(pts)
    np.testing.assert_array_equal(t.nearest_neighbors([0.5, 0.5]), [0, 1])
    # 0.25 and 0.75 are equidistant from 0.5 by exact f64 arithmetic
    np.testing.assert_array_equal(t.nearest_neighbors([0.5, 0.6]), [0, 1])
    got = t.nearest_neighbors([0.0, 0.5])
    np.testing.assert_array_equal(got, [2])


def test_join_vs_nested_loop(rng):
    # mirrors intersection_iterator.rs:112-134 (100 x 42 rectangles)
    lo1, up1 = random_rects(rng, 100, extent=0.1)
    rng2 = np.random.default_rng(7)
    lo2, up2 = random_rects(rng2, 42, extent=0.1)
    t1, t2 = PTree(lo1, up1), PTree(lo2, up2)
    a, b = t1.join(t2)
    got = set(zip(a.tolist(), b.tolist()))
    want = set()
    for i in range(100):
        hit = K.env_intersects(lo2, up2, lo1[i], up1[i])
        for j in np.nonzero(hit)[0]:
            want.add((i, int(j)))
    assert got == want
    assert len(a) == len(got), "no duplicate pairs"


def test_join_sides_swap(rng):
    lo1, up1 = random_rects(rng, 30, extent=0.2)
    lo2, up2 = random_rects(np.random.default_rng(3), 300, extent=0.2)
    t1, t2 = PTree(lo1, up1), PTree(lo2, up2)
    a, b = t1.join(t2)  # small side is self -> no flip path
    c, d = t2.join(t1)  # big side is self -> flip path
    assert set(zip(a.tolist(), b.tolist())) == set(zip(d.tolist(), c.tolist()))


def test_skewed_all_identical(rng):
    # degenerate all-overlapping input (rtree.rs:134-142)
    pts = np.full((500, 2), 0.5)
    t = PTree(pts)
    t.sanity_check()
    assert len(t.locate_all_at_point([0.5, 0.5])) == 500
    rows, d2 = t.knn([0.5, 0.5], 3)
    np.testing.assert_array_equal(rows, [0, 1, 2])
    assert (d2 == 0).all()


def test_integer_coordinates(rng):
    # rstar supports integer scalars (point.rs:98-100); engine maps them to
    # float64 with identical comparison semantics for |v| < 2^53
    pts = rng.integers(-100000, 100000, (1000, 3)).astype(np.float64)
    t = PTree(pts)
    q = pts[17]
    got = t.locate_all_at_point(q)
    want = np.nonzero((pts == q).all(axis=1))[0]
    np.testing.assert_array_equal(np.sort(got), want)


def test_locate_batch_matches_single_query_paths(rng):
    # the batched multi-frontier traversal must be answer-set-equal to
    # the single-query locate_* methods, mode by mode
    lo, up = random_rects(rng, 800, extent=0.08)
    t = PTree(lo, up)
    nq = 40
    qlo, qhi = random_rects(np.random.default_rng(7), nq, extent=0.25)
    pts = np.random.default_rng(8).random((nq, 2))
    r2 = np.random.default_rng(9).uniform(0.001, 0.05, nq)

    rq, rr = t.locate_batch(qlo, qhi, "intersects")
    for q in range(nq):
        want = t.locate_in_envelope_intersecting(qlo[q], qhi[q])
        np.testing.assert_array_equal(np.sort(rr[rq == q]), np.sort(want))

    rq, rr = t.locate_batch(qlo, qhi, "contained")
    for q in range(nq):
        want = t.locate_in_envelope(qlo[q], qhi[q])
        np.testing.assert_array_equal(np.sort(rr[rq == q]), np.sort(want))

    rq, rr = t.locate_batch(pts, mode="at_point")
    for q in range(nq):
        want = t.locate_all_at_point(pts[q])
        np.testing.assert_array_equal(np.sort(rr[rq == q]), np.sort(want))

    rq, rr = t.locate_batch(pts, mode="within", r2=r2)
    for q in range(nq):
        want = t.locate_within_distance(pts[q], r2[q])
        np.testing.assert_array_equal(np.sort(rr[rq == q]), np.sort(want))


def test_locate_batch_empty_cases(rng):
    lo, up = random_rects(rng, 50)
    t = PTree(lo, up)
    rq, rr = t.locate_batch(np.empty((0, 2)), np.empty((0, 2)), "intersects")
    assert len(rq) == 0 and len(rr) == 0
    # queries far outside: pruned at the root, every level empties
    far = np.full((3, 2), 99.0)
    rq, rr = t.locate_batch(far, far + 1.0, "intersects")
    assert len(rq) == 0
    empty_tree = PTree(np.empty((0, 2)))
    rq, rr = empty_tree.locate_batch(np.zeros((2, 2)), np.ones((2, 2)))
    assert len(rq) == 0
