"""Analytic owner-cell + ring-expansion planner vs the matrix planner.

The two planners may route different (query, partition) candidate sets
— both are supersets of the true kNN support — but the exact kernels
must make the final results IDENTICAL (the bit-identical criterion for
swapping the planner out at high partition counts)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from geograft import grid as G
from geograft import ops, pipeline, ringplan, state


def test_ring_offsets_exact_shell():
    for d in (2, 3, 4):
        for r in (0, 1, 2, 3):
            offs = ringplan.ring_offsets(d, r)
            want = 1 if r == 0 else (2 * r + 1) ** d - (2 * r - 1) ** d
            assert offs.shape == (want, d)
            # each offset exactly once, all with Chebyshev norm r
            assert len(np.unique(offs, axis=0)) == want
            assert (np.abs(offs).max(axis=1) == r).all()


def test_unpack_nd_roundtrip():
    rng = np.random.default_rng(3)
    for d in (2, 3, 4):
        lvl = 4
        coords = rng.integers(0, 1 << lvl, size=(200, d))
        ids = G.pack_nd(coords, lvl)
        got, lv = G.unpack_nd(ids, d)
        np.testing.assert_array_equal(got, coords)
        assert (lv == lvl).all()


def _mk_points(n, seed, lo=0.0, hi=100.0):
    rng = np.random.default_rng(seed)
    xs = rng.uniform(lo, hi, n)
    ys = rng.uniform(lo, hi, n)
    ids = np.arange(n, dtype=np.int64)
    return pa.table({"id": ids, "x": xs, "y": ys,
                     "minx": xs, "miny": ys, "maxx": xs, "maxy": ys})


@pytest.fixture(scope="module")
def dense_index(ray_session, tmp_path_factory):
    """An index with MANY partitions (level 5 => up to 1024 cells) and
    a skew-split hot cluster so the directory is mixed-level."""
    import ray.data as rd

    t = _mk_points(20_000, 11)
    # hot cluster in one corner cell to force adaptive splitting
    hx = np.random.default_rng(7).uniform(1.0, 3.0, 5000)
    hy = np.random.default_rng(8).uniform(1.0, 3.0, 5000)
    hids = np.arange(20_000, 25_000, dtype=np.int64)
    hot = pa.table({"id": hids, "x": hx, "y": hy,
                    "minx": hx, "miny": hy, "maxx": hx, "maxy": hy})
    ds = rd.from_arrow(pa.concat_tables([t, hot]))
    path = str(tmp_path_factory.mktemp("ring") / "idx")
    pipeline.build_partitioned_index(ds, path, base_level=5,
                                     bounds=G.Bounds(0, 0, 100, 100),
                                     target_rows=60)
    man = pipeline.load_manifest(path)
    lvls = {int(c) >> 58 for c in map(int, man["partitions"].keys())}
    assert len(lvls) > 1, "fixture must exercise mixed-level cells"
    assert len(man["partitions"]) > 200
    return path, ds


def test_knn_on_index_rings_vs_matrix_identical(ray_session, dense_index):
    path, ds = dense_index
    rng = np.random.default_rng(21)
    nq = 300
    # queries inside, near the hot cluster, on edges, and OUTSIDE bounds
    qx = np.concatenate([rng.uniform(0, 100, nq - 60),
                         rng.uniform(1, 3, 30),
                         rng.uniform(-10, 120, 30)])
    qy = np.concatenate([rng.uniform(0, 100, nq - 60),
                         rng.uniform(1, 3, 30),
                         rng.uniform(-10, 120, 30)])
    q = pa.table({"qid": np.arange(nq), "x": qx, "y": qy})
    for k in (1, 7):
        a = state.knn_on_index(path, q, k=k, planner="matrix")
        b = state.knn_on_index(path, q, k=k, planner="rings")
        assert a.reset_index(drop=True).equals(b.reset_index(drop=True)), \
            f"planner mismatch at k={k}"
        brute = ops.knn(ds, q, k=k)
        assert b[["qid", "id"]].reset_index(drop=True).equals(
            brute[["qid", "id"]].reset_index(drop=True))


def test_knn_on_index_rings_k_exceeds_total(ray_session, tmp_path):
    """dk2=inf path through the analytic planner: refine must sweep all
    non-seed partitions exactly once (dense fallback branch)."""
    import ray.data as rd

    t = _mk_points(40, 5)
    ds = rd.from_arrow(t)
    path = str(tmp_path / "idx")
    pipeline.build_partitioned_index(ds, path, base_level=3,
                                     bounds=G.Bounds(0, 0, 100, 100),
                                     target_rows=4)
    q = pa.table({"qid": np.array([0]), "x": np.array([50.0]),
                  "y": np.array([50.0])})
    got = state.knn_on_index(path, q, k=100, planner="rings")
    assert sorted(got["id"].tolist()) == list(range(40))
    want = state.knn_on_index(path, q, k=100, planner="matrix")
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_knn_on_index_nd_rings_vs_matrix(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(13)
    n = 3000
    pts = {c: rng.uniform(0, 50, n) for c in ("x", "y", "z")}
    ds = rd.from_arrow(pa.table({"id": np.arange(n, dtype=np.int64), **pts}))
    path = str(tmp_path / "idx3")
    pipeline.build_partitioned_index_nd(
        ds, path, axes=["x", "y", "z"], base_level=3,
        bounds=G.BoundsND([0, 0, 0], [50, 50, 50]), target_rows=20)
    nq = 60
    q = pa.table({"qid": np.arange(nq),
                  "x": rng.uniform(-5, 55, nq),
                  "y": rng.uniform(-5, 55, nq),
                  "z": rng.uniform(-5, 55, nq)})
    a = state.knn_on_index_nd(path, q, k=5, planner="matrix")
    b = state.knn_on_index_nd(path, q, k=5, planner="rings")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_indexed_knn_rings_vs_matrix_vs_brute(ray_session):
    import ray.data as rd

    t = _mk_points(8000, 17)
    ds = rd.from_arrow(t)
    bounds = G.Bounds(0, 0, 100, 100)
    rng = np.random.default_rng(2)
    nq = 120
    q = pa.table({"qid": np.arange(nq),
                  "x": rng.uniform(-5, 105, nq),
                  "y": rng.uniform(-5, 105, nq)})
    a = ops.indexed_knn(ds, q, k=6, level=5, bounds=bounds, planner="matrix")
    b = ops.indexed_knn(ds, q, k=6, level=5, bounds=bounds, planner="rings")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    brute = ops.knn(ds, q, k=6)
    assert b[["qid", "id"]].reset_index(drop=True).equals(
        brute[["qid", "id"]].reset_index(drop=True))


def test_fallback_rings_straggler_path(ray_session, tmp_path, monkeypatch):
    """Force FALLBACK_RINGS=1 so almost every query takes the dense
    straggler branch in BOTH passes — results must stay exact."""
    import ray.data as rd

    monkeypatch.setattr(ringplan, "FALLBACK_RINGS", 1)
    t = _mk_points(2000, 23)
    ds = rd.from_arrow(t)
    path = str(tmp_path / "idx")
    pipeline.build_partitioned_index(ds, path, base_level=4,
                                     bounds=G.Bounds(0, 0, 100, 100),
                                     target_rows=30)
    rng = np.random.default_rng(3)
    nq = 50
    q = pa.table({"qid": np.arange(nq), "x": rng.uniform(0, 100, nq),
                  "y": rng.uniform(0, 100, nq)})
    got = state.knn_on_index(path, q, k=4, planner="rings")
    want = ops.knn(ds, q, k=4)
    assert got[["qid", "id"]].reset_index(drop=True).equals(
        want[["qid", "id"]].reset_index(drop=True))
    np.testing.assert_array_equal(got["dist2"].to_numpy(),
                                  want["dist2"].to_numpy())


def test_planner_memory_bounded_by_rings():
    """The planning data structures must not allocate O(Q*M): directory
    with 65k cells, 1k queries — peak planner allocations tracked via
    tracemalloc stay far below the 0.5 GB a dense f64 matrix would
    need."""
    import tracemalloc

    rng = np.random.default_rng(1)
    n_cells = 256 * 256
    lvl = 8
    cx, cy = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    ids = G.pack(cx.ravel(), cy.ravel(), lvl)
    w = 100.0 / 256
    lox = cx.ravel() * w
    loy = cy.ravel() * w
    lo = np.c_[lox, loy]
    up = lo + w
    counts = np.full(n_cells, 50, dtype=np.int64)
    dirx = ringplan.GridDirectory(ids, counts, lo, up,
                                  np.array([0.0, 0.0]),
                                  np.array([100.0, 100.0]), 2)
    nq = 1000
    qc = np.stack([rng.uniform(0, 100, nq), rng.uniform(0, 100, nq)], axis=1)
    tracemalloc.start()
    qi, pi, r_stop = ringplan.plan_seed(dirx, qc, 10)
    dk2 = np.full(nq, (2 * w) ** 2)
    qi2, pi2 = ringplan.plan_refine(dirx, qc, 10, dk2, r_stop=r_stop)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    dense_bytes = nq * n_cells * 8
    assert peak < dense_bytes / 10, (peak, dense_bytes)
    # sanity: every query seeded at least k rows' worth of partitions
    assert len(qi) >= nq
    assert (np.bincount(qi, minlength=nq) >= 1).all()


def test_rings_vs_matrix_out_of_grid_queries(ray_session, dense_index):
    """Adversarial query distribution: most queries far OUTSIDE the
    data extent (clipped owners, distance-disordered ring covers) —
    the case that exploded the refine annulus before the exact-ub seed
    + matrix-delegated fallback. Results must stay bit-identical and
    the rings refine must route (near) nothing."""
    path, _ = dense_index
    rng = np.random.default_rng(17)
    qn = 256
    q = pa.table({"qid": np.arange(qn),
                  "x": rng.uniform(-500.0, 1500.0, qn),
                  "y": rng.uniform(-500.0, 1500.0, qn)})
    a = state.knn_on_index(path, q, k=7, planner="matrix")
    b = state.knn_on_index(path, q, k=7, planner="rings")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_knn_on_index_nd_auto_routes_rings_at_4096_cells(ray_session, tmp_path):
    """3-d index with >= ANALYTIC_MIN_PARTS live cells: planner='auto'
    provably takes the analytic ring path (the threshold is on live
    partition count) and stays bit-identical to the forced matrix —
    the n-d twin of the 2-d cross-planner pin, at the scale where the
    dense (query x partition) matrix starts to hurt."""
    import ray.data as rd

    rng = np.random.default_rng(21)
    n = 70_000
    pts = {c: rng.uniform(0, 64, n) for c in ("x", "y", "z")}
    ds = rd.from_arrow(pa.table({"id": np.arange(n, dtype=np.int64), **pts}))
    path = str(tmp_path / "idx3d_4096")
    pipeline.build_partitioned_index_nd(
        ds, path, axes=["x", "y", "z"], base_level=4,
        bounds=G.BoundsND([0, 0, 0], [64, 64, 64]), target_rows=2000)
    man = pipeline.load_manifest(path)
    assert len(man["partitions"]) >= state.ANALYTIC_MIN_PARTS, (
        "fixture must trip the auto->rings threshold")
    nq = 50
    q = pa.table({"qid": np.arange(nq),
                  "x": rng.uniform(-5, 70, nq),   # incl. out-of-grid
                  "y": rng.uniform(-5, 70, nq),
                  "z": rng.uniform(-5, 70, nq)})
    a = state.knn_on_index_nd(path, q, k=5, planner="matrix")
    b = state.knn_on_index_nd(path, q, k=5, planner="auto")
    c = state.knn_on_index_nd(path, q, k=5, planner="rings")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert a.reset_index(drop=True).equals(c.reset_index(drop=True))
