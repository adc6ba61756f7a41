"""Cell grid invariants: pack/unpack round-trips, envelope containment,
covering-cell completeness, owner-cell uniqueness, adaptive levels."""

from __future__ import annotations

import numpy as np

from geograft import grid as G
from geograft import kernels as K


def test_pack_unpack_roundtrip(rng):
    for level in (0, 1, 5, 12, G.MAX_LEVEL):
        n = 1 << level
        cx = rng.integers(0, n, 200)
        cy = rng.integers(0, n, 200)
        cid = G.pack(cx, cy, level)
        rx, ry, rl = G.unpack(cid)
        np.testing.assert_array_equal(rx, cx)
        np.testing.assert_array_equal(ry, cy)
        assert (rl == level).all()


def test_levels_never_collide(rng):
    # same morton coords at different levels -> different ids
    a = G.pack(np.array([3]), np.array([5]), 4)
    b = G.pack(np.array([3]), np.array([5]), 7)
    assert a[0] != b[0]


def test_point_in_own_cell_envelope(rng):
    x = rng.uniform(0, 1, 1000)
    y = rng.uniform(0, 1, 1000)
    cid = G.cell_of_points(x, y, 6)
    minx, miny, maxx, maxy = G.cell_envelope(cid)
    assert ((x >= minx) & (x < maxx) & (y >= miny) & (y < maxy)).all()


def test_covering_cells_complete(rng):
    level = 5
    for _ in range(20):
        q = np.sort(rng.uniform(0, 1, 2))
        r = np.sort(rng.uniform(0, 1, 2))
        cells = G.covering_cells(q[0], r[0], q[1], r[1], level)
        # every random point inside the box falls in a covered cell
        px = rng.uniform(q[0], q[1], 200)
        py = rng.uniform(r[0], r[1], 200)
        pc = G.cell_of_points(px, py, level)
        assert np.isin(pc, cells).all()
        # and every covered cell's envelope intersects the box
        minx, miny, maxx, maxy = G.cell_envelope(cells)
        inter = K.env_intersects(
            np.c_[minx, miny], np.c_[maxx, maxy],
            np.array([[q[0], r[0]]]), np.array([[q[1], r[1]]]),
        )
        assert inter.all()


def test_replication_and_owner_rule(rng):
    level = 4
    n = 500
    minx = rng.uniform(0, 0.9, n)
    miny = rng.uniform(0, 0.9, n)
    maxx = minx + rng.uniform(0, 0.3, n)
    maxy = miny + rng.uniform(0, 0.3, n)
    rows, cells = G.covering_cells_of_envelopes(minx, miny, maxx, maxy, level)
    owners = G.owner_cell(minx, miny, level)
    # each envelope appears in >= 1 cell and exactly one of them is the owner
    for i in range(0, n, 37):
        mine = cells[rows == i]
        assert len(mine) >= 1
        assert (mine == owners[i]).sum() == 1
        # replication matches the meshgrid ground truth
        want = G.covering_cells(minx[i], miny[i], maxx[i], maxy[i], level)
        np.testing.assert_array_equal(np.sort(mine), np.sort(want))


def test_cell_min_dist2_is_lower_bound(rng):
    level = 4
    x = rng.uniform(0, 1, 2000)
    y = rng.uniform(0, 1, 2000)
    cid = G.cell_of_points(x, y, level)
    qx, qy = 0.31, 0.77
    lb = G.cell_min_dist2(cid, qx, qy)
    actual = (x - qx) ** 2 + (y - qy) ** 2
    assert (lb <= actual + 1e-15).all()


def test_children_parent(rng):
    cid = G.pack(np.array([3]), np.array([5]), 4)
    kids = G.children(cid)
    assert len(kids) == 4
    assert (G.parent(kids) == cid[0]).all()
    # children tile the parent envelope exactly
    pminx, pminy, pmaxx, pmaxy = G.cell_envelope(cid)
    kminx, kminy, kmaxx, kmaxy = G.cell_envelope(kids)
    assert kminx.min() == pminx[0] and kmaxx.max() == pmaxx[0]
    assert kminy.min() == pminy[0] and kmaxy.max() == pmaxy[0]


def test_children_mixed_levels():
    """children() must compute the child level PER ROW — mixed-level
    inputs coexist under adaptive skew splitting."""
    import numpy as np

    from geograft import grid as G

    a = G.pack(np.array([1]), np.array([2]), 3)
    b = G.pack(np.array([0]), np.array([1]), 5)
    kids = G.children(np.concatenate([a, b]))
    cx, cy, lvl = G.unpack(kids)
    # two parents x 4 children, interleaved parent-major per (dx, dy)
    assert sorted(lvl.tolist()) == [4, 4, 4, 4, 6, 6, 6, 6]
    for k, want_lvl, pcx, pcy in [(0, 4, 1, 2), (1, 6, 0, 1)]:
        m = lvl == want_lvl
        assert set(zip(cx[m].tolist(), cy[m].tolist())) == {
            (pcx * 2 + dx, pcy * 2 + dy) for dx in (0, 1) for dy in (0, 1)
        }


def test_nd_pack_enumerate_round_trip():
    """3-d Morton pack is injective per level; covering-cell enumeration
    matches the brute-force cross product."""
    import numpy as np

    from geograft import grid as G

    rng = np.random.default_rng(5)
    b = G.BoundsND([0.0, 0.0, 0.0], [1.0, 1.0, 1.0])
    pts = rng.uniform(0, 1, (500, 3))
    ids = G.cell_of_points_nd(pts, 4, b)
    cc = G.cell_coords_nd(pts, 4, b)
    # injective: equal ids <=> equal integer cells
    seen = {}
    for i, cid in enumerate(ids):
        key = tuple(cc[i])
        if cid in seen:
            assert seen[cid] == key
        else:
            seen[cid] = key
    # enumeration vs brute force
    c0 = np.array([[1, 2, 3], [0, 0, 0]])
    c1 = np.array([[2, 4, 3], [1, 1, 1]])
    rows, cells = G.enumerate_cell_ranges_nd(c0, c1)
    got = {(int(r), tuple(c)) for r, c in zip(rows, cells)}
    want = set()
    for r in range(2):
        for i in range(c0[r, 0], c1[r, 0] + 1):
            for j in range(c0[r, 1], c1[r, 1] + 1):
                for k in range(c0[r, 2], c1[r, 2] + 1):
                    want.add((r, (i, j, k)))
    assert got == want


def test_nd_join_exactly_once_on_cell_boundaries(ray_session):
    """A 3-d pair overlapping in several cells is reported exactly once
    (owner-cell rule in d dims)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geograft import grid as G
    from geograft import ops

    b = G.BoundsND([0.0, 0.0, 0.0], [8.0, 8.0, 8.0])
    # one big left box spanning many level-2 cells, several right boxes
    left = pa.table({"id": np.array([1], dtype=np.int64),
                     "minx": [0.5], "miny": [0.5], "minz": [0.5],
                     "maxx": [6.5], "maxy": [6.5], "maxz": [6.5]})
    rng = np.random.default_rng(7)
    lo = rng.uniform(0, 7, (50, 3))
    right = pa.table({"id": np.arange(100, 150, dtype=np.int64),
                      "minx": lo[:, 0], "miny": lo[:, 1], "minz": lo[:, 2],
                      "maxx": lo[:, 0] + 1.0, "maxy": lo[:, 1] + 1.0,
                      "maxz": lo[:, 2] + 1.0})
    out = ops.spatial_join_nd(
        rd.from_arrow(left), rd.from_arrow(right),
        ["minx", "miny", "minz"], ["maxx", "maxy", "maxz"],
        level=2, bounds=b,
    ).to_pandas()
    # brute force
    want = set()
    for i in range(50):
        if (lo[i] <= 6.5).all() and (lo[i] + 1.0 >= 0.5).all():
            want.add((1, 100 + i))
    got = list(zip(out["left_id"], out["right_id"]))
    assert len(got) == len(set(got)), "duplicate pair reported"
    assert set(got) == want
