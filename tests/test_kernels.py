"""Kernel oracles — numpy ports vs scalar brute force.

Mirrors the reference's kernel regression tests:
- min_max_dist_2 FP order pinned to corner distance (aabb.rs:277-288)
- empty-AABB merge identity (aabb.rs:256-275)
- closed-bound containment / intersection semantics (aabb.rs:140-165)
"""

from __future__ import annotations

import numpy as np
import pytest

from geograft import kernels as K


def brute_min_max_dist_2(lo, up, p):
    """Scalar re-derivation straight from the published MinMaxDist formula."""
    d = len(p)
    best = np.inf
    for k in range(d):
        total = 0.0
        for i in range(d):
            li, ui = lo[i], up[i]
            near = li if abs(li - p[i]) <= abs(ui - p[i]) else ui
            far = li if abs(li - p[i]) > abs(ui - p[i]) else ui
            total += (near - p[i]) ** 2 if i == k else (far - p[i]) ** 2
        best = min(best, total)
    return best


@pytest.mark.parametrize("d", [2, 3, 4])
def test_min_max_dist_matches_bruteforce(rng, d):
    n = 300
    lo = rng.uniform(-5, 5, (n, d))
    up = lo + rng.uniform(0, 3, (n, d))
    p = rng.uniform(-5, 5, d)
    got = K.env_min_max_dist_2(lo, up, p)
    want = np.array([brute_min_max_dist_2(lo[i], up[i], p) for i in range(n)])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_min_max_dist_corner_regression():
    # mirrors aabb.rs:277-288 — a unit box queried from a corner-ish point:
    # min_max_dist must equal distance to the nearest *face-constrained* corner
    lo = np.array([[0.0, 0.0]])
    up = np.array([[1.0, 1.0]])
    got = K.env_min_max_dist_2(lo, up, np.array([2.0, 2.0]))
    # near face x=1 with far y corner y=0 -> (2-1)^2+(2-0)^2 = 5 ; or near y
    # face with far x corner -> 5. MinMaxDist = 5.
    assert got[0] == 5.0


def test_empty_env_merge_identity():
    elo, eup = K.new_empty_env(2)
    lo = np.array([[0.25, -1.0]])
    up = np.array([[2.0, 3.5]])
    mlo, mup = K.env_merge_all(np.vstack([elo, lo]), np.vstack([eup, up]))
    np.testing.assert_array_equal(mlo, lo)
    np.testing.assert_array_equal(mup, up)


def test_contains_and_intersects_closed_bounds():
    lo = np.array([[0.0, 0.0]])
    up = np.array([[1.0, 1.0]])
    # boundary point is contained (<= / >=)
    assert K.env_contains_point(lo, up, [1.0, 0.0]).all()
    assert not K.env_contains_point(lo, up, [1.0000001, 0.0]).any()
    # touching boxes intersect (rtree.rs:414-416 doc promise)
    assert K.env_intersects(lo, up, np.array([[1.0, 0.0]]), np.array([[2.0, 1.0]])).all()
    assert not K.env_intersects(lo, up, np.array([[1.1, 0.0]]), np.array([[2.0, 1.0]])).any()
    # containment of envelopes
    assert K.env_contains_env(lo, up, np.array([[0.2, 0.0]]), np.array([[1.0, 0.5]])).all()
    assert not K.env_contains_env(lo, up, np.array([[0.2, 0.0]]), np.array([[1.2, 0.5]])).any()


def test_env_distance2_zero_inside_and_clamped_outside(rng):
    lo = rng.uniform(-2, 0, (100, 2))
    up = lo + rng.uniform(0.1, 2, (100, 2))
    inside = (lo + up) / 2
    for i in range(0, 100, 17):
        assert K.env_distance_2(lo[i : i + 1], up[i : i + 1], inside[i])[0] == 0.0
    p = np.array([10.0, 10.0])
    got = K.env_distance_2(lo, up, p)
    want = (10 - up[:, 0]) ** 2 + (10 - up[:, 1]) ** 2
    np.testing.assert_allclose(got, want)


def test_line_distance(rng):
    p1 = np.array([[0.0, 0.0]])
    p2 = np.array([[1.0, 0.0]])
    # beyond the 'to' end clamps to the endpoint (line.rs:87-94)
    assert K.line_distance_2(p1, p2, [2.0, 0.0])[0] == 1.0
    # perpendicular projection inside the segment
    assert K.line_distance_2(p1, p2, [0.5, 2.0])[0] == 4.0
    # degenerate zero-length line = point distance
    assert K.line_distance_2(p1, p1, [0.0, 3.0])[0] == 9.0


def test_area_perimeter_center():
    lo = np.array([[0.0, 1.0]])
    up = np.array([[2.0, 4.0]])
    assert K.env_area(lo, up)[0] == 6.0
    assert K.env_perimeter(lo, up)[0] == 5.0
    np.testing.assert_array_equal(K.env_center(lo, up), [[1.0, 2.5]])
    # inverted box clamps area to 0 (aabb.rs:167-172)
    assert K.env_area(up, lo)[0] == 0.0


def test_env_center_integer_semantics():
    """AABB::center for integer scalars is truncating integer division
    (aabb.rs:205-209), exact over the full int64 range."""
    import numpy as np

    from geograft import kernels as K

    lo = np.array([[0, 2**62], [1, 5]], dtype=np.int64)
    up = np.array([[3, 2**62 + 11], [2, 8]], dtype=np.int64)
    c = K.env_center(lo, up)
    assert c.dtype == np.int64
    np.testing.assert_array_equal(c, [[1, 2**62 + 5], [1, 6]])
    # float path unchanged: true midpoint
    cf = K.env_center(lo.astype(np.float64), up.astype(np.float64))
    np.testing.assert_allclose(cf[1], [1.5, 6.5])


def test_int_box_exact_beyond_2_53(ray_session):
    """Integer envelope comparison is exact past 2^53, where a float64
    cast merges adjacent ints (RTreeNum int parity, point.rs:98-100)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geograft import ops

    base = 2**53
    ix = np.array([base + 100, base + 101, base + 102, base + 103], dtype=np.int64)
    t = pa.table({"id": np.arange(4, dtype=np.int64), "ix": ix,
                  "iy": np.zeros(4, dtype=np.int64)})
    out = ops.locate_in_box_nd(
        rd.from_arrow(t), ["ix", "iy"], [base + 101, 0], [base + 102, 0]
    ).to_pandas()
    # float64 cannot represent base+101/base+103 (spacing 2 past 2^53);
    # a cast would pull id 0 in or push id 1 out
    assert sorted(out["id"]) == [1, 2]


def test_env_center_int64_mixed_sign_extremes():
    """(upper - lower) overflows int64 for mixed-sign extremes; the
    split-halves midpoint must stay exact (floor((l+u)/2)) there."""
    from geograft import kernels as K

    lo = np.array([[-(2**62) - 3, -5, 0, -(2**63) + 1]], dtype=np.int64)
    hi = np.array([[2**62 + 5, 2**62, 2**63 - 1, 2**63 - 1]], dtype=np.int64)
    got = K.env_center(lo, hi)[0]
    want = [(int(l) + int(u)) // 2 for l, u in zip(lo[0], hi[0])]
    assert got.tolist() == want
    # agrees with the old formula where that one was safe
    lo2 = np.array([[3, -9, 2**53 + 1]], dtype=np.int64)
    hi2 = np.array([[8, -2, 2**53 + 4]], dtype=np.int64)
    got2 = K.env_center(lo2, hi2)[0]
    assert got2.tolist() == (lo2 + (hi2 - lo2) // 2)[0].tolist()
