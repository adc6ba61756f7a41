"""Custom-geometry registry (geom.py) — the RTreeObject/PointDistance
extension surface (rstar/src/object.rs:83-200), validated with the
reference's own Circle worked example (object.rs:100-153) against numpy
brute force, through the full Dataset operators (so the registry
snapshot provably reaches Ray worker processes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from geograft import geom, ops


@pytest.fixture()
def circles(rng):
    n = 400
    cx = rng.uniform(0, 100, n)
    cy = rng.uniform(0, 100, n)
    r = rng.uniform(0.5, 8.0, n)
    return pa.table(
        {
            "id": np.arange(n, dtype=np.int64),
            "minx": cx - r, "miny": cy - r,
            "maxx": cx + r, "maxy": cy + r,
            "geom_kind": pa.array(["circle"] * n),
            "x0": cx, "y0": cy, "x1": r, "y1": np.zeros(n),
        }
    )


@pytest.fixture()
def registered():
    geom.register_circle()
    yield
    geom.unregister_geometry("circle")


def _brute_d(circles, qx, qy):
    cx = circles.column("x0").to_numpy()
    cy = circles.column("y0").to_numpy()
    r = circles.column("x1").to_numpy()
    # same FP order as circle_distance_2 (and the SQL oracle):
    # sqrt(dx*dx + dy*dy) - r, clamped — NOT np.hypot, which is more
    # accurate and diverges in the last ulp
    dx = qx - cx
    dy = qy - cy
    d = np.sqrt(dx * dx + dy * dy) - r
    return np.maximum(d, 0.0)


def test_register_builtin_rejected():
    with pytest.raises(ValueError):
        geom.register_geometry("point", lambda b, m, q: None)


def test_registry_snapshot_is_a_copy(registered):
    snap = geom.registry_snapshot()
    geom.unregister_geometry("circle")
    assert "circle" in snap and "circle" not in geom.REGISTRY
    geom.register_circle()


def test_circle_within_distance_matches_brute_force(ray_session, circles, registered):
    import ray

    q = (50.0, 50.0)
    r2 = 100.0
    ds = ray.data.from_arrow(circles).repartition(4)
    got = set(
        ops.locate_within_distance(ds, *q, r2).to_pandas()["id"].to_numpy()
    )
    d = _brute_d(circles, *q)
    want = set(circles.column("id").to_numpy()[d * d <= r2])
    assert got == want
    assert len(want) > 0


def test_circle_contains_point_exact(ray_session, circles, registered):
    import ray

    q = (50.0, 50.0)
    ds = ray.data.from_arrow(circles).repartition(4)
    got = set(ops.locate_all_at_point(ds, *q).to_pandas()["id"].to_numpy())
    cx = circles.column("x0").to_numpy()
    cy = circles.column("y0").to_numpy()
    r = circles.column("x1").to_numpy()
    inside = (q[0] - cx) ** 2 + (q[1] - cy) ** 2 <= r * r
    want = set(circles.column("id").to_numpy()[inside])
    assert got == want
    assert len(want) > 0


def test_default_contains_point_is_distance_leq_zero(ray_session, circles):
    # register WITHOUT an exact contains kernel: the trait-default
    # contains_point = distance_2 <= 0 (object.rs:154-200)
    import ray

    geom.register_geometry("circle", geom.circle_distance_2)
    try:
        q = (50.0, 50.0)
        ds = ray.data.from_arrow(circles).repartition(4)
        got = set(ops.locate_all_at_point(ds, *q).to_pandas()["id"].to_numpy())
        want = set(circles.column("id").to_numpy()[_brute_d(circles, *q) <= 0.0])
        assert got == want
    finally:
        geom.unregister_geometry("circle")


def test_circle_nn_stream_distances(ray_session, circles, registered):
    import ray

    q = (10.0, 90.0)
    ds = ray.data.from_arrow(circles).repartition(4)
    out = ops.nn_stream(ds, *q).to_pandas()
    d = _brute_d(circles, *q)
    want = np.sort(d * d)
    np.testing.assert_array_equal(out["dist2"].to_numpy(), want)
    # stream order is (dist2, id) ascending
    assert out["dist2"].is_monotonic_increasing


def test_unregistered_kind_falls_back_to_envelope(ray_session, circles):
    # without registration the engine treats rows as their envelopes —
    # a circle-corner point inside the box but outside the disc matches
    import ray

    assert "circle" not in geom.REGISTRY
    q = (50.0, 50.0)
    ds = ray.data.from_arrow(circles)
    got = set(ops.locate_all_at_point(ds, *q).to_pandas()["id"].to_numpy())
    lo_x = circles.column("minx").to_numpy()
    lo_y = circles.column("miny").to_numpy()
    hi_x = circles.column("maxx").to_numpy()
    hi_y = circles.column("maxy").to_numpy()
    env = (lo_x <= q[0]) & (q[0] <= hi_x) & (lo_y <= q[1]) & (q[1] <= hi_y)
    want = set(circles.column("id").to_numpy()[env])
    assert got == want


def test_circle_drain_split_is_partition(ray_session, circles, registered):
    import ray

    q = (50.0, 50.0, 64.0)
    ds = ray.data.from_arrow(circles).repartition(4)
    drained, surviving = ops.drain_within_distance(ds, *q)
    got_d = set(drained.to_pandas()["id"].to_numpy())
    got_s = set(surviving.to_pandas()["id"].to_numpy())
    d = _brute_d(circles, q[0], q[1])
    want_d = set(circles.column("id").to_numpy()[d * d <= q[2]])
    assert got_d == want_d
    assert got_d | got_s == set(circles.column("id").to_numpy())
    assert not (got_d & got_s)
