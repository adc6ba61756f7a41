"""Point-in-polygon: ray-cast kernel vs convex half-plane oracle, plus
the full POLY-span Dataset path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geograft import kernels as K
from geograft import ops, synth


def convex_contains(verts: np.ndarray, p: np.ndarray) -> bool:
    """Half-plane oracle for CCW convex polygons (strict interior)."""
    n = len(verts)
    for i in range(n):
        a, b = verts[i], verts[(i + 1) % n]
        cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        if cross <= 0:
            return False
    return True


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(3, 10))
def test_raycast_matches_convex_oracle(seed, nv):
    rng = np.random.default_rng(seed)
    # CCW convex polygon: distinct sorted angles on a circle (inscribed
    # polygons are always convex; random per-vertex radii are not!)
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    if np.min(np.diff(ang)) < 1e-3:
        return
    rad = rng.uniform(0.5, 2.0)
    verts = np.c_[np.cos(ang) * rad, np.sin(ang) * rad]
    p = rng.uniform(-2.5, 2.5, 2)
    # skip points within eps of any edge (boundary convention differs)
    d2 = K.line_distance_2(verts, np.roll(verts, -1, axis=0), p)
    if d2.min() < 1e-6:
        return
    got = K.poly_contains_point(verts, np.array([0, nv]), p)[0]
    want = convex_contains(verts, p)
    assert got == want


def test_raycast_multiple_polys():
    # unit square + far triangle, batched in one flat array
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    tri = np.array([[10, 10], [11, 10], [10, 11]], dtype=float)
    flat = np.vstack([sq, tri])
    offsets = np.array([0, 4, 7])
    np.testing.assert_array_equal(
        K.poly_contains_point(flat, offsets, [0.5, 0.5]), [True, False]
    )
    np.testing.assert_array_equal(
        K.poly_contains_point(flat, offsets, [10.2, 10.2]), [False, True]
    )
    np.testing.assert_array_equal(
        K.poly_contains_point(flat, offsets, [5.0, 5.0]), [False, False]
    )


def test_raycast_empty_ring_does_not_corrupt_neighbor():
    # regression: an empty ring between polygons must not clobber the
    # previous ring's closing edge
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    tri = np.array([[10, 10], [11, 10], [10, 11]], dtype=float)
    flat = np.vstack([sq, tri])
    offsets = np.array([0, 4, 4, 7])  # square, EMPTY, triangle
    got = K.poly_contains_point(flat, offsets, [0.5, 0.5])
    np.testing.assert_array_equal(got, [True, False, False])
    got = K.poly_contains_point(flat, offsets, [10.2, 10.2])
    np.testing.assert_array_equal(got, [False, False, True])


def test_parse_poly_drops_malformed_without_corrupting_rest():
    # regression: an odd-coordinate span must not shift x/y striding of
    # later well-formed polygons
    import pyarrow as pa_

    spans = pa_.table({
        "doc_id": ["a", "b", "c"],
        "span_idx": pa_.array([0, 0, 0], type=pa_.int32()),
        "kind": ["geo", "geo", "geo"],
        "text": [
            "POLY(0.0 0.0 1.0 0.0 1.0 1.0)",      # fine triangle
            "POLY(1.0 2.0 3.0)",                   # malformed (odd)
            "POLY(5.0 5.0 6.0 5.0 6.0 6.0)",      # fine triangle
        ],
        "media_ref": ["", "", ""],
        "offset": pa_.array([0, 0, 0], type=pa_.int32()),
    })
    out = ops.parse_poly_spans(spans).to_pandas()
    assert out["doc_id"].tolist() == ["a", "c"]
    c = out[out["doc_id"] == "c"].iloc[0]
    assert (c.minx, c.miny, c.maxx, c.maxy) == (5.0, 5.0, 6.0, 6.0)


def test_poly_span_pipeline(ray_session, sf_small):
    import duckdb
    import ray.data as rd

    events = pq.read_table(f"{sf_small}/events.parquet")
    docs = synth.docs_from_events_polys(events)
    ds = rd.from_arrow(docs)
    polys = ds.map_batches(
        lambda b: ops.parse_poly_spans(ops.explode_spans(b)),
        batch_format="pyarrow", batch_size=None,
    )
    px, py = 100.0, 10.5
    got = ops.locate_polys_at_point(polys, px, py).to_pandas()
    # triangle (v,u),(v+30,u),(v,u+5): the half-plane oracle in SQL
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_small}/events.parquet')")
    want = con.sql(f"""
        SELECT 'd' || lpad(CAST(event_id AS VARCHAR), 10, '0') AS doc_id
        FROM events
        WHERE 30.0*({py} - user_id) > 0
          AND (-30.0*({py} - user_id) - 5.0*({px} - value - 30.0)) > 0
          AND 5.0*({px} - value) > 0
        ORDER BY 1
    """).df()["doc_id"].to_numpy()
    got_ids = np.sort(got["doc_id"].to_numpy())
    # strict-interior SQL oracle vs half-open ray cast can only disagree
    # exactly ON an edge; the fixture has no such points
    np.testing.assert_array_equal(got_ids, want)
    assert len(want) > 0
