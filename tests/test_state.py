"""Actor-pool index serving vs raw-scan oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from geograft import fixtures as FX
from geograft import ops, pipeline, state


@pytest.fixture(scope="module")
def built_index(ray_session, sf_small, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idx") / "points")
    pipeline.build_partitioned_index(
        FX.points_ds(sf_small), path, base_level=4, bounds=FX.POINTS_BOUNDS
    )
    return path


def test_query_index_batch_vs_raw(ray_session, sf_small, built_index):
    rng = np.random.default_rng(5)
    nq = 30
    bx = rng.uniform(0, 300, nq)
    by = rng.uniform(0, 12, nq)
    boxes = pa.table({"box_id": np.arange(nq), "minx": bx, "miny": by,
                      "maxx": bx + 30.0, "maxy": by + 3.0})
    got = state.query_index_batch(built_index, boxes).to_pandas()
    want = ops.locate_in_envelope_multi(FX.points_ds(sf_small), boxes).to_pandas()
    gs = set(zip(got["qid"], got["id"]))
    ws = set(zip(want["box_id"], want["id"]))
    assert gs == ws
    assert len(gs) > 0


def test_knn_on_index_vs_brute(ray_session, sf_small, built_index):
    rng = np.random.default_rng(9)
    nq = 50
    q = pa.table({"qid": np.arange(nq), "x": rng.uniform(0, 400, nq),
                  "y": rng.uniform(0, 15, nq)})
    got = state.knn_on_index(built_index, q, k=6)
    want = ops.knn(FX.points_ds(sf_small), q, k=6)
    assert got[["qid", "id"]].reset_index(drop=True).equals(
        want[["qid", "id"]].reset_index(drop=True)
    )
    np.testing.assert_array_equal(got["dist2"].to_numpy(), want["dist2"].to_numpy())


def test_knn_index_batch_vs_brute(ray_session, sf_small, built_index):
    rng = np.random.default_rng(6)
    nq = 40
    q = pa.table({"qid": np.arange(nq), "x": rng.uniform(0, 400, nq),
                  "y": rng.uniform(0, 15, nq)})
    got = state.knn_index_batch(built_index, q, k=5)
    want = ops.knn(FX.points_ds(sf_small), q, k=5)
    assert got[["qid", "id"]].reset_index(drop=True).equals(
        want[["qid", "id"]].reset_index(drop=True)
    )
    np.testing.assert_array_equal(got["dist2"].to_numpy(), want["dist2"].to_numpy())


def test_at_point_and_within_distance_on_index(ray_session, sf_small, built_index):
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_small}/events.parquet')")
    # (185.22, 13) is event 0 of the sf0.001 fixture
    pts = pa.table({"pid": [0, 1], "x": [185.22, 999.0], "y": [13.0, 999.0]})
    got = state.query_index_at_point(built_index, pts).to_pandas()
    want = con.sql(
        "SELECT event_id FROM events WHERE value = 185.22 AND user_id = 13 ORDER BY event_id"
    ).df()["event_id"].to_numpy()
    assert len(want) >= 1
    np.testing.assert_array_equal(
        np.sort(got[got["qid"] == 0]["id"].to_numpy()), want
    )
    assert (got["qid"] == 1).sum() == 0

    discs = pa.table({"qid": [0], "x": [50.0], "y": [8.0], "r2": [400.0]})
    got = state.query_index_within_distance(built_index, discs).to_pandas()
    want = con.sql(
        "SELECT event_id FROM events WHERE (value-50)*(value-50) + (user_id-8)*(user_id-8) <= 400 ORDER BY event_id"
    ).df()["event_id"].to_numpy()
    np.testing.assert_array_equal(np.sort(got["id"].to_numpy()), want)
    assert len(want) > 0


def test_knn_tie_break_by_id_through_all_paths(ray_session, tmp_path):
    """k-th-slot distance ties must resolve by smallest id in EVERY kNN
    path (brute, indexed, on-index) — the reference leaves tie order
    unspecified; the engine pins (dist2, id)."""
    import ray.data as rd

    # 30 points all at the same location + a few decoys: every distance
    # ties, so top-3 must be ids 0,1,2 exactly
    n = 30
    x = np.full(n, 0.5)
    y = np.full(n, 0.5)
    x = np.concatenate([x, [10.0, 11.0]])
    y = np.concatenate([y, [10.0, 11.0]])
    ids = np.arange(len(x), dtype=np.int64)
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(x))  # scramble storage order
    t = pa.table({"id": ids[perm], "x": x[perm], "y": y[perm],
                  "minx": x[perm], "miny": y[perm],
                  "maxx": x[perm], "maxy": y[perm]})
    ds = rd.from_arrow(t)
    from geograft import grid as G

    bounds = G.Bounds(0, 0, 20, 20)
    q = pa.table({"qid": [0], "x": [0.5], "y": [0.5]})

    brute = ops.knn(ds, q, k=3)
    np.testing.assert_array_equal(brute["id"].to_numpy(), [0, 1, 2])

    idx2 = ops.indexed_knn(ds, q, k=3, level=3, bounds=bounds)
    np.testing.assert_array_equal(idx2["id"].to_numpy(), [0, 1, 2])

    path = str(tmp_path / "tieidx")
    pipeline.build_partitioned_index(ds, path, base_level=3, bounds=bounds)
    oni = state.knn_on_index(path, q, k=3)
    np.testing.assert_array_equal(oni["id"].to_numpy(), [0, 1, 2])
    served = state.knn_index_batch(path, q, k=3)
    np.testing.assert_array_equal(served["id"].to_numpy(), [0, 1, 2])


def test_partition_cache_loads_once(built_index):
    # drive the actor class directly: same cell queried twice -> one load
    pq_actor = state.PartitionQuerier(built_index)
    man = pipeline.load_manifest(built_index)
    cid = int(next(iter(man["partitions"])))
    p = man["partitions"][str(cid)]
    batch = pa.table({
        "cell_id": np.array([cid, cid], dtype=np.int64),
        "qid": np.array([0, 1], dtype=np.int64),
        "minx": [p["minx"], p["minx"]], "miny": [p["miny"], p["miny"]],
        "maxx": [p["maxx"], p["maxx"]], "maxy": [p["maxy"], p["maxy"]],
        "mode": np.array([0, 0], dtype=np.int8),
    })
    out1 = pq_actor(batch)
    assert pq_actor.loads == 1
    out2 = pq_actor(batch)
    assert pq_actor.loads == 1, "tree cached across batches"
    assert out1.num_rows == out2.num_rows == 2 * p["rows"]


def test_knn_seed_refine_boundary_and_ties(ray_session, tmp_path):
    """Seed+refine planner exactness where it can actually fail: the
    true kNN set spans a partition border (refine pass must fire) and
    an equal-distance tie sits in a NEIGHBOR cell (dk2 comparison must
    be inclusive so the id tie-break can displace a seed-cell row)."""
    import pandas as pd
    import ray.data as rd

    from geograft import grid as G
    from geograft import ops, pipeline

    # 4x4 grid over [0,16]^2; dense cluster just LEFT of the x=4.0
    # border, query just RIGHT of it, plus an exact-distance tie pair
    xs = np.concatenate([np.full(20, 3.9), [4.3], [4.7]])
    ys = np.concatenate([np.linspace(0.5, 3.5, 20), [1.0], [2.0]])
    ids = np.arange(len(xs), dtype=np.int64)
    ds = rd.from_arrow(__import__("pyarrow").table(
        {"id": ids, "x": xs, "y": ys,
         "minx": xs, "miny": ys, "maxx": xs, "maxy": ys}))
    bounds = G.Bounds(0.0, 0.0, 16.0, 16.0)
    path = str(tmp_path / "idx")
    pipeline.build_partitioned_index(ds, path, base_level=2, bounds=bounds,
                                     target_rows=1000)
    # qid 0 sits 0.2 right of the border with its 5-NN set in the LEFT
    # cell; qid 1 is equidistant (0.2^2 + 0.5^2) from ids 20 and 21
    q = pa.table({"qid": np.array([0, 1]),
                  "x": np.array([4.1, 4.5]),
                  "y": np.array([2.0, 1.5])})
    got = state.knn_on_index(path, q, k=5)
    want = ops.knn(ds, q, k=5)
    assert got[["qid", "id"]].reset_index(drop=True).equals(
        want[["qid", "id"]].reset_index(drop=True))
    np.testing.assert_array_equal(got["dist2"].to_numpy(),
                                  want["dist2"].to_numpy())
    # the border query's answer must include left-cell points (i.e. the
    # refine pass genuinely crossed the partition border)
    q0 = got[got["qid"] == 0]
    assert (np.abs(3.9 - 4.1) ** 2 <= q0["dist2"].max() + 1e-12)
    assert set(q0["id"]).intersection(set(range(20)))


def test_knn_k_exceeds_total_rows_no_duplicates(ray_session, tmp_path):
    """k >= total live rows: dk2 stays +inf after the seed pass, and the
    refine pass must NOT re-admit seed partitions (inf <= inf) — each
    (qid, id) appears exactly once, matching the reference's k-or-all
    semantics (nearest_neighbor_iter yields each element once). Covers
    both the 2-d and n-d planners."""
    import ray.data as rd

    from geograft import grid as G
    from geograft import ops, pipeline

    # 5 points spread across a 2x2 grid so multiple partitions exist
    xs = np.array([1.0, 3.0, 9.0, 11.0, 15.0])
    ys = np.array([1.0, 9.0, 2.0, 12.0, 15.0])
    ids = np.arange(len(xs), dtype=np.int64)
    ds = rd.from_arrow(pa.table(
        {"id": ids, "x": xs, "y": ys,
         "minx": xs, "miny": ys, "maxx": xs, "maxy": ys}))
    bounds = G.Bounds(0.0, 0.0, 16.0, 16.0)
    path = str(tmp_path / "idx2d")
    pipeline.build_partitioned_index(ds, path, base_level=1, bounds=bounds)
    q = pa.table({"qid": np.array([0, 1]), "x": np.array([2.0, 14.0]),
                  "y": np.array([2.0, 14.0])})
    got = state.knn_on_index(path, q, k=10)
    # every query returns ALL 5 points exactly once
    for qv in (0, 1):
        sub = got[got["qid"] == qv]
        assert sorted(sub["id"].tolist()) == list(range(5)), sub
    want = ops.knn(ds, q, k=10)
    assert got[["qid", "id"]].reset_index(drop=True).equals(
        want[["qid", "id"]].reset_index(drop=True))

    # n-d twin (3-d index, same k > total condition)
    zs = np.array([1.0, 5.0, 9.0, 13.0, 15.0])
    ds3 = rd.from_arrow(pa.table(
        {"id": ids, "x": xs, "y": ys, "z": zs}))
    b3 = G.BoundsND([0.0, 0.0, 0.0], [16.0, 16.0, 16.0])
    path3 = str(tmp_path / "idx3d")
    pipeline.build_partitioned_index_nd(ds3, path3, axes=["x", "y", "z"],
                                        base_level=1, bounds=b3)
    q3 = pa.table({"qid": np.array([0]), "x": np.array([2.0]),
                   "y": np.array([2.0]), "z": np.array([2.0])})
    got3 = state.knn_on_index_nd(path3, q3, k=10)
    assert sorted(got3["id"].tolist()) == list(range(5)), got3


def test_knn_refine_f32_margin_large_coords(ray_session, tmp_path):
    """The planner's float32 radius test must stay SOUND when the true
    kth distance is tiny relative to coordinate magnitude (f32 error in
    mind2 is absolute, ~eps32*|coord|): nearest neighbors sit just
    across a partition border, closer than f32 resolution at this
    magnitude, and must still be found exactly."""
    import ray.data as rd

    from geograft import grid as G
    from geograft import ops, pipeline

    base = 1.0e6
    # cluster around the border x=base (2x2 grid over [0, 2*base]^2):
    # query at base+0.004, true NN at base-0.001 (other side), then
    # filler points so each side has >= k rows
    xs = np.concatenate([
        [base - 0.001, base - 0.002, base + 0.01],
        base - 1.0 - np.arange(10.0),      # left filler
        base + 1.0 + np.arange(10.0),      # right filler
    ])
    ys = np.full(len(xs), 5.0)
    ids = np.arange(len(xs), dtype=np.int64)
    ds = rd.from_arrow(pa.table(
        {"id": ids, "x": xs, "y": ys,
         "minx": xs, "miny": ys, "maxx": xs, "maxy": ys}))
    bounds = G.Bounds(0.0, 0.0, 2.0 * base, 2.0 * base)
    path = str(tmp_path / "idx")
    pipeline.build_partitioned_index(ds, path, base_level=1, bounds=bounds,
                                     target_rows=1000)
    q = pa.table({"qid": np.array([0]), "x": np.array([base + 0.004]),
                  "y": np.array([5.0])})
    got = state.knn_on_index(path, q, k=3)
    want = ops.knn(ds, q, k=3)
    assert got[["qid", "id"]].reset_index(drop=True).equals(
        want[["qid", "id"]].reset_index(drop=True))
    np.testing.assert_array_equal(got["dist2"].to_numpy(),
                                  want["dist2"].to_numpy())
    assert 0 in set(got["id"]) and 1 in set(got["id"])  # crossed the border
