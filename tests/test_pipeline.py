"""Index build / checkpoint-resume / skew / delta-ingest equivalence.

Mirrors the reference's structural + equivalence test strategy:
sanity_check (node.rs:106-155) -> manifest invariants; bulk-load vs
sequential-insert equivalence (bulk_load_sequential.rs:111-151) ->
bulk build vs delta ingest answer the same queries.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from geograft import fixtures as FX
from geograft import grid as G
from geograft import ops, pipeline


@pytest.fixture()
def tmp_index(tmp_path):
    return str(tmp_path / "idx")


def test_build_and_sanity(ray_session, sf_small, tmp_index):
    man = pipeline.build_partitioned_index(
        FX.points_ds(sf_small), tmp_index, base_level=4, bounds=FX.POINTS_BOUNDS
    )
    assert man["total_rows"] == 1000
    assert man["built_cells"] == len(man["partitions"]) > 0
    pipeline.sanity_check_index(tmp_index, expected_rows=1000)


def test_resume_skips_done_cells(ray_session, sf_small, tmp_index):
    man1 = pipeline.build_partitioned_index(
        FX.points_ds(sf_small), tmp_index, base_level=4, bounds=FX.POINTS_BOUNDS
    )
    # simulate a partial run: drop half the partitions from the manifest
    # and delete their files
    with open(os.path.join(tmp_index, pipeline.MANIFEST)) as f:
        man = json.load(f)
    cids = sorted(man["partitions"])
    kept = {c: man["partitions"][c] for c in cids[: len(cids) // 2]}
    for c in cids[len(cids) // 2 :]:
        os.remove(os.path.join(tmp_index, man["partitions"][c]["file"]))
    man["partitions"] = kept
    with open(os.path.join(tmp_index, pipeline.MANIFEST), "w") as f:
        json.dump(man, f)

    man2 = pipeline.build_partitioned_index(
        FX.points_ds(sf_small), tmp_index, base_level=4, bounds=FX.POINTS_BOUNDS
    )
    assert man2["resumed_cells"] == len(kept)
    assert man2["built_cells"] == len(cids) - len(kept)
    assert man2["total_rows"] == man1["total_rows"]
    pipeline.sanity_check_index(tmp_index, expected_rows=1000)


def test_query_on_index_equals_raw(ray_session, sf_small, tmp_index):
    pipeline.build_partitioned_index(
        FX.points_ds(sf_small), tmp_index, base_level=4, bounds=FX.POINTS_BOUNDS
    )
    q = (5.0, 2.0, 100.0, 10.0)
    got_ds = pipeline.query_index_envelope(tmp_index, *q)
    got = np.sort(got_ds.to_pandas()["id"].to_numpy())
    want_ds = ops.locate_in_envelope_intersecting(FX.points_ds(sf_small), *q)
    want = np.sort(want_ds.to_pandas()["id"].to_numpy())
    np.testing.assert_array_equal(got, want)
    assert len(got) > 0


def test_skew_split_bounds_partitions(ray_session, tmp_index):
    # pathological fixture (rtree.rs:134-142): 90% of rows at one point
    import ray.data as rd

    rng = np.random.default_rng(42)
    n = 20000
    x = np.full(n, 0.5)
    y = np.full(n, 0.5)
    spread = rng.uniform(0, 1, (n // 10, 2))
    x[: n // 10] = spread[:, 0]
    y[: n // 10] = spread[:, 1]
    t = pa.table({"id": np.arange(n), "minx": x, "miny": y, "maxx": x, "maxy": y})
    ds = rd.from_arrow(t)
    bounds = G.Bounds(0, 0, 1, 1)
    man = pipeline.build_partitioned_index(
        ds, tmp_index, base_level=2, bounds=bounds, target_rows=2000
    )
    assert man["total_rows"] == n
    pipeline.sanity_check_index(tmp_index, expected_rows=n)
    assert len(man["hot_map"]) >= 1, "hot cell detected and split"
    sizes = [p["rows"] for p in man["partitions"].values()]
    # identical coordinates cannot be split spatially: the duplicate-point
    # cell stays hot; every OTHER partition respects the target
    over = [s for s in sizes if s > 2000]
    assert len(over) <= 1
    assert max(over, default=0) in (0, 18000 + spread.shape[0] - len(spread)) or over[0] >= 18000


def test_checkpointed_spatial_join_resume(ray_session, sf_small, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "pairs")
    man1 = pipeline.checkpointed_spatial_join(
        FX.join_left_ds(sf_small), FX.join_right_ds(sf_small),
        level=4, bounds=FX.JOIN_BOUNDS, out_dir=out,
    )
    want = ops.spatial_join(
        FX.join_left_ds(sf_small), FX.join_right_ds(sf_small),
        level=4, bounds=FX.JOIN_BOUNDS,
    ).to_pandas()
    got = rd.read_parquet(out).to_pandas()
    assert set(zip(got["left_id"], got["right_id"])) == set(
        zip(want["left_id"], want["right_id"])
    )
    assert man1["total_pairs"] == len(want)

    # simulate a partial run: drop half the buckets (manifest + files)
    import json as _json
    import os as _os

    with open(_os.path.join(out, pipeline.MANIFEST)) as f:
        man = _json.load(f)
    keys = sorted(man["buckets"])
    kept = {k: man["buckets"][k] for k in keys[: len(keys) // 2]}
    for k in keys[len(keys) // 2 :]:
        _os.remove(_os.path.join(out, man["buckets"][k]["file"]))
    man["buckets"] = kept
    with open(_os.path.join(out, pipeline.MANIFEST), "w") as f:
        _json.dump(man, f)

    man2 = pipeline.checkpointed_spatial_join(
        FX.join_left_ds(sf_small), FX.join_right_ds(sf_small),
        level=4, bounds=FX.JOIN_BOUNDS, out_dir=out,
    )
    assert man2["resumed_buckets"] == len(kept)
    assert man2["built_buckets"] >= 1
    got2 = rd.read_parquet(out).to_pandas()
    assert set(zip(got2["left_id"], got2["right_id"])) == set(
        zip(want["left_id"], want["right_id"])
    )


def test_skew_index_query_and_delta(ray_session, tmp_path):
    """Adaptive (hot-split) cell ids keep working through query planning
    and delta ingest: envelope answers equal brute force, and delta rows
    land in the adaptive cells the manifest's hot_map dictates."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 8000
    # hot corner: 70% of rows inside [0, .1)^2
    hot = rng.uniform(0, 0.1, (int(n * 0.7), 2))
    cold = rng.uniform(0, 1, (n - len(hot), 2))
    xy = np.vstack([hot, cold])
    t = pa.table({"id": np.arange(n), "minx": xy[:, 0], "miny": xy[:, 1],
                  "maxx": xy[:, 0], "maxy": xy[:, 1]})
    bounds = G.Bounds(0, 0, 1, 1)
    path = str(tmp_path / "skewidx")
    man = pipeline.build_partitioned_index(
        rd.from_arrow(t.slice(0, 7000)), path, base_level=2, bounds=bounds,
        target_rows=1000,
    )
    assert len(man["hot_map"]) >= 1
    pipeline.ingest_delta(path, rd.from_arrow(t.slice(7000)))
    pipeline.sanity_check_index(path, expected_rows=n)
    # query crossing hot and cold regions == brute force
    q = (0.05, 0.05, 0.5, 0.5)
    got = np.sort(
        pipeline.query_index_envelope(path, *q).to_pandas()["id"].to_numpy()
    )
    want = np.nonzero(
        (xy[:, 0] >= q[0]) & (xy[:, 0] <= q[2]) & (xy[:, 1] >= q[1]) & (xy[:, 1] <= q[3])
    )[0]
    np.testing.assert_array_equal(got, want)


def test_delta_ingest_equals_bulk(ray_session, sf_small, tmp_path):
    import ray.data as rd

    full = FX.points_ds(sf_small).to_pandas()
    head = pa.Table.from_pandas(full.iloc[:800], preserve_index=False)
    tail = pa.Table.from_pandas(full.iloc[800:], preserve_index=False)

    inc_path = str(tmp_path / "inc")
    bulk_path = str(tmp_path / "bulk")
    pipeline.build_partitioned_index(
        rd.from_arrow(head), inc_path, base_level=4, bounds=FX.POINTS_BOUNDS
    )
    pipeline.ingest_delta(inc_path, rd.from_arrow(tail))
    pipeline.build_partitioned_index(
        FX.points_ds(sf_small), bulk_path, base_level=4, bounds=FX.POINTS_BOUNDS
    )
    pipeline.sanity_check_index(inc_path, expected_rows=1000)

    # equivalence contract: same query answers from both indexes
    for q in [(5.0, 2.0, 100.0, 10.0), (0.0, 0.0, 400.0, 15.0)]:
        a = np.sort(pipeline.query_index_envelope(inc_path, *q).to_pandas()["id"].to_numpy())
        b = np.sort(pipeline.query_index_envelope(bulk_path, *q).to_pandas()["id"].to_numpy())
        np.testing.assert_array_equal(a, b)


def test_selection_function_planner_prune(ray_session, tmp_path, sf_small):
    """Both halves of the SelectionFunction protocol against a built
    index (selection_functions.rs:23-37): prune_partition must cut the
    files read; results equal the unpruned scan."""
    import numpy as np

    from geograft import fixtures as FX
    from geograft import pipeline as P

    path = str(tmp_path / "idx")
    P.build_partitioned_index(
        FX.points_ds(sf_small), path, base_level=3, bounds=FX.POINTS_BOUNDS
    )

    sel_x = 60.0

    def keep_rows(b):
        return b.column("minx").to_numpy() < sel_x

    def prune(lo, up):
        # a partition can only contain minx < sel_x rows if its own
        # envelope starts left of sel_x
        return lo[:, 0] < sel_x

    ds_p, n_read, n_total = P.query_index_with_selection_function(
        path, keep_rows, prune_partition=prune
    )
    ds_full, n_read_full, _ = P.query_index_with_selection_function(path, keep_rows)
    assert n_read < n_total, "prune did not skip any partition"
    assert n_read_full == n_total
    got = np.sort(ds_p.to_pandas()["id"].to_numpy())
    want = np.sort(ds_full.to_pandas()["id"].to_numpy())
    np.testing.assert_array_equal(got, want)
    assert len(got) > 0


def test_nd_index_build_query_resume(ray_session, sf_small, tmp_path):
    # 3-d persisted index: build + sanity + box/disc queries vs brute
    # force + resume skip (dimension-generic counterpart of the 2-d
    # build, point.rs:295-323)
    import ray.data as rd

    path = str(tmp_path / "idx3")
    pts = FX.points3d_ds(sf_small)
    man = pipeline.build_partitioned_index_nd(
        pts, path, ["x", "y", "z"], base_level=1, bounds=FX.POINTS3D_BOUNDS,
        target_rows=100,
    )
    pipeline.sanity_check_index_nd(path, expected_rows=pts.count())
    assert man["axes"] == ["x", "y", "z"]
    assert man["hot_map"], "target_rows=300 must trigger skew splits"

    raw = pts.to_pandas()
    lo, hi = [5.0, 10.0, 3.0], [200.0, 80.0, 60.0]
    got = pipeline.query_index_box_nd(path, lo, hi).to_pandas()
    m = np.ones(len(raw), dtype=bool)
    for i, c in enumerate(["x", "y", "z"]):
        m &= (raw[c].to_numpy() >= lo[i]) & (raw[c].to_numpy() <= hi[i])
    assert set(got["id"]) == set(raw["id"][m])

    c, r2 = [100.0, 50.0, 48.0], 2000.0
    got2 = pipeline.query_index_within_distance_nd(path, c, r2).to_pandas()
    d2 = np.zeros(len(raw))
    for i, col in enumerate(["x", "y", "z"]):
        dx = raw[col].to_numpy() - c[i]
        d2 += dx * dx
    assert set(got2["id"]) == set(raw["id"][d2 <= r2])

    # resume: a second build skips every finished cell
    man2 = pipeline.build_partitioned_index_nd(
        pts, path, ["x", "y", "z"], base_level=1, bounds=FX.POINTS3D_BOUNDS,
        target_rows=100,
    )
    assert man2["built_cells"] == 0
    assert man2["resumed_cells"] == len(man["partitions"])


def test_nd_index_prunes_reads(ray_session, sf_small, tmp_path):
    # a query box far from most partitions must not touch their files
    path = str(tmp_path / "idx3p")
    pts = FX.points3d_ds(sf_small)
    pipeline.build_partitioned_index_nd(
        pts, path, ["x", "y", "z"], base_level=1, bounds=FX.POINTS3D_BOUNDS,
        target_rows=100,
    )
    man = pipeline.load_manifest(path)
    lo, hi = [0.0, 0.0, 0.0], [10.0, 10.0, 10.0]
    touched = [
        p for p in man["partitions"].values()
        if (np.asarray(p["lo"]) <= hi).all() and (np.asarray(p["hi"]) >= lo).all()
    ]
    assert 0 < len(touched) < len(man["partitions"])
    got = pipeline.query_index_box_nd(path, lo, hi).to_pandas()
    raw = pts.to_pandas()
    m = np.ones(len(raw), dtype=bool)
    for i, c in enumerate(["x", "y", "z"]):
        m &= (raw[c].to_numpy() >= lo[i]) & (raw[c].to_numpy() <= hi[i])
    assert set(got["id"]) == set(raw["id"][m])

def test_nd_indexed_knn_vs_brute(ray_session, sf_small, tmp_path):
    # shuffle-free kNN on the persisted 3-d index == brute-force knn_nd
    # exactly (bounds proof, dimension-generic: nearest_neighbor.rs over
    # Point<d>), including the (dist2, id) tie contract
    import pyarrow as pa

    from geograft import ops, state as ST

    path = str(tmp_path / "idx3k")
    pts = FX.points3d_ds(sf_small)
    pipeline.build_partitioned_index_nd(
        pts, path, ["x", "y", "z"], base_level=1, bounds=FX.POINTS3D_BOUNDS,
        target_rows=100,
    )
    rng = np.random.default_rng(11)
    qn = 64
    q = pa.table({
        "qid": np.arange(qn),
        "x": rng.uniform(0.0, 560.0, qn),
        "y": rng.uniform(0.0, 100.0, qn),
        "z": rng.uniform(0.0, 97.0, qn),
    })
    got = ST.knn_on_index_nd(path, q, k=5)
    want = ops.knn_nd(FX.points3d_ds(sf_small), q, k=5, axes=["x", "y", "z"])
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))
    assert len(got) == qn * 5


# ---- index-integrated removal (removal.rs:67-243 + 257-302) --------------

def test_index_drain_tombstones_then_compact(ray_session, sf_small, tmp_index):
    src = FX.points_ds(sf_small)
    pipeline.build_partitioned_index(
        src, tmp_index, base_level=4, bounds=FX.POINTS_BOUNDS
    )
    all_ids = np.sort(src.to_pandas()["id"].to_numpy())
    env = (5.0, 10.0, 20.0, 40.0)
    drained = np.sort(
        ops.locate_in_envelope(src, *env).to_pandas()["id"].to_numpy())
    assert len(drained) > 0

    man = pipeline.drain_index_in_envelope(tmp_index, *env)
    assert man["deleted_rows"] == len(drained)
    # sanity passes with PENDING tombstones (data files untouched)
    pipeline.sanity_check_index(tmp_index,
                                expected_rows=len(all_ids) - len(drained))
    want_live = np.setdiff1d(all_ids, drained)

    # every query surface sees the removal immediately
    got = np.sort(pipeline.read_index(tmp_index).to_pandas()["id"].to_numpy())
    np.testing.assert_array_equal(got, want_live)

    b = FX.POINTS_BOUNDS
    out = pipeline.query_index_envelope(
        tmp_index, b.minx, b.miny, b.maxx, b.maxy, intersecting=True)
    np.testing.assert_array_equal(
        np.sort(out.to_pandas()["id"].to_numpy()), want_live)

    # actor-pool path (PartitionQuerier loads trees tombstone-filtered)
    from geograft import state as ST

    boxes = pa.table({"box_id": [0], "minx": [b.minx], "miny": [b.miny],
                      "maxx": [b.maxx], "maxy": [b.maxy]})
    hits = ST.query_index_batch(tmp_index, boxes, intersecting=True)
    np.testing.assert_array_equal(
        np.sort(hits.to_pandas()["id"].to_numpy()), want_live)

    # kNN planned with LIVE counts: query from inside the drained
    # envelope must return the nearest SURVIVORS
    df = src.to_pandas()
    live = df[~df["id"].isin(drained)]
    qx, qy = 12.0, 25.0  # center of the drained envelope
    d2 = (live["x"].to_numpy() - qx) ** 2 + (live["y"].to_numpy() - qy) ** 2
    order = np.lexsort((live["id"].to_numpy(), d2))[:5]
    want_knn = live["id"].to_numpy()[order]
    q = pa.table({"qid": [0], "x": [qx], "y": [qy]})
    got_knn = ST.knn_on_index(tmp_index, q, k=5)["id"].to_numpy()
    np.testing.assert_array_equal(got_knn, want_knn)
    got_knn2 = ST.knn_index_batch(tmp_index, q, k=5)["id"].to_numpy()
    np.testing.assert_array_equal(got_knn2, want_knn)

    # compaction folds tombstones into the files; answers unchanged
    man2 = pipeline.compact_index(tmp_index)
    assert man2["deleted_rows"] == 0
    assert man2["total_rows"] == len(want_live)
    pipeline.sanity_check_index(tmp_index, expected_rows=len(want_live))
    got2 = np.sort(pipeline.read_index(tmp_index).to_pandas()["id"].to_numpy())
    np.testing.assert_array_equal(got2, want_live)


def test_index_remove_at_point_min_id(ray_session, sf_small, tmp_index):
    src = FX.points_ds(sf_small)
    pipeline.build_partitioned_index(
        src, tmp_index, base_level=4, bounds=FX.POINTS_BOUNDS
    )
    df = src.to_pandas()
    px, py = float(df["x"].iloc[0]), float(df["y"].iloc[0])
    at = df[(df["x"] == px) & (df["y"] == py)]["id"].to_numpy()
    man = pipeline.remove_index_at_point(tmp_index, px, py)
    assert man["deleted_rows"] == 1
    got = np.sort(pipeline.read_index(tmp_index).to_pandas()["id"].to_numpy())
    want = np.setdiff1d(df["id"].to_numpy(), [at.min()])
    np.testing.assert_array_equal(got, want)
    # removing at an empty point is a no-op
    man2 = pipeline.remove_index_at_point(tmp_index, -1e12, -1e12)
    assert man2["deleted_rows"] == 1


def test_index_remove_then_reinsert_round_trip(ray_session, sf_small, tmp_index):
    # removal.rs:257-302: remove-then-insert keeps size and membership;
    # the delta merge folds pending tombstones into the rewrite
    src = FX.points_ds(sf_small)
    pipeline.build_partitioned_index(
        src, tmp_index, base_level=4, bounds=FX.POINTS_BOUNDS
    )
    all_ids = np.sort(src.to_pandas()["id"].to_numpy())
    env = (5.0, 10.0, 20.0, 40.0)
    pipeline.drain_index_in_envelope(tmp_index, *env)
    delta = ops.locate_in_envelope(src, *env)
    man = pipeline.ingest_delta(tmp_index, delta)
    assert man["deleted_rows"] == 0
    pipeline.sanity_check_index(tmp_index, expected_rows=len(all_ids))
    got = np.sort(pipeline.read_index(tmp_index).to_pandas()["id"].to_numpy())
    np.testing.assert_array_equal(got, all_ids)


def test_read_table_sized_dispatch(ray_session, sf_small, tmp_path):
    """read_table_sized: parquet path reads; a .lance path without the
    lance package raises the precise gate error (never silently falls
    back to the parquet reader)."""
    import pytest as _pytest

    from geograft import io

    ds = io.read_table_sized(f"{sf_small}/events.parquet", columns=["user_id"])
    assert ds.count() > 0 and ds.schema().names == ["user_id"]

    lance_dir = tmp_path / "t.lance"
    lance_dir.mkdir()
    try:
        import lance  # noqa: F401
    except ImportError:
        with _pytest.raises(ImportError, match="Lance"):
            io.read_table_sized(str(lance_dir))


def test_nd_index_tombstones_every_query_surface(ray_session, sf_small, tmp_path):
    """removal.rs:257-302 round-trip, n-d edition: tombstone a slab of
    the 3-d index, then EVERY indexed query surface (box, within-
    distance, kNN, selection-function on the 2-d twin) must agree with
    brute force over survivors — pre-compaction (pending tombstones)
    AND post-compaction (files rewritten, emptied partitions dropped)."""
    import pyarrow as pa

    from geograft import ops, state as ST

    path = str(tmp_path / "idx3t")
    pts = FX.points3d_ds(sf_small)
    pipeline.build_partitioned_index_nd(
        pts, path, ["x", "y", "z"], base_level=1, bounds=FX.POINTS3D_BOUNDS,
        target_rows=100,
    )
    raw = pts.to_pandas()

    # drain a slab: every row with x < 60 (cuts across partitions)
    def sel(b):
        return b.column("x").to_numpy() < 60.0

    man = pipeline.tombstone_index(path, sel)
    dead = raw["id"][raw["x"].to_numpy() < 60.0].to_numpy()
    assert man["deleted_rows"] == len(dead) > 0
    live = raw[~raw["id"].isin(dead)]

    def check_all_surfaces():
        # box query over a window spanning dead and live rows
        lo, hi = [5.0, 10.0, 3.0], [200.0, 80.0, 60.0]
        got = pipeline.query_index_box_nd(path, lo, hi).to_pandas()
        m = np.ones(len(live), dtype=bool)
        for i, c in enumerate(["x", "y", "z"]):
            m &= (live[c].to_numpy() >= lo[i]) & (live[c].to_numpy() <= hi[i])
        assert set(got["id"]) == set(live["id"][m])

        # within-distance centered inside the drained slab
        c, r2 = [50.0, 50.0, 48.0], 4000.0
        got2 = pipeline.query_index_within_distance_nd(path, c, r2)
        got2 = got2.to_pandas() if got2 is not None else None
        d2 = np.zeros(len(live))
        for i, col in enumerate(["x", "y", "z"]):
            dx = live[col].to_numpy() - c[i]
            d2 += dx * dx
        assert set(got2["id"]) == set(live["id"][d2 <= r2])

        # kNN from inside the slab returns nearest SURVIVORS, both
        # planner passes live-count-aware
        order = np.lexsort((live["id"].to_numpy(), d2))[:5]
        q = pa.table({"qid": [0], "x": [c[0]], "y": [c[1]], "z": [c[2]]})
        got_knn = ST.knn_on_index_nd(path, q, k=5)["id"].to_numpy()
        np.testing.assert_array_equal(got_knn, live["id"].to_numpy()[order])

    check_all_surfaces()  # pending tombstones
    man2 = pipeline.compact_index(path)
    assert man2["deleted_rows"] == 0 and man2["total_rows"] == len(live)
    pipeline.sanity_check_index_nd(path, expected_rows=len(live))
    check_all_surfaces()  # compacted


def test_index_selection_function_sees_tombstones(ray_session, sf_small, tmp_index):
    """query_index_with_selection_function must filter pending
    tombstones like every other surface (SelectionFunction protocol over
    a partially-drained index)."""
    src = FX.points_ds(sf_small)
    pipeline.build_partitioned_index(
        src, tmp_index, base_level=4, bounds=FX.POINTS_BOUNDS
    )
    df = src.to_pandas()
    env = (5.0, 10.0, 20.0, 40.0)
    pipeline.drain_index_in_envelope(tmp_index, *env)
    in_env = ((df["x"] >= env[0]) & (df["y"] >= env[1])
              & (df["x"] <= env[2]) & (df["y"] <= env[3]))
    live = df[~in_env]

    def keep_rows(b):
        return b.column("x").to_numpy() < 100.0

    def prune(lo, up):
        return lo[:, 0] < 100.0

    out, n_read, n_total = pipeline.query_index_with_selection_function(
        tmp_index, keep_rows, prune_partition=prune)
    assert 0 < n_read < n_total
    want = live["id"][live["x"].to_numpy() < 100.0]
    assert set(out.to_pandas()["id"]) == set(want)


def test_ingest_upsert_strategy_replaces_by_id(ray_session, tmp_path):
    """InsertionStrategy surface (params.rs:82-88): the 'upsert'
    built-in makes a delta row REPLACE the existing same-id row;
    query answers equal a bulk build over the replaced union."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 2000
    xy = rng.uniform(0, 1, (n, 2))
    t = pa.table({"id": np.arange(n), "minx": xy[:, 0], "miny": xy[:, 1],
                  "maxx": xy[:, 0], "maxy": xy[:, 1]})
    bounds = G.Bounds(0, 0, 1, 1)
    path = str(tmp_path / "ups")
    pipeline.build_partitioned_index(
        rd.from_arrow(t), path, base_level=3, bounds=bounds)
    # move the first 300 ids to new coordinates
    moved = rng.uniform(0, 1, (300, 2))
    delta = pa.table({"id": np.arange(300),
                      "minx": moved[:, 0], "miny": moved[:, 1],
                      "maxx": moved[:, 0], "maxy": moved[:, 1]})
    pipeline.ingest_delta(path, rd.from_arrow(delta), strategy="upsert")
    pipeline.sanity_check_index(path, expected_rows=n)
    final = xy.copy()
    final[:300] = moved
    q = (0.2, 0.2, 0.7, 0.7)
    got = np.sort(
        pipeline.query_index_envelope(path, *q).to_pandas()["id"].to_numpy())
    want = np.nonzero((final[:, 0] >= q[0]) & (final[:, 0] <= q[2])
                      & (final[:, 1] >= q[1]) & (final[:, 1] <= q[3]))[0]
    np.testing.assert_array_equal(got, want)


def test_register_custom_insertion_strategy(ray_session, tmp_path):
    """A user-registered strategy routes through ingest_delta (the
    trait's extension point): keep-old-on-conflict (insert-if-absent,
    a cell-local merge — same id at the same coordinates is dropped,
    genuinely new ids are inserted)."""
    import ray.data as rd

    def insert_if_absent(old, new, id_col="id"):
        if old is None:
            return new
        fresh = ~np.isin(new.column(id_col).to_numpy(),
                         old.column(id_col).to_numpy())
        return pa.concat_tables(
            [old, new.filter(pa.array(fresh)).select(old.column_names)])

    pipeline.register_insertion_strategy("if_absent", insert_if_absent)
    try:
        rng = np.random.default_rng(3)
        xy = rng.uniform(0, 1, (500, 2))
        t = pa.table({"id": np.arange(500), "minx": xy[:, 0],
                      "miny": xy[:, 1], "maxx": xy[:, 0], "maxy": xy[:, 1]})
        path = str(tmp_path / "ifabs")
        pipeline.build_partitioned_index(
            rd.from_arrow(t), path, base_level=3, bounds=G.Bounds(0, 0, 1, 1))
        # 50 conflicting rows (same id, same coords -> same cell: must
        # be DROPPED) + 50 genuinely new ids (must be inserted)
        nxy = rng.uniform(0, 1, (50, 2))
        delta = pa.table({
            "id": np.concatenate([np.arange(50), np.arange(500, 550)]),
            "minx": np.concatenate([xy[:50, 0], nxy[:, 0]]),
            "miny": np.concatenate([xy[:50, 1], nxy[:, 1]]),
            "maxx": np.concatenate([xy[:50, 0], nxy[:, 0]]),
            "maxy": np.concatenate([xy[:50, 1], nxy[:, 1]]),
        })
        pipeline.ingest_delta(path, rd.from_arrow(delta), strategy="if_absent")
        pipeline.sanity_check_index(path, expected_rows=550)
        allxy = np.vstack([xy, nxy])
        q = (0.1, 0.1, 0.8, 0.8)
        got = np.sort(pipeline.query_index_envelope(
            path, *q).to_pandas()["id"].to_numpy())
        want = np.nonzero((allxy[:, 0] >= q[0]) & (allxy[:, 0] <= q[2])
                          & (allxy[:, 1] >= q[1]) & (allxy[:, 1] <= q[3]))[0]
        np.testing.assert_array_equal(got, want)  # no duplicate ids
        with pytest.raises(ValueError):
            pipeline.register_insertion_strategy("rstar", insert_if_absent)
    finally:
        pipeline.INSERTION_STRATEGIES.pop("if_absent", None)


def test_upsert_counts_physical_copies_of_duplicate_ids(ray_session, tmp_path):
    """'rstar' ingest explicitly allows duplicate ids; a later upsert of
    such an id must tombstone EVERY physical copy and the manifest must
    count copies, not unique ids (review finding, round 5)."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    xy = rng.uniform(0, 1, (100, 2))
    t = pa.table({"id": np.arange(100), "minx": xy[:, 0], "miny": xy[:, 1],
                  "maxx": xy[:, 0], "maxy": xy[:, 1]})
    path = str(tmp_path / "dup")
    pipeline.build_partitioned_index(
        rd.from_arrow(t), path, base_level=2, bounds=G.Bounds(0, 0, 1, 1))
    # duplicate id 5 at a different location (allowed under 'rstar')
    dup = pa.table({"id": pa.array([5], type=pa.int64()),
                    "minx": [0.9], "miny": [0.9], "maxx": [0.9], "maxy": [0.9]})
    pipeline.ingest_delta(path, rd.from_arrow(dup))  # rstar: 101 rows
    # upsert id 5 to a third location: BOTH old copies must die
    up = pa.table({"id": pa.array([5], type=pa.int64()),
                   "minx": [0.1], "miny": [0.9], "maxx": [0.1], "maxy": [0.9]})
    pipeline.ingest_delta(path, rd.from_arrow(up), strategy="upsert")
    pipeline.sanity_check_index(path, expected_rows=100)
    ids = pipeline.read_index(path).to_pandas()["id"].to_numpy()
    assert len(ids) == 100 and (np.sort(ids) == np.arange(100)).all()


def test_ingest_rejects_unknown_strategy(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table({"id": pa.array([0], type=pa.int64()),
                  "minx": [0.5], "miny": [0.5], "maxx": [0.5], "maxy": [0.5]})
    path = str(tmp_path / "unk")
    pipeline.build_partitioned_index(
        rd.from_arrow(t), path, base_level=1, bounds=G.Bounds(0, 0, 1, 1))
    with pytest.raises(ValueError, match="registered"):
        pipeline.ingest_delta(path, rd.from_arrow(t), strategy="upser")


def test_custom_strategy_rejecting_all_rows_drops_partition(ray_session, tmp_path):
    """A merge returning 0 rows must drop the partition cleanly (no
    0-row file published, manifest entry removed) instead of crashing
    on an empty-bounds reduction."""
    import ray.data as rd

    pipeline.register_insertion_strategy("drop_all",
                                         lambda old, new: new.slice(0, 0))
    try:
        t = pa.table({"id": np.arange(50, dtype=np.int64),
                      "minx": np.full(50, 0.25), "miny": np.full(50, 0.25),
                      "maxx": np.full(50, 0.25), "maxy": np.full(50, 0.25)})
        path = str(tmp_path / "drop")
        pipeline.build_partitioned_index(
            rd.from_arrow(t), path, base_level=1, bounds=G.Bounds(0, 0, 1, 1))
        pipeline.ingest_delta(path, rd.from_arrow(t), strategy="drop_all")
        pipeline.sanity_check_index(path, expected_rows=0)
        assert pipeline.load_manifest(path)["partitions"] == {}
    finally:
        pipeline.INSERTION_STRATEGIES.pop("drop_all", None)
