"""Dataset operators vs DuckDB brute-force oracles on real testdata
(sf0.001) — the distributed analogue of the reference's linear-scan
comparison tests (SURVEY.md §5)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from geograft import fixtures as FX
from geograft import ops


@pytest.fixture(scope="module")
def con(sf_small):
    c = duckdb.connect()
    for t in ["events", "lineitem", "supplier", "part"]:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    return c


def ids(ds):
    return np.sort(ds.to_pandas()["id"].to_numpy())


def test_locate_in_envelope_points(ray_session, con, sf_small):
    ds = ops.locate_in_envelope(FX.points_ds(sf_small), 5.0, 10.0, 20.0, 40.0)
    want = con.sql(
        f"SELECT id FROM ({FX.POINTS_SQL}) WHERE x BETWEEN 5 AND 20 AND y BETWEEN 10 AND 40 ORDER BY id"
    ).df()["id"].to_numpy()
    np.testing.assert_array_equal(ids(ds), want)


def test_locate_in_envelope_rects_contained_and_intersecting(ray_session, con, sf_small):
    q = (1000.0, 10.0, 30000.0, 60.0)
    got_c = ids(ops.locate_in_envelope(FX.rects_ds(sf_small), *q))
    want_c = con.sql(
        f"SELECT id FROM ({FX.RECTS_SQL}) WHERE minx >= {q[0]} AND miny >= {q[1]} "
        f"AND maxx <= {q[2]} AND maxy <= {q[3]} ORDER BY id"
    ).df()["id"].to_numpy()
    np.testing.assert_array_equal(got_c, want_c)

    got_i = ids(ops.locate_in_envelope_intersecting(FX.rects_ds(sf_small), *q))
    want_i = con.sql(
        f"SELECT id FROM ({FX.RECTS_SQL}) WHERE minx <= {q[2]} AND maxx >= {q[0]} "
        f"AND miny <= {q[3]} AND maxy >= {q[1]} ORDER BY id"
    ).df()["id"].to_numpy()
    np.testing.assert_array_equal(got_i, want_i)
    assert len(want_i) > len(want_c) > 0, "fixture constants give a meaningful query"


def test_locate_at_point_rects(ray_session, con, sf_small):
    # pick a point guaranteed inside at least one rect
    row = con.sql(f"SELECT minx, miny FROM ({FX.RECTS_SQL}) LIMIT 1").fetchall()[0]
    px, py = row[0] + 0.5, row[1] + 0.5
    got = ids(ops.locate_all_at_point(FX.rects_ds(sf_small), px, py))
    want = con.sql(
        f"SELECT id FROM ({FX.RECTS_SQL}) WHERE minx <= {px} AND maxx >= {px} "
        f"AND miny <= {py} AND maxy >= {py} ORDER BY id"
    ).df()["id"].to_numpy()
    np.testing.assert_array_equal(got, want)
    assert len(want) >= 1


def test_locate_at_point_first_match(ray_session, con, sf_small):
    # rtree.rs:753-801 single-match variant: smallest id among matches;
    # empty match set -> empty frame
    row = con.sql(f"SELECT minx, miny FROM ({FX.RECTS_SQL}) LIMIT 1").fetchall()[0]
    px, py = row[0] + 0.5, row[1] + 0.5
    allm = ids(ops.locate_all_at_point(FX.rects_ds(sf_small), px, py))
    assert len(allm) >= 1
    got = ops.locate_at_point(FX.rects_ds(sf_small), px, py)
    assert len(got) == 1 and int(got["id"].iloc[0]) == int(allm.min())
    miss = ops.locate_at_point(FX.rects_ds(sf_small), -1e12, -1e12)
    assert len(miss) == 0


def test_locate_in_box_4d_and_knn_4d_vs_brute(ray_session, sf_small):
    # d=4 end to end over the events axes (reference dims-2/3/4 bulk
    # load tests, bulk_load_sequential.rs:113-151)
    import pyarrow as pa
    import pyarrow.parquet as pq
    from geograft.io import read_parquet_sized

    ev = pq.read_table(f"{sf_small}/events.parquet",
                       columns=["event_id", "ts", "user_id", "value"])
    ts_h = ev.column("ts").cast(pa.int64()).to_numpy() / 3600000000.0
    pts = np.stack([ev.column("value").to_numpy(),
                    ev.column("user_id").to_numpy().astype(np.float64),
                    ev.column("event_id").to_numpy().astype(np.float64),
                    ts_h], axis=1)
    eid = ev.column("event_id").to_numpy()

    ds = read_parquet_sized(f"{sf_small}/events.parquet",
                            columns=["event_id", "ts", "user_id", "value"])

    def mk(b: pa.Table) -> pa.Table:
        th = b.column("ts").cast(pa.int64()).to_numpy() / 3600000000.0
        return pa.table({"event_id": b.column("event_id"),
                         "value": b.column("value"),
                         "user_id": b.column("user_id"), "ts_h": pa.array(th)})

    ds4 = ds.map_batches(mk, batch_format="pyarrow", batch_size=None)
    lo = np.array([5.0, 10.0, 0.0, ts_h.min()])
    hi = np.array([200.0, 80.0, 5000.0, ts_h.min() + 48.0])
    got = np.sort(ops.locate_in_box_nd(
        ds4, ["value", "user_id", "event_id", "ts_h"], lo.tolist(), hi.tolist()
    ).to_pandas()["event_id"].to_numpy())
    want = np.sort(eid[((pts >= lo) & (pts <= hi)).all(axis=1)])
    np.testing.assert_array_equal(got, want)
    assert len(want) > 0

    q = np.array([100.0, 50.0, 2500.0, ts_h.min() + 24.0])
    qt = pa.table({"qid": [0], "value": [q[0]], "user_id": [q[1]],
                   "event_id": [q[2]], "ts_h": [q[3]]})
    got_knn = ops.knn_nd(ds4, qt, k=10,
                         axes=["value", "user_id", "event_id", "ts_h"],
                         id_col="event_id")
    d2 = ((pts - q) ** 2).sum(axis=1)
    order = np.lexsort((eid, d2))[:10]
    np.testing.assert_array_equal(got_knn["event_id"].to_numpy(), eid[order])


def test_locate_within_distance_points(ray_session, con, sf_small):
    qx, qy, r2 = 50.0, 8.0, 400.0
    got = ids(ops.locate_within_distance(FX.points_ds(sf_small), qx, qy, r2))
    want = con.sql(
        f"SELECT id FROM ({FX.POINTS_SQL}) "
        f"WHERE (x-{qx})*(x-{qx}) + (y-{qy})*(y-{qy}) <= {r2} ORDER BY id"
    ).df()["id"].to_numpy()
    np.testing.assert_array_equal(got, want)
    assert len(want) > 0


def test_knn_vs_sql(ray_session, con, sf_small):
    import pyarrow as pa

    queries = pa.table({"qid": [0, 1], "x": [100.0, 350.0], "y": [50.0, 120.0]})
    out = ops.knn(FX.points_ds(sf_small), queries, k=7)
    for qid, qx, qy in [(0, 100.0, 50.0), (1, 350.0, 120.0)]:
        got = out[out["qid"] == qid].sort_values(["dist2", "id"])["id"].to_numpy()
        want = con.sql(
            f"SELECT id FROM ({FX.POINTS_SQL}) "
            f"ORDER BY (x-{qx})*(x-{qx}) + (y-{qy})*(y-{qy}), id LIMIT 7"
        ).df()["id"].to_numpy()
        np.testing.assert_array_equal(got, want)


def test_indexed_knn_matches_brute_and_sql(ray_session, con, sf_small):
    import pyarrow as pa

    rng = np.random.default_rng(3)
    qn = 60
    queries = pa.table(
        {
            "qid": np.arange(qn),
            "x": rng.uniform(0, 400, qn),
            "y": rng.uniform(0, 15, qn),
        }
    )
    for level in (3, 5):
        out = ops.indexed_knn(
            FX.points_ds(sf_small), queries, k=5, level=level, bounds=FX.POINTS_BOUNDS
        )
        brute = ops.knn(FX.points_ds(sf_small), queries, k=5)
        assert out[["qid", "id"]].reset_index(drop=True).equals(
            brute[["qid", "id"]].reset_index(drop=True)
        )
        np.testing.assert_array_equal(out["dist2"].to_numpy(), brute["dist2"].to_numpy())
    # spot-check one query against SQL
    qx, qy = float(queries["x"][0].as_py()), float(queries["y"][0].as_py())
    want = con.sql(
        f"SELECT id FROM ({FX.POINTS_SQL}) "
        f"ORDER BY (x-{qx})*(x-{qx}) + (y-{qy})*(y-{qy}), id LIMIT 5"
    ).df()["id"].to_numpy()
    got = out[out["qid"] == 0]["id"].to_numpy()
    np.testing.assert_array_equal(got, want)


def test_indexed_knn_k_exceeds_total(ray_session, sf_small):
    import pyarrow as pa

    queries = pa.table({"qid": [0], "x": [10.0], "y": [5.0]})
    out = ops.indexed_knn(
        FX.points_ds(sf_small), queries, k=10**6, level=4, bounds=FX.POINTS_BOUNDS
    )
    assert len(out) == 1000  # all points returned when k > n


def test_nearest_neighbors_ties(ray_session, con, sf_small):
    got = ops.nearest_neighbors_all_ties(FX.points_ds(sf_small), 100.0, 50.0)
    want = con.sql(
        f"WITH d AS (SELECT id, (x-100.0)*(x-100.0) + (y-50.0)*(y-50.0) AS d2 "
        f"FROM ({FX.POINTS_SQL})) SELECT id FROM d WHERE d2 = (SELECT min(d2) FROM d) ORDER BY id"
    ).df()["id"].to_numpy()
    np.testing.assert_array_equal(got["id"].to_numpy(), want)


def test_spatial_join_vs_sql(ray_session, con, sf_small):
    out = ops.spatial_join(
        FX.join_left_ds(sf_small), FX.join_right_ds(sf_small), level=4, bounds=FX.JOIN_BOUNDS
    ).to_pandas()
    got = set(zip(out["left_id"], out["right_id"]))
    want = con.sql(
        f"SELECT a.id, b.id FROM ({FX.JOIN_LEFT_SQL}) a, ({FX.JOIN_RIGHT_SQL}) b "
        "WHERE a.minx <= b.maxx AND a.maxx >= b.minx AND a.miny <= b.maxy AND a.maxy >= b.miny"
    ).fetchall()
    assert got == set(want)
    assert len(out) == len(got), "owner-cell dedup yields exactly-once pairs"
    assert len(got) > 0


def test_spatial_join_cell_boundary_alignment(ray_session):
    """Geometries whose corners sit EXACTLY on grid-cell boundaries must
    still produce an exactly-once pair set (owner-cell rule's sharpest
    corner: floor() at the boundary must agree between replication and
    owner assignment)."""
    import pyarrow as pa
    import ray.data as rd

    from geograft import grid as G

    bounds = G.Bounds(0, 0, 1, 1)
    level = 3  # cell width 0.125
    step = 0.125
    rng = np.random.default_rng(4)
    # grid-aligned rects (corners on boundaries) + jittered ones
    ax = np.concatenate([np.arange(8) * step, rng.uniform(0, 0.9, 40)])
    ay = np.concatenate([np.arange(8) * step, rng.uniform(0, 0.9, 40)])
    a_lo = np.c_[ax, ay]
    a_hi = a_lo + step  # spans exactly one cell-width
    bx = np.concatenate([np.arange(8) * step + step / 2, rng.uniform(0, 0.9, 40)])
    by = np.concatenate([np.arange(8) * step + step / 2, rng.uniform(0, 0.9, 40)])
    b_lo = np.c_[bx, by]
    b_hi = b_lo + 2 * step  # spans multiple cells

    left = pa.table({"id": np.arange(len(ax), dtype=np.int64),
                     "minx": a_lo[:, 0], "miny": a_lo[:, 1],
                     "maxx": a_hi[:, 0], "maxy": a_hi[:, 1]})
    right = pa.table({"id": np.arange(len(bx), dtype=np.int64),
                      "minx": b_lo[:, 0], "miny": b_lo[:, 1],
                      "maxx": b_hi[:, 0], "maxy": b_hi[:, 1]})
    out = ops.spatial_join(
        rd.from_arrow(left), rd.from_arrow(right), level=level, bounds=bounds
    ).to_pandas()
    got = sorted(zip(out["left_id"], out["right_id"]))
    want = []
    for i in range(len(ax)):
        hit = (a_lo[i, 0] <= b_hi[:, 0]) & (a_hi[i, 0] >= b_lo[:, 0]) & \
              (a_lo[i, 1] <= b_hi[:, 1]) & (a_hi[i, 1] >= b_lo[:, 1])
        want.extend((i, int(j)) for j in np.nonzero(hit)[0])
    assert got == sorted(want), "exactly-once pair set on boundary-aligned input"
    assert len(got) == len(want)


def test_drain_split(ray_session, con, sf_small):
    q = (5.0, 10.0, 20.0, 40.0)
    drained, surviving = ops.drain_in_envelope(FX.points_ds(sf_small), *q)
    nd, ns = drained.count(), surviving.count()
    total = con.sql("SELECT count(*) FROM events").fetchall()[0][0]
    assert nd + ns == total
    want = con.sql(
        f"SELECT count(*) FROM ({FX.POINTS_SQL}) WHERE x BETWEEN 5 AND 20 AND y BETWEEN 10 AND 40"
    ).fetchall()[0][0]
    assert nd == want


def test_drain_within_distance(ray_session, con, sf_small):
    qx, qy, r2 = 50.0, 8.0, 400.0
    drained, surviving = ops.drain_within_distance(FX.points_ds(sf_small), qx, qy, r2)
    nd = drained.count()
    want = con.sql(
        f"SELECT count(*) FROM ({FX.POINTS_SQL}) "
        f"WHERE (x-{qx})*(x-{qx}) + (y-{qy})*(y-{qy}) <= {r2}"
    ).fetchall()[0][0]
    assert nd == want > 0
    assert nd + surviving.count() == 1000


def test_drain_limit_partial(ray_session, con, sf_small):
    # partial drain: first 50 (by id) of the rows with x < 100
    pred = lambda b: b.column("minx").to_numpy() < 100.0  # noqa: E731
    drained, surviving = ops.drain_limit(FX.points_ds(sf_small), pred, n=50)
    dd = drained.to_pandas().sort_values("id")
    want = con.sql(
        f"SELECT id FROM ({FX.POINTS_SQL}) WHERE x < 100 ORDER BY id LIMIT 50"
    ).df()["id"].to_numpy()
    np.testing.assert_array_equal(dd["id"].to_numpy(), want)
    assert drained.count() + surviving.count() == 1000


def test_remove_at_point(ray_session, con, sf_small):
    # points fixture: event ids are unique, so "remove one element"
    # (min id among matches) is well-defined
    px, py = con.sql(f"SELECT x, y FROM ({FX.POINTS_SQL}) WHERE id = 7").fetchall()[0]
    removed, surviving = ops.remove_at_point(FX.points_ds(sf_small), px, py)
    want_victim = con.sql(
        f"SELECT min(id) FROM ({FX.POINTS_SQL}) WHERE x = {px!r} AND y = {py!r}"
    ).fetchall()[0][0]
    assert removed["id"].iloc[0] == want_victim
    n_at = con.sql(
        f"SELECT count(*) FROM ({FX.POINTS_SQL}) WHERE x = {px!r} AND y = {py!r}"
    ).fetchall()[0][0]
    assert surviving.count() == 1000 - 1
    assert n_at >= 1
    # removing from an empty match set is the identity
    removed2, surviving2 = ops.remove_at_point(FX.points_ds(sf_small), 1e6, 1e6)
    assert len(removed2) == 0 and surviving2.count() == 1000


def test_nn_stream_full_sort(ray_session, con, sf_small):
    out = ops.nn_stream(FX.points_ds(sf_small), 100.0, 50.0).to_pandas()
    want = con.sql(
        f"SELECT id FROM ({FX.POINTS_SQL}) "
        f"ORDER BY (x-100.0)*(x-100.0) + (y-50.0)*(y-50.0), id"
    ).df()["id"].to_numpy()
    np.testing.assert_array_equal(out["id"].to_numpy(), want)
    assert (np.diff(out["dist2"].to_numpy()) >= 0).all()


def test_selection_function_udf(ray_session, con, sf_small):
    # mirrors the custom-SF example (iterators.rs:328-360): all x < 100
    got = ids(
        ops.locate_with_selection_function(
            FX.points_ds(sf_small), lambda b: b.column("minx").to_numpy() < 100.0
        )
    )
    want = con.sql(f"SELECT id FROM ({FX.POINTS_SQL}) WHERE x < 100 ORDER BY id").df()[
        "id"
    ].to_numpy()
    np.testing.assert_array_equal(got, want)


def test_remove_round_trip_with_duplicates(ray_session):
    """Removal round-trip (rstar removal.rs:257-302 re-expressed):
    remove-by-equality takes exactly ONE element per call even when
    duplicates exist; drain_with_selection_function takes ALL matches;
    surviving + removed partitions the input."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geograft import ops

    x = np.array([1.0, 1.0, 2.0, 3.0, 3.0, 3.0])
    y = np.array([5.0, 5.0, 6.0, 7.0, 7.0, 7.0])
    t = pa.table({"id": np.arange(6, dtype=np.int64),
                  "minx": x, "miny": y, "maxx": x, "maxy": y})
    ds = rd.from_arrow(t)

    # remove one of the two (1,5) duplicates -> smallest id goes
    removed, surv = ops.remove_equal(ds, 1.0, 5.0)
    assert removed["id"].tolist() == [0]
    assert sorted(surv.to_pandas()["id"]) == [1, 2, 3, 4, 5]

    # remove again from the surviving side -> the other copy goes
    removed2, surv2 = ops.remove_equal(surv, 1.0, 5.0)
    assert removed2["id"].tolist() == [1]
    assert sorted(surv2.to_pandas()["id"]) == [2, 3, 4, 5]

    # no match -> nothing removed, dataset unchanged
    removed3, surv3 = ops.remove_equal(surv2, 9.0, 9.0)
    assert len(removed3) == 0
    assert sorted(surv3.to_pandas()["id"]) == [2, 3, 4, 5]

    # predicate removal takes ONE (smallest matching id)
    removed4, surv4 = ops.remove_with_selection_function(
        surv3, lambda b: b.column("minx").to_numpy() >= 3.0
    )
    assert removed4["id"].tolist() == [3]

    # drain takes ALL matches; both sides partition the input
    drained, kept = ops.drain_with_selection_function(
        surv4, lambda b: b.column("minx").to_numpy() >= 3.0
    )
    assert sorted(drained.to_pandas()["id"]) == [4, 5]
    assert sorted(kept.to_pandas()["id"]) == [2]


def test_spatial_join_payload_forwarding(ray_session):
    """carry_left/carry_right forward payload columns on each pair —
    the Dataset form of intersection_candidates yielding (t, u)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geograft import grid as G
    from geograft import ops

    b = G.Bounds(0.0, 0.0, 10.0, 10.0)
    rng = np.random.default_rng(9)
    n = 40
    lo = rng.uniform(0, 9, (n, 2))
    left = pa.table({"id": np.arange(n, dtype=np.int64),
                     "minx": lo[:, 0], "miny": lo[:, 1],
                     "maxx": lo[:, 0] + 1.0, "maxy": lo[:, 1] + 1.0,
                     "tag": np.arange(n, dtype=np.int64) * 10})
    hi = rng.uniform(0, 9, (n, 2))
    right = pa.table({"id": np.arange(100, 100 + n, dtype=np.int64),
                      "minx": hi[:, 0], "miny": hi[:, 1],
                      "maxx": hi[:, 0] + 1.0, "maxy": hi[:, 1] + 1.0,
                      "wt": rng.uniform(0, 1, n)})
    out = ops.spatial_join(
        rd.from_arrow(left), rd.from_arrow(right), level=2, bounds=b,
        carry_left=("tag",), carry_right=("wt",),
    ).to_pandas()
    # brute force with payloads
    want = {}
    for i in range(n):
        for j in range(n):
            if (lo[i] <= hi[j] + 1.0).all() and (lo[i] + 1.0 >= hi[j]).all():
                want[(i, 100 + j)] = (i * 10, hi[j])
    got = {(r.left_id, r.right_id): (r.left_tag, r.right_wt)
           for r in out.itertuples()}
    assert set(got) == set(want)
    for k, (tag, _) in got.items():
        assert tag == want[k][0]


def test_direct_and_sort_exchange_equivalent(ray_session, sf_small):
    """coarse_group_by_cell must produce identical groups through the
    sort-free direct exchange and the streaming sort path (the byte
    gate picks between them; both must satisfy the same co-location
    contract)."""
    import pandas as pd
    import pyarrow as pa

    from geograft import fixtures as FX
    from geograft import ops

    def per_bucket(t: pa.Table) -> pd.DataFrame:
        if len(t) == 0 or "cell_id" not in t.column_names:
            return pd.DataFrame({"cell_id": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        df = t.select(["cell_id"]).to_pandas()
        out = df.groupby("cell_id").size().reset_index(name="n")
        return out

    keyed = FX.points_ds(sf_small).map_batches(
        lambda b: ops.assign_owner_cells(b, 3, FX.POINTS_BOUNDS),
        batch_format="pyarrow", batch_size=None)
    outs = {}
    for mode in ("direct", "sort"):
        res = (ops.coarse_group_by_cell(keyed, per_bucket, exchange=mode)
               .to_pandas().sort_values("cell_id").reset_index(drop=True))
        outs[mode] = res
    pd.testing.assert_frame_equal(outs["direct"], outs["sort"])
    assert outs["direct"]["n"].sum() > 0


def test_read_schema_hashable_no_dedup_warning(ray_session, sf_small, caplog):
    """pandas-written parquet carries schema metadata whose dict breaks
    pa.Schema.__hash__; io.read_parquet_sized must hand Ray a
    metadata-free schema so unify_schemas' dedup path never warns
    ("Failed to hash the schemas") and block-schema dedup stays on."""
    import logging

    import pyarrow as pa

    from geograft.io import read_parquet_sized

    ds = read_parquet_sized(f"{sf_small}/events.parquet",
                            columns=["event_id", "value"])
    with caplog.at_level(logging.WARNING, logger="ray.data"):
        sch = ds.schema()
        assert hash(pa.schema(list(zip(sch.names, sch.types)))) is not None
        assert ds.count() > 0
    assert not [r for r in caplog.records if "Failed to hash" in r.message]


def test_queries_window_rotates_least_recently_checked_first():
    """Standing driver-window rotation: every query with a row in the
    NEWEST CORRECTNESS_r*.json must sort after every query whose last
    driver row is older (the driver checks only the first 50 entries)."""
    import glob
    import json
    import re

    import __ray_entry__ as e

    files = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"),
                   key=lambda f: int(re.search(r"_r(\d+)", f).group(1)))
    assert files, "driver artifacts expected in the repo"
    last = {}
    for f in files:
        rnd = int(re.search(r"_r(\d+)", f).group(1))
        for name, row in json.load(open(f)).items():
            # a rows-only record is NOT a full check (matches
            # _rotate_lru): promoted queries re-enter the window
            if isinstance(row, dict) and row.get("err") is not None:
                continue
            last[name] = max(last.get(name, 0), rnd)
    names = list(e.queries().keys())
    ranks = [last.get(n, 0) for n in names]
    assert ranks == sorted(ranks), "queries() not LRU-ordered"


def test_spatial_self_join_equals_filtered_two_sided(ray_session, sf_small):
    """spatial_self_join must produce exactly the unordered pair set of
    the two-sided join filtered to left_id < right_id (single
    replication + in-task id-order filter is an optimization, not a
    semantics change)."""
    import pyarrow.compute as pc

    two = ops.spatial_join(
        FX.rects_ds(sf_small), FX.rects_ds(sf_small), level=5,
        bounds=FX.RECTS_BOUNDS,
    ).map_batches(
        lambda b: b.filter(pc.less(b["left_id"], b["right_id"])),
        batch_format="pyarrow", batch_size=None,
    ).to_pandas()
    one = ops.spatial_self_join(
        FX.rects_ds(sf_small), level=5, bounds=FX.RECTS_BOUNDS
    ).to_pandas()
    # multiset equality: the fixture contains duplicate ids (two rects
    # share id 3069 at sf0.001), so a pair can legitimately appear once
    # per geometric pair — both paths and the SQL oracle agree on that
    a = sorted(map(tuple, two[["left_id", "right_id"]].to_numpy()))
    b = sorted(map(tuple, one[["left_id", "right_id"]].to_numpy()))
    assert a == b and len(a) > 0


def test_locate_in_envelope_multi_both_modes(ray_session, sf_small):
    """Batched multi-box queries must equal per-box single queries in
    BOTH modes (contained / intersecting) — pins the batched-kernel
    mode mapping."""
    import pyarrow as pa

    boxes = [(1000.0, 10.0, 30000.0, 60.0), (500.0, 5.0, 2000.0, 20.0)]
    bt = pa.table({
        "box_id": list(range(len(boxes))),
        "minx": [b[0] for b in boxes], "miny": [b[1] for b in boxes],
        "maxx": [b[2] for b in boxes], "maxy": [b[3] for b in boxes],
    })
    for inter in (True, False):
        got = ops.locate_in_envelope_multi(
            FX.rects_ds(sf_small), bt, intersecting=inter).to_pandas()
        for j, b in enumerate(boxes):
            single = (ops.locate_in_envelope_intersecting if inter
                      else ops.locate_in_envelope)(FX.rects_ds(sf_small), *b)
            want = set(single.to_pandas()["id"])
            assert set(got[got["box_id"] == j]["id"]) == want
            assert len(want) > 0 or not inter


def test_spatial_self_join_empty_input(ray_session):
    """Empty input -> typed empty pair table (schema stable)."""
    import pyarrow as pa
    import ray.data as rd

    from geograft import grid as G

    empty = rd.from_arrow(pa.table({
        "id": pa.array([], type=pa.int64()),
        "minx": pa.array([], type=pa.float64()),
        "miny": pa.array([], type=pa.float64()),
        "maxx": pa.array([], type=pa.float64()),
        "maxy": pa.array([], type=pa.float64()),
    }))
    out = ops.spatial_self_join(empty, level=3, bounds=G.Bounds(0, 0, 10, 10))
    df = out.to_pandas()
    assert len(df) == 0
