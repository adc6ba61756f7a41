"""Windowed / session ops over events vs DuckDB oracles."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from geograft import eventops as E
from geograft.io import read_parquet_sized


@pytest.fixture(scope="module")
def con(sf_small):
    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_small}/events.parquet')")
    return c


def ev_ds(sf):
    return read_parquet_sized(f"{sf}/events.parquet", columns=["event_id", "ts", "user_id", "value"])


def test_tumbling_window_vs_sql(ray_session, con, sf_small):
    got = (
        E.tumbling_window_agg(ev_ds(sf_small))
        .to_pandas()
        .sort_values(["user_id", "win"])
        .reset_index(drop=True)
    )
    want = con.sql(
        "SELECT user_id, CAST(floor(epoch_us(ts)/3600000000.0) AS BIGINT) AS win, "
        "count(*) AS n, sum(value) AS sum_value, min(value) AS min_value, max(value) AS max_value "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["user_id", "win", "n", "min_value", "max_value"]],
        want[["user_id", "win", "n", "min_value", "max_value"]],
        check_dtype=False,
    )
    np.testing.assert_allclose(got["sum_value"], want["sum_value"], rtol=1e-12)


def test_session_windows_vs_sql(ray_session, con, sf_small):
    gap = 30 * 60 * 1_000_000
    got = (
        E.session_windows(ev_ds(sf_small), gap_us=gap)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    want = con.sql(f"""
        WITH t AS (
          SELECT user_id, epoch_us(ts) AS ts_us,
                 CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {gap}
                      OR LAG(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
        ), s AS (
          SELECT user_id, ts_us,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM t
        )
        SELECT user_id, min(ts_us) AS session_start, max(ts_us) AS session_end,
               count(*) AS n_events
        FROM s GROUP BY user_id, sid ORDER BY user_id, session_start
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["n_events"].sum() == 1000

def test_hopping_window_vs_brute(ray_session, sf_small):
    """Every event lands in exactly window/hop overlapping windows;
    aggregates equal a brute-force replicate + pandas groupby."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from geograft import eventops as EV

    t = pq.read_table(f"{sf_small}/events.parquet",
                      columns=["ts", "user_id", "value"])
    W, H = EV.US_PER_HOUR, EV.US_PER_HOUR // 4
    got = EV.hopping_window_agg(
        rd.from_arrow(t), window_us=W, hop_us=H
    ).to_pandas().sort_values(["user_id", "win"]).reset_index(drop=True)

    ts = EV._ts_us(t.column("ts")).to_numpy()
    rows = []
    for tus, u, v in zip(ts, t.column("user_id").to_numpy(),
                         t.column("value").to_numpy()):
        w_lo = (tus - W) // H + 1
        w_hi = tus // H
        assert w_hi - w_lo + 1 == W // H
        for w in range(int(w_lo), int(w_hi) + 1):
            rows.append((u, w, v))
    df = pd.DataFrame(rows, columns=["user_id", "win", "value"])
    want = df.groupby(["user_id", "win"]).agg(
        n=("value", "size"), sum_value=("value", "sum"),
        min_value=("value", "min"), max_value=("value", "max")
    ).reset_index().sort_values(["user_id", "win"]).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["user_id", "win", "n", "min_value", "max_value"]],
        want[["user_id", "win", "n", "min_value", "max_value"]],
        check_dtype=False)
    np.testing.assert_allclose(got["sum_value"], want["sum_value"], rtol=1e-12)

def test_windows_string_and_narrow_int_keys(ray_session):
    """Window aggregates must group correctly on STRING keys and keep a
    narrow-int key dtype in the output (the old np.stack([key, win])
    path crashed on strings and promoted int32 keys to int64)."""
    import pyarrow as pa
    import ray.data as rd

    H = E.US_PER_HOUR
    ts = pa.array(
        np.array([0, 10, H + 5, 5, H + 1, 2 * H + 7], dtype=np.int64))
    t = pa.table({
        "ts": ts,
        "user_id": pa.array(["u-b", "u-a", "u-a", "u-b", "u-b", "u-a"]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
    })
    got = (E.tumbling_window_agg(rd.from_arrow(t), window_us=H)
           .to_pandas().sort_values(["user_id", "win"]).reset_index(drop=True))
    assert got["user_id"].tolist() == ["u-a", "u-a", "u-a", "u-b", "u-b"]
    assert got["win"].tolist() == [0, 1, 2, 0, 1]
    assert got["n"].tolist() == [1, 1, 1, 2, 1]
    np.testing.assert_allclose(got["sum_value"], [2.0, 3.0, 6.0, 5.0, 5.0])

    hop = (E.hopping_window_agg(rd.from_arrow(t), window_us=H, hop_us=H // 2)
           .to_pandas())
    # every event lands in exactly 2 hops; totals must be preserved
    assert hop["n"].sum() == 2 * len(t)
    assert set(hop["user_id"]) == {"u-a", "u-b"}

    # narrow-int keys keep their dtype through the partial stage
    t32 = t.set_column(1, "user_id",
                       pa.array(np.array([7, 3, 3, 7, 7, 3], dtype=np.int32)))
    got32 = (E.tumbling_window_agg(rd.from_arrow(t32), window_us=H)
             .to_pandas().sort_values(["user_id", "win"]).reset_index(drop=True))
    assert got32["n"].sum() == len(t32)
    assert set(got32["user_id"]) == {3, 7}
