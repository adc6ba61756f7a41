"""As-of join vs DuckDB ASOF JOIN oracle."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from geograft import eventops as E
from geograft.io import read_parquet_sized


def test_asof_join_vs_duckdb(ray_session, sf_small):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_small}/events.parquet')")
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_small}/orders.parquet')")

    left = read_parquet_sized(f"{sf_small}/events.parquet",
                              columns=["event_id", "ts", "user_id"])
    right = read_parquet_sized(f"{sf_small}/orders.parquet",
                               columns=["o_orderkey", "o_custkey", "o_orderdate"])
    got = E.asof_join(
        left, right,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey"],
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    want = con.sql("""
        SELECT e.event_id, m.o_orderkey
        FROM events e
        LEFT JOIN (
          SELECT e2.event_id AS eid,
                 arg_max(o.o_orderkey, epoch_us(o.o_orderdate)) AS o_orderkey
          FROM events e2 JOIN orders o
            ON o.o_custkey = e2.user_id AND epoch_us(o.o_orderdate) <= epoch_us(e2.ts)
          GROUP BY e2.event_id
        ) m ON m.eid = e.event_id
        ORDER BY e.event_id
    """).df()
    assert len(got) == len(want) == 1000
    # match rate sanity: some events have a preceding order, some don't
    matched = got["o_orderkey"].notna()
    assert matched.any() and (~matched).any() or matched.all()
    # pandas merge_asof picks the LAST right row at the max ts; the SQL
    # arg_max tie-break uses (ts, orderkey). Compare on ts-level instead:
    # recompute the oracle as max orderdate then compare orderkey sets per tie
    got_k = got["o_orderkey"].to_numpy()
    want_k = want["o_orderkey"].to_numpy()
    neq = ~((got_k == want_k) | (pd.isna(got_k) & pd.isna(want_k)))
    if neq.any():
        # allowed only where several orders share the same max orderdate
        ev = got["event_id"].to_numpy()[neq]
        for e in ev[:20]:
            ties = con.sql(f"""
                WITH m AS (SELECT max(epoch_us(o.o_orderdate)) AS mts
                           FROM events e2 JOIN orders o
                             ON o.o_custkey = e2.user_id
                            AND epoch_us(o.o_orderdate) <= epoch_us(e2.ts)
                           WHERE e2.event_id = {e})
                SELECT count(*) FROM events e2 JOIN orders o
                  ON o.o_custkey = e2.user_id, m
                 WHERE e2.event_id = {e} AND epoch_us(o.o_orderdate) = m.mts
            """).fetchall()[0][0]
            assert ties > 1, f"event {e}: mismatch not explained by a date tie"
