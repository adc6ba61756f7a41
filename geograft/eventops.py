"""Stream-shaped operators over the `events` log table.

Ray Data has no event-time windows; the batch re-expression (per the
public Ray guidance) treats the log as a partitioned, timestamp-ordered
table: tumbling windows become a grouped aggregate on
(key, floor(ts/size)) computed as per-batch partials + one small
groupby — no per-row Python, no per-key groups.

rstar itself has no streaming surface (SURVEY.md §2.8); these ops are
part of the engine's training-data-pipeline extension, with exact ANSI
SQL oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

US_PER_HOUR = 3_600_000_000


def tumbling_window_agg(ds, window_us: int = US_PER_HOUR,
                        key_col: str = "user_id", ts_col: str = "ts",
                        val_col: str = "value"):
    """Per (key, tumbling window): count + sum + min + max of value.

    Partial aggregation inside map_batches (one row per (key, window)
    per batch) then a coarse-bucket combine — the exchange carries
    partials, not events.
    """
    from . import textops as T

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column(ts_col).cast(pa.int64()).to_numpy()  # epoch micros
        win = ts // window_us
        key = b.column(key_col).to_numpy()
        val = b.column(val_col).to_numpy()
        pair = np.stack([key, win], axis=1)
        uniq, inv = np.unique(pair, axis=0, return_inverse=True)
        n = np.bincount(inv)
        s = np.bincount(inv, weights=val)
        mn = np.full(len(uniq), np.inf)
        mx = np.full(len(uniq), -np.inf)
        np.minimum.at(mn, inv, val)
        np.maximum.at(mx, inv, val)
        return pa.table(
            {
                key_col: uniq[:, 0],
                "win": uniq[:, 1],
                "n": n.astype(np.int64),
                "sum_value": s,
                "min_value": mn,
                "max_value": mx,
                "__bucket": (
                    uniq[:, 0].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                    % np.uint64(T.N_COARSE)
                ).astype(np.int64),
            }
        )

    part = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby([key_col, "win"], sort=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum"),
            min_value=("min_value", "min"), max_value=("max_value", "max"),
        ).reset_index()
        return out

    return part.groupby("__bucket").map_groups(combine, batch_format="pandas")


def session_windows(ds, gap_us: int = 30 * 60 * 1_000_000,
                    key_col: str = "user_id", ts_col: str = "ts"):
    """Session windows per key: events closer than `gap_us` chain into
    one session. Exact, via one shuffle co-locating each key's events
    (coarse-bucketed) and a vectorized sort + gap-split per partition.

    Output: key, session_start (epoch us), session_end, n_events.
    """
    from . import textops as T

    def keyed(b: pa.Table) -> pa.Table:
        key = b.column(key_col).to_numpy()
        ts = b.column(ts_col).cast(pa.int64()).to_numpy()
        return pa.table(
            {
                key_col: key,
                "ts_us": ts,
                "__bucket": (
                    key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                    % np.uint64(T.N_COARSE)
                ).astype(np.int64),
            }
        )

    part = ds.map_batches(keyed, batch_format="pyarrow", batch_size=None)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({key_col: pd.Series([], dtype=np.int64),
                                 "session_start": pd.Series([], dtype=np.int64),
                                 "session_end": pd.Series([], dtype=np.int64),
                                 "n_events": pd.Series([], dtype=np.int64)})
        g = g.sort_values([key_col, "ts_us"], kind="stable")
        key = g[key_col].to_numpy()
        ts = g["ts_us"].to_numpy()
        new_key = np.empty(len(g), dtype=bool)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        gap = np.empty(len(g), dtype=bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        start = new_key | gap
        sid = np.cumsum(start) - 1
        out = pd.DataFrame({key_col: key, "sid": sid, "ts": ts})
        agg = out.groupby("sid", sort=True).agg(
            **{key_col: (key_col, "first")},
            session_start=("ts", "min"), session_end=("ts", "max"),
            n_events=("ts", "size"),
        ).reset_index(drop=True)
        agg["n_events"] = agg["n_events"].astype(np.int64)
        return agg

    return part.groupby("__bucket").map_groups(sessions, batch_format="pandas")
