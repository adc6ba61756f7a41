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


def _ts_us(col: "pa.ChunkedArray | pa.Array") -> "pa.ChunkedArray | pa.Array":
    """Normalize any temporal column to int64 epoch MICROSECONDS so
    mixed-resolution sides compare correctly (timestamp[s|ms|us|ns],
    date32/64 all normalize; a bare int64 is taken as already-us)."""
    t = col.type
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return col.cast(pa.timestamp("us")).cast(pa.int64())
    return col.cast(pa.int64())


def _key_hash_for_bucket(key: "pa.Array") -> np.ndarray:
    """int64 hash view of a key column for coarse bucketing — integer
    keys pass through (dtype-widened only for the hash, never in the
    output schema); strings go through the stable 64-bit text hash."""
    if pa.types.is_integer(key.type):
        return key.cast(pa.int64()).to_numpy(zero_copy_only=False)
    from . import textops as T
    return T._stable_hash(key.cast(pa.string())).astype(np.int64)


def _group_key_window(key_arr: "pa.Array", win: np.ndarray):
    """Group rows on (key, window) without stacking heterogeneous
    dtypes: factorize each axis separately and combine the codes. The
    key keeps its exact input dtype in the output (string user ids
    work; narrow ints are not promoted to int64)."""
    kcodes, kuniq = pd.factorize(key_arr.to_numpy(zero_copy_only=False),
                                 sort=True)
    wuniq, wcodes = np.unique(win, return_inverse=True)
    comb = kcodes.astype(np.int64) * len(wuniq) + wcodes
    cu, inv = np.unique(comb, return_inverse=True)
    out_key = pa.array(kuniq).take(pa.array(cu // len(wuniq))).cast(
        key_arr.type)
    out_win = wuniq[cu % len(wuniq)]
    return out_key, out_win, inv, len(cu)


def tumbling_window_agg(ds, window_us: int = US_PER_HOUR,
                        key_col: str = "user_id", ts_col: str = "ts",
                        val_col: str = "value"):
    """Per (key, tumbling window): count + sum + min + max of value.

    Partial aggregation inside map_batches (one row per (key, window)
    per batch) then a coarse-bucket combine — the exchange carries
    partials, not events.
    """
    from .ops import coarse_bucket_ids
    from .scale import shuffle_buckets

    nb = shuffle_buckets(ds)

    def partial(b: pa.Table) -> pa.Table:
        ts = _ts_us(b.column(ts_col)).to_numpy()  # epoch micros
        win = ts // window_us
        key_arr = b.column(key_col)
        if isinstance(key_arr, pa.ChunkedArray):
            key_arr = key_arr.combine_chunks()
        val = b.column(val_col).to_numpy()
        out_key, out_win, inv, ng = _group_key_window(key_arr, win)
        n = np.bincount(inv)
        s = np.bincount(inv, weights=val)
        mn = np.full(ng, np.inf)
        mx = np.full(ng, -np.inf)
        np.minimum.at(mn, inv, val)
        np.maximum.at(mx, inv, val)
        return pa.table(
            {
                key_col: out_key,
                "win": out_win,
                "n": n.astype(np.int64),
                "sum_value": s,
                "min_value": mn,
                "max_value": mx,
                "__khash": _key_hash_for_bucket(out_key),
            }
        )

    part = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def combine(g: pa.Table) -> pa.Table:
        cols = [key_col, "win", "n", "sum_value", "min_value", "max_value"]
        out = g.select(cols).to_pandas().groupby(
            [key_col, "win"], sort=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum"),
            min_value=("min_value", "min"), max_value=("max_value", "max"),
        ).reset_index()
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    from .ops import coarse_group_by_cell

    return coarse_group_by_cell(part, combine, key_col="__khash",
                                n_buckets=nb)


def hopping_window_agg(ds, window_us: int = US_PER_HOUR,
                       hop_us: int = US_PER_HOUR // 4,
                       key_col: str = "user_id", ts_col: str = "ts",
                       val_col: str = "value"):
    """Per (key, hopping window): count + sum + min + max of value.
    Window w covers [w*hop, w*hop + window); an event belongs to the
    window/hop overlapping windows. Same partial-aggregate shape as the
    tumbling op — each event is replicated to its windows INSIDE the
    batch (vectorized expansion), partials pre-combine per batch, and
    the exchange carries one row per (key, window) per batch, never
    the replicated events."""
    from .ops import coarse_bucket_ids
    from .scale import shuffle_buckets

    nb = shuffle_buckets(ds)

    def partial(b: pa.Table) -> pa.Table:
        ts = _ts_us(b.column(ts_col)).to_numpy()
        w_hi = ts // hop_us
        w_lo = (ts - window_us) // hop_us + 1
        reps = (w_hi - w_lo + 1).astype(np.int64)
        total = int(reps.sum())
        pos = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps)
        win = np.repeat(w_lo, reps) + pos
        key_arr = b.column(key_col)
        if isinstance(key_arr, pa.ChunkedArray):
            key_arr = key_arr.combine_chunks()
        key_rep = key_arr.take(pa.array(np.repeat(
            np.arange(len(b), dtype=np.int64), reps)))
        val = np.repeat(b.column(val_col).to_numpy(), reps)
        out_key, out_win, inv, ng = _group_key_window(key_rep, win)
        n = np.bincount(inv)
        s = np.bincount(inv, weights=val)
        mn = np.full(ng, np.inf)
        mx = np.full(ng, -np.inf)
        np.minimum.at(mn, inv, val)
        np.maximum.at(mx, inv, val)
        return pa.table(
            {
                key_col: out_key,
                "win": out_win,
                "n": n.astype(np.int64),
                "sum_value": s,
                "min_value": mn,
                "max_value": mx,
                "__khash": _key_hash_for_bucket(out_key),
            }
        )

    part = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def combine(g: pa.Table) -> pa.Table:
        cols = [key_col, "win", "n", "sum_value", "min_value", "max_value"]
        out = g.select(cols).to_pandas().groupby(
            [key_col, "win"], sort=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum"),
            min_value=("min_value", "min"), max_value=("max_value", "max"),
        ).reset_index()
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    from .ops import coarse_group_by_cell

    return coarse_group_by_cell(part, combine, key_col="__khash",
                                n_buckets=nb)


def asof_join(left_ds, right_ds, left_key: str, right_key: str,
              left_ts: str, right_ts: str, right_cols: list[str]):
    """As-of join: for each left row, the latest right row with the same
    key and right_ts <= left_ts.

    Shape: both sides coarse-bucketed on the key hash (equal keys
    co-locate), union, then a vectorized ``pd.merge_asof`` per
    partition. The exchange ships only the needed right columns.
    Output: all left columns + requested right columns (null when no
    match) — matching ANSI/DuckDB ``ASOF JOIN`` semantics.
    """
    from .scale import shuffle_buckets

    nb = shuffle_buckets(left_ds, right_ds)
    left_cols = [c for c in left_ds.schema().names]
    # a right column sharing a left column's name would be silently
    # shadowed by pd.merge_asof's suffix renaming — refuse up front
    clash = set(right_cols) & set(left_cols)
    if clash:
        raise ValueError(
            f"right_cols {sorted(clash)} collide with left columns; "
            "rename the right side before joining"
        )

    # the bucket routes on a 64-bit hash (__key); the exact key value
    # travels as __keyval so a hash collision between two distinct keys
    # (possible with string keys) can never cross-match in merge_asof.
    lsch0, rsch0 = left_ds.schema(), right_ds.schema()
    lk_t = lsch0.types[lsch0.names.index(left_key)]
    rk_t = rsch0.types[rsch0.names.index(right_key)]
    if pa.types.is_integer(lk_t) and pa.types.is_integer(rk_t):
        keyval_t = pa.int64()
    else:
        keyval_t = pa.large_string() if (
            pa.types.is_large_string(lk_t) or pa.types.is_large_string(rk_t)
        ) else pa.string()

    def tag(side: int, key: str, ts: str, keep: list[str]):
        def f(b: pa.Table) -> pa.Table:
            karr = b.column(key)
            if isinstance(karr, pa.ChunkedArray):
                karr = karr.combine_chunks()
            # bucket-hash the CAST key, not the raw column: with mixed
            # int/string sides (keyval_t == string) the raw int would
            # pass through _key_hash_for_bucket while the string side
            # xxhashes, so equal keys would land in different buckets
            kval = karr.cast(keyval_t)
            out = {
                "__key": pa.array(_key_hash_for_bucket(kval)),
                "__keyval": kval,
                "__ts": _ts_us(b.column(ts)),
                "__side": pa.array(np.full(len(b), side, dtype=np.int8)),
            }
            for c in keep:
                out[c] = b.column(c)
            return pa.table(out)

        return f

    lt = left_ds.map_batches(
        tag(0, left_key, left_ts, left_cols), batch_format="pyarrow", batch_size=None
    )
    rt = right_ds.map_batches(
        tag(1, right_key, right_ts, right_cols), batch_format="pyarrow", batch_size=None
    )

    # align schemas for the union: fill the other side's columns with nulls
    def pad(missing: list[str]):
        def f(b: pa.Table) -> pa.Table:
            for c, typ in missing:
                b = b.append_column(c, pa.nulls(len(b), type=typ))
            return b

        return f

    # expected tagged schemas, derived from the INPUT schemas (an empty
    # side's post-map schema is unknown — Ray skips UDFs on empty data)
    meta_fields = [("__key", pa.int64()), ("__keyval", keyval_t),
                   ("__ts", pa.int64()), ("__side", pa.int8())]
    lsch = left_ds.schema()
    rsch = right_ds.schema()
    l_fields = dict(meta_fields)
    for n in left_cols:
        l_fields[n] = lsch.types[lsch.names.index(n)]
    r_fields = dict(meta_fields)
    for n in right_cols:
        r_fields[n] = rsch.types[rsch.names.index(n)]
    l_missing = [(n, t) for n, t in r_fields.items() if n not in l_fields]
    r_missing = [(n, t) for n, t in l_fields.items() if n not in r_fields]
    lt = lt.map_batches(pad(l_missing), batch_format="pyarrow", batch_size=None)
    rt = rt.map_batches(pad(r_missing), batch_format="pyarrow", batch_size=None)
    all_names = sorted(set(l_fields) | set(r_fields))
    lt = lt.select_columns(all_names)
    rt = rt.select_columns(all_names)
    both = lt.union(rt)

    out_fields = [(c, l_fields[c]) for c in left_cols] + \
                 [(c, r_fields[c]) for c in right_cols]

    def _empty_out() -> pa.Table:
        return pa.table({c: pa.array([], type=t) for c, t in out_fields})

    def per_bucket(g: pa.Table) -> pa.Table:
        """Sides are split WHILE STILL ARROW: a mixed-side pandas
        conversion would promote int64-with-nulls (the union's padding)
        to float64 and corrupt exact integer columns. Each side converts
        separately (no nulls in its own columns), and the merged output
        is cast back to the input Arrow types — NaN from unmatched left
        rows becomes a proper null, not a float."""
        if g.num_rows == 0 or "__side" not in g.column_names:
            return _empty_out()
        side = g.column("__side").to_numpy()
        lg = g.filter(pa.array(side == 0)).select(
            ["__keyval", "__ts", *left_cols]).to_pandas()
        if len(lg) == 0:
            return _empty_out()
        rg = g.filter(pa.array(side == 1)).select(
            ["__keyval", "__ts", *right_cols]).to_pandas()
        lg = lg.sort_values("__ts", kind="stable")
        rg = rg.sort_values("__ts", kind="stable")
        merged = pd.merge_asof(
            lg, rg, on="__ts", by="__keyval", direction="backward",
        )
        return pa.table(
            {c: pa.array(merged[c], type=t, from_pandas=True)
             for c, t in out_fields}
        )

    from .ops import coarse_group_by_cell

    return coarse_group_by_cell(both, per_bucket, key_col="__key",
                                n_buckets=nb)


def session_windows(ds, gap_us: int = 30 * 60 * 1_000_000,
                    key_col: str = "user_id", ts_col: str = "ts"):
    """Session windows per key: events closer than `gap_us` chain into
    one session. Exact, via one shuffle co-locating each key's events
    (coarse-bucketed) and a vectorized sort + gap-split per partition.

    Output: key, session_start (epoch us), session_end, n_events.
    """
    from .ops import coarse_bucket_ids
    from .scale import shuffle_buckets

    nb = shuffle_buckets(ds)

    def keyed(b: pa.Table) -> pa.Table:
        key = b.column(key_col).to_numpy()
        ts = _ts_us(b.column(ts_col)).to_numpy()
        return pa.table(
            {
                key_col: key,
                "ts_us": ts,
            }
        )

    part = ds.map_batches(keyed, batch_format="pyarrow", batch_size=None)

    def sessions(gt: pa.Table) -> pa.Table:
        if gt.num_rows == 0 or key_col not in gt.column_names:
            return pa.table({key_col: pa.array([], type=pa.int64()),
                             "session_start": pa.array([], type=pa.int64()),
                             "session_end": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64())})
        g = gt.select([key_col, "ts_us"]).to_pandas()
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
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    from .ops import coarse_group_by_cell

    return coarse_group_by_cell(part, sessions, key_col=key_col,
                                n_buckets=nb)
