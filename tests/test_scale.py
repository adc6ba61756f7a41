"""Data-size-driven shuffle sizing (scale.py) — the 100-TB guard:
map_groups buckets must stay bounded as the input grows."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geograft import scale as S


def _docs_table(n: int, pad: int = 2000) -> pa.Table:
    filler = "x" * pad
    return pa.table({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [f"doc {i} {filler}" for i in range(n)],
    })


def test_estimates_do_not_execute(ray_session):
    import ray.data as rd

    boom_calls = []

    def boom(b):
        boom_calls.append(1)
        return b

    ds = rd.from_arrow(_docs_table(500)).map_batches(
        boom, batch_format="pyarrow")
    est = S.input_bytes_estimate(ds)
    rows = S.input_rows_estimate(ds)
    assert est and est > 500 * 2000
    assert rows == 500
    assert not boom_calls, "sizing must never execute the pipeline"


def test_estimates_from_parquet_metadata(ray_session, sf_small, tmp_path):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_small}/documents.parquet").select_columns(
        ["doc_id", "text"])
    n_real = pq.read_metadata(f"{sf_small}/documents.parquet").num_rows
    assert S.input_rows_estimate(ds) == n_real
    assert S.input_bytes_estimate(ds) > 0


def test_bucket_count_grows_with_input(ray_session):
    """The VERDICT round-2 criterion: a synthetically enlarged input
    must yield MORE buckets, so one map_groups bucket's bytes stay
    ~TARGET_BUCKET_BYTES instead of growing with the data."""
    import ray.data as rd

    small = rd.from_arrow(_docs_table(100))
    big = rd.from_arrow(_docs_table(4000, pad=4000))
    target = 100_000  # shrink the target so fixture-sized inputs differ
    nb_small = S.shuffle_buckets(small, target_bytes=target, floor=4)
    nb_big = S.shuffle_buckets(big, target_bytes=target, floor=4)
    assert nb_big > nb_small >= 4
    # bytes per bucket stays bounded near the target
    est_big = S.input_bytes_estimate(big)
    assert est_big / nb_big <= target * 1.5
    # floor dominates tiny inputs; count is never below it
    assert S.shuffle_buckets(small, target_bytes=1 << 40, floor=16) == 16


def test_shuffle_buckets_sums_join_sides(ray_session):
    import ray.data as rd

    a = rd.from_arrow(_docs_table(1000))
    b = rd.from_arrow(_docs_table(1000))
    one = S.shuffle_buckets(a, target_bytes=50_000, floor=2)
    both = S.shuffle_buckets(a, b, target_bytes=50_000, floor=2)
    assert both > one


def test_ops_stay_exact_under_forced_bucket_counts(ray_session):
    """Correctness must be bucket-count-invariant: dedup over an
    explicit large bucket count equals the default."""
    import ray.data as rd

    from geograft import textops as T

    t = _docs_table(300, pad=10)
    # plant duplicates
    texts = t.column("text").to_pylist()
    texts[250] = texts[10]
    texts[251] = texts[10]
    t = t.set_column(1, "text", pa.array(texts))
    base = np.sort(
        T.dedup_exact(rd.from_arrow(t)).to_pandas()["doc_id"].to_numpy())
    forced = np.sort(
        T.dedup_exact(rd.from_arrow(t), n_buckets=97)
        .to_pandas()["doc_id"].to_numpy())
    np.testing.assert_array_equal(base, forced)
    assert len(base) == 298


def test_checkpointed_dedup_resume_reuses_manifest_bucket_count(
        ray_session, tmp_path):
    """A resumed run must reuse the manifest's n_buckets even when the
    freshly-estimated count would differ — bucket ids are only
    meaningful under the count that produced them."""
    import ray.data as rd

    from geograft import textops as T

    t = _docs_table(200, pad=50)
    out = str(tmp_path / "ckpt")
    man1 = T.checkpointed_dedup_exact(rd.from_arrow(t), out)
    nb1 = man1["n_buckets"]
    assert nb1 >= 16
    # resume against a BIGGER input: count must stick to the manifest
    big = rd.from_arrow(_docs_table(200, pad=50))
    man2 = T.checkpointed_dedup_exact(big, out)
    assert man2["n_buckets"] == nb1
    assert man2["resumed_buckets"] > 0
    with open(f"{out}/manifest.json") as f:
        assert json.load(f)["n_buckets"] == nb1


def test_auto_n_planes_sizing(ray_session):
    """n_planes follows log2(N/target): 10x the input adds ~3-4 planes,
    keeping expected bucket population constant; recall/soundness on a
    planted duplicate survives auto sizing at the larger scale."""
    import ray.data as rd

    from geograft import annops as A

    rng = np.random.default_rng(5)
    d = 16

    def emb_table(n):
        m = rng.standard_normal((n, d))
        m[n - 1] = m[0] + rng.standard_normal(d) * 0.01  # planted near-dup
        off = np.arange(0, (n + 1) * d, d, dtype=np.int32)
        return pa.table({
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.ListArray.from_arrays(
                pa.array(off), pa.array(m.ravel())),
        })

    small, big = emb_table(640), emb_table(6400)
    p_small = A.auto_n_planes(rd.from_arrow(small))
    p_big = A.auto_n_planes(rd.from_arrow(big))
    assert p_big - p_small in (3, 4)
    assert p_small == int(np.ceil(np.log2(640 / A.TARGET_LSH_BUCKET_ROWS)))
    out = A.embedding_neardup(rd.from_arrow(big), threshold=0.9).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (0, 6399) in pairs, "planted near-dup must survive auto sizing"
    # soundness: every reported pair really is >= threshold
    assert (out["cos"] >= 0.9).all()
