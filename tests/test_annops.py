"""Embedding similarity ops: exact brute-force oracle + LSH recall."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from geograft import annops as A
from geograft.io import read_parquet_sized


def emb_ds(sf_dir):
    return read_parquet_sized(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(sf_small):
    t = pq.read_table(f"{sf_small}/embeddings.parquet")
    m = A._emb_matrix(t)
    return t.column("vec_id").to_numpy(), m


def test_cosine_topk_vs_numpy(ray_session, sf_small, emb_np):
    ids, m = emb_np
    q = m[:3]
    got = A.cosine_topk(emb_ds(sf_small), q, k=5)
    mn = A._normalize(m)
    qn = A._normalize(q)
    sims = mn @ qn.T
    for qi in range(3):
        order = np.lexsort((ids, -sims[:, qi]))[:5]
        g = got[got["qid"] == qi]
        np.testing.assert_array_equal(g["vec_id"].to_numpy(), ids[order])
        np.testing.assert_allclose(g["cos"].to_numpy(), sims[order, qi], rtol=1e-12)


def test_cosine_topk_self_is_top1(ray_session, sf_small, emb_np):
    ids, m = emb_np
    got = A.cosine_topk(emb_ds(sf_small), m[7:8], k=1)
    assert got["vec_id"].iloc[0] == ids[7]
    assert abs(got["cos"].iloc[0] - 1.0) < 1e-12


def test_lsh_topk_recall(ray_session, sf_small, emb_np):
    ids, m = emb_np
    q = m[:20]
    exact = A.cosine_topk(emb_ds(sf_small), q, k=10)
    approx = A.cosine_topk_lsh(emb_ds(sf_small), q, k=10, n_planes=6, multiprobe=2)
    recalls = []
    for qi in range(20):
        e = set(exact[exact["qid"] == qi]["vec_id"])
        a = set(approx[approx["qid"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    # the fixture embeddings are near-random 64-dim vectors, so true
    # neighbors are weakly clustered — recall ~0.55 at a ~34% scan
    # fraction is the honest LSH trade-off on this data
    assert np.mean(recalls) >= 0.45, f"LSH mean recall too low: {np.mean(recalls)}"
    # the query vector itself is always found (it shares its own bucket)
    for qi in range(20):
        a = approx[approx["qid"] == qi]
        assert ids[qi] in set(a["vec_id"])


def test_embedding_neardup_sound(ray_session, sf_small, emb_np):
    ids, m = emb_np
    got = A.embedding_neardup(emb_ds(sf_small), threshold=0.9).to_pandas()
    mn = A._normalize(m)
    sims = mn @ mn.T
    pos = {v: i for i, v in enumerate(ids)}
    for r in got.itertuples():
        assert sims[pos[r.a], pos[r.b]] >= 0.9  # soundness: exact cosine
        assert r.a < r.b


def test_cosine_topk_tie_break_by_id(ray_session):
    """Exact-duplicate embeddings tying at the k-th slot must resolve to
    the smallest ids — the (qid, -cos, vec_id) contract."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geograft import annops as A

    rng = np.random.default_rng(3)
    base = rng.standard_normal(8)
    vecs = [rng.standard_normal(8) * 0.1 - base for _ in range(10)]
    vecs += [base.copy() for _ in range(5)]  # ids 10..14 all tie at cos=1
    tbl = pa.table({
        "vec_id": np.arange(15, dtype=np.int64),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float64())),
    })
    out = A.cosine_topk(rd.from_arrow(tbl), base, k=3)
    assert out["vec_id"].tolist() == [10, 11, 12]


def test_embedding_neardup_recall_on_planted_dups(ray_session):
    """Planted near-duplicate vectors (cos >= 0.95) must be recovered by
    the banded sign-LSH at default parameters; reported cosines exact."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geograft import annops as A

    rng = np.random.default_rng(17)
    base = A._normalize(rng.standard_normal((40, 32)))
    vecs = [base]
    # 40 near-dups: ids 40..79 are tiny perturbations of ids 0..39
    vecs.append(A._normalize(base + rng.standard_normal((40, 32)) * 0.02))
    m = np.concatenate(vecs)
    tbl = pa.table({
        "vec_id": np.arange(len(m), dtype=np.int64),
        "embedding": pa.array([v.tolist() for v in m],
                              type=pa.list_(pa.float64())),
    })
    got = A.embedding_neardup(rd.from_arrow(tbl), threshold=0.95).to_pandas()
    mn = A._normalize(m)
    sims = mn @ mn.T
    ai, bi = np.triu_indices(len(m), 1)
    true_pairs = {(int(a), int(b)) for a, b in zip(ai[sims[ai, bi] >= 0.95],
                                                   bi[sims[ai, bi] >= 0.95])}
    got_pairs = set(zip(got["a"], got["b"]))
    assert got_pairs <= true_pairs           # soundness (exact cosine verify)
    assert len(true_pairs) >= 40
    assert len(got_pairs) / len(true_pairs) >= 0.9   # banded recall
    for r in got.itertuples():
        np.testing.assert_allclose(r.cos, sims[r.a, r.b])

def test_ivf_build_assign_and_recall(ray_session):
    # clustered synthetic embeddings: IVF must recover near-perfect
    # recall probing a fraction of the centroids, and report EXACT
    # cosine values for everything it returns
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(3)
    n_clusters, per, d = 12, 300, 16
    centers = A._normalize(rng.standard_normal((n_clusters, d)))
    pts = np.repeat(centers, per, axis=0) + 0.08 * rng.standard_normal(
        (n_clusters * per, d))
    ids = np.arange(len(pts), dtype=np.int64)
    flat = pts.astype(np.float32).ravel()
    t = pa.table({
        "vec_id": ids,
        "embedding": pa.FixedSizeListArray.from_arrays(pa.array(flat), d),
    })

    def ds():
        return rd.from_arrow(t).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=512)

    cm = A.ivf_build(ds(), n_centroids=n_clusters, iters=5)
    assert cm.shape == (n_clusters, d)
    np.testing.assert_allclose(np.linalg.norm(cm, axis=1), 1.0, rtol=1e-9)
    # every trained centroid sits near one true cluster center
    best = (A._normalize(cm) @ centers.T).max(axis=1)
    assert (best > 0.95).all(), f"centroids off-cluster: {best}"

    assigned = A.ivf_assign(ds(), cm).to_pandas()
    assert assigned["cid"].nunique() == n_clusters

    q = pts[::500][:6]
    exact = A.cosine_topk(ds(), q, k=10)
    approx = A.cosine_topk_ivf(ds(), q, k=10, n_centroids=n_clusters,
                               nprobe=3, iters=5)
    # reference from the STORED (float32-rounded) values, like the ops
    mn = A._normalize(pts.astype(np.float32).astype(np.float64))
    qn = A._normalize(q)
    sims = mn @ qn.T
    recalls = []
    for qi in range(len(q)):
        e = set(exact[exact["qid"] == qi]["vec_id"])
        a = approx[approx["qid"] == qi]
        recalls.append(len(e & set(a["vec_id"])) / len(e))
        for r in a.itertuples():  # soundness: exact cosine on every row
            np.testing.assert_allclose(r.cos, sims[r.vec_id, qi], rtol=1e-9)
    assert np.mean(recalls) >= 0.95, f"IVF recall too low: {recalls}"

    # deterministic end to end
    again = A.cosine_topk_ivf(ds(), q, k=10, n_centroids=n_clusters,
                              nprobe=3, iters=5)
    assert approx.reset_index(drop=True).equals(again.reset_index(drop=True))


def test_ann_index_build_query_exact_and_resume(ray_session, sf_small, tmp_path):
    """Persisted IVF index: (1) nprobe=n_centroids degrades to EXACT
    brute force (same rows as cosine_topk, ties included); (2) nprobe=4
    keeps decent recall; (3) a rebuild resumes every finished list and
    REUSES the stored quantizer."""
    import pyarrow.parquet as pq

    from geograft import annops as A
    from geograft.io import read_parquet_sized

    path = str(tmp_path / "annidx")
    emb = read_parquet_sized(f"{sf_small}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    man = A.build_ann_index(emb, path, n_centroids=16, iters=3)
    assert man["total_rows"] == emb.count()
    assert man["built_lists"] == len(man["lists"]) > 1

    q = pq.read_table(f"{sf_small}/embeddings.parquet").slice(0, 8)
    qv = A._emb_matrix(q)
    exact = A.cosine_topk(emb, qv, k=5)
    full = A.ann_query_index(path, qv, k=5, nprobe=16)
    # same (qid, vec_id) rows in the same order; cos to 1 ulp (BLAS
    # blocking differs between the full-block and per-list matmuls)
    assert full[["qid", "vec_id"]].reset_index(drop=True).equals(
        exact[["qid", "vec_id"]].reset_index(drop=True))
    np.testing.assert_allclose(full["cos"].to_numpy(),
                               exact["cos"].to_numpy(), atol=1e-12)

    approx = A.ann_query_index(path, qv, k=5, nprobe=4)
    got = set(map(tuple, approx[["qid", "vec_id"]].to_numpy()))
    want = set(map(tuple, exact[["qid", "vec_id"]].to_numpy()))
    assert len(got & want) / len(want) >= 0.5

    man2 = A.build_ann_index(emb, path, n_centroids=16, iters=3)
    assert man2["built_lists"] == 0
    assert man2["resumed_lists"] == len(man["lists"])
    assert man2["centroids"] == man["centroids"]


def test_ann_query_index_no_matching_lists(ray_session, sf_small, tmp_path):
    """Queries probing only empty/absent lists return a typed empty
    frame (schema stable for the driver compare)."""
    import numpy as np

    from geograft import annops as A
    from geograft.io import read_parquet_sized

    path = str(tmp_path / "annidx2")
    emb = read_parquet_sized(f"{sf_small}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    man = A.build_ann_index(emb, path, n_centroids=8, iters=2)
    d = len(man["centroids"][0])
    out = A.ann_query_index(path, np.ones((2, d)), k=3, nprobe=2)
    assert list(out.columns) == ["qid", "vec_id", "cos"]


def test_ivf_build_tree_reduce_matches_driver_fold(ray_session):
    """Contract of the two-wave tree combine (big-input path,
    tree=True) vs the bounded driver fold: the per-iteration (cnt,
    vsum) reduction is associative, but the SEED wave's
    maxmin-of-maxmin may legitimately pick different (equally spread)
    seeds than flat maxmin — so the pinned contract is (a) the
    centroid-QUALITY bar holds on BOTH paths and (b) each path is
    deterministic run-to-run. On this fixed fixture the two paths
    happen to converge to the same fixed point, asserted as a
    regression pin, not as a semantic guarantee."""
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(11)
    n_clusters, per, d = 8, 200, 12
    centers = A._normalize(rng.standard_normal((n_clusters, d)))
    pts = np.repeat(centers, per, axis=0) + 0.05 * rng.standard_normal(
        (n_clusters * per, d))
    ids = np.arange(len(pts), dtype=np.int64)
    t = pa.table({
        "vec_id": ids,
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(pts.astype(np.float32).ravel()), d),
    })
    # 10 real input blocks so the tree waves fold across blocks
    tabs = [t.slice(i, 160) for i in range(0, len(t), 160)]

    def ds():
        return rd.from_arrow(tabs).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=None)

    cm_driver = A.ivf_build(ds(), n_centroids=n_clusters, iters=4, tree=False)
    cm_tree = A.ivf_build(ds(), n_centroids=n_clusters, iters=4, tree=True)
    # (a) the real contract: quality bar on BOTH paths
    for name, cm in (("driver", cm_driver), ("tree", cm_tree)):
        best = (A._normalize(cm) @ centers.T).max(axis=1)
        assert (best > 0.95).all(), f"{name}-path centroids off-cluster: {best}"
    # regression pin only (seed waves CAN legitimately diverge on other
    # layouts): on this fixed fixture both paths reach one fixed point
    np.testing.assert_allclose(cm_tree, cm_driver, rtol=1e-9, atol=1e-12)
    # tree path is deterministic run to run
    again = A.ivf_build(ds(), n_centroids=n_clusters, iters=4, tree=True)
    np.testing.assert_array_equal(cm_tree, again)


def test_embedding_neardup_oracle_sql_matches(ray_session, sf_small):
    """The generated DuckDB SQL reproduces the sign-LSH candidates AND
    the cosine verification bit-for-bit (same promotion pattern as the
    minhash oracle): pair SETS must be identical, not just recall."""
    import duckdb

    got = A.embedding_neardup(
        emb_ds(sf_small), threshold=0.45, n_planes=4, n_bands=16
    ).to_pandas()
    ray_pairs = set(zip(got.a, got.b))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_small}/embeddings.parquet')"
    )
    sql = A.embedding_neardup_oracle_sql(threshold=0.45, n_planes=4,
                                         n_bands=16)
    sql_pairs = set(map(tuple, con.sql(sql).fetchall()))
    assert ray_pairs == sql_pairs
    assert len(ray_pairs) > 0


def test_cosine_topk_lsh_oracle_sql_matches(ray_session, sf_small):
    """The generated DuckDB SQL reproduces the LSH probe set AND the
    exact-cosine top-k order (cos DESC, id ASC tie contract)."""
    import duckdb

    qv = A._emb_matrix(pq.read_table(
        f"{sf_small}/embeddings.parquet", filters=[("vec_id", "=", 0)]))
    got = A.cosine_topk_lsh(emb_ds(sf_small), qv, k=10,
                            n_planes=6, multiprobe=2)
    got_ids = got["vec_id"].tolist()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_small}/embeddings.parquet')"
    )
    want = [r[0] for r in con.sql(A.cosine_topk_lsh_oracle_sql(
        k=10, n_planes=6, multiprobe=2)).fetchall()]
    assert got_ids == want and len(want) == 10


def test_cosine_topk_ivf_nprobe_all_is_exact(ray_session, sf_small, emb_np):
    """nprobe = n_centroids scans every inverted list, so the IVF path
    must return EXACTLY brute-force cosine_topk (ties included) —
    the contract behind the ann_ivf_topk_exact driver row."""
    import pandas as pd

    ids, m = emb_np
    qv = m[:3]
    exact = A.cosine_topk(emb_ds(sf_small), qv, k=7)
    ivf = A.cosine_topk_ivf(emb_ds(sf_small), qv, k=7,
                            n_centroids=8, nprobe=8, iters=2)
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True), ivf.reset_index(drop=True))
