"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — per-batch numpy matmul against a
broadcast query matrix (the exact answer, and the verification oracle
for everything approximate). Scale path: LSH hyperplane bucketing —
sign-bit bucket keys drive a groupby so each query only scans its
bucket (+multiprobe neighbors); recall is tested against brute force.
Embedding near-duplicate detection reuses the same kernels with a
cosine threshold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _arrow_refs(ds):
    """Single-execution block refs (ops.arrow_refs; import deferred
    to keep this module import-light)."""
    from .ops import arrow_refs

    return arrow_refs(ds)


def _emb_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """(n, d) float64 from a list<float> column — zero-copy flatten."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.sqrt(np.einsum("ij,ij->i", m, m))
    norm[norm == 0] = 1.0
    return m / norm[:, None]


def _cos_reduce(batch: pa.Table, k: int, id_col: str) -> pa.Table:
    """Associative per-block combine: top-k per qid of a candidate
    block, (qid, -cos, id) tie contract (shared _topk_per_qid kernel
    with d2 = -cos)."""
    from .ops import _topk_per_qid

    if len(batch) == 0 or "qid" not in batch.column_names:
        return pa.table({"qid": pa.array([], type=pa.int64()),
                         id_col: pa.array([], type=pa.int64()),
                         "cos": pa.array([], type=pa.float64())})
    qid = batch.column("qid").to_numpy()
    ids = batch.column(id_col).to_numpy()
    cos = batch.column("cos").to_numpy()
    keep = _topk_per_qid(qid, ids, -cos, k)
    return pa.table({"qid": qid[keep], id_col: ids[keep], "cos": cos[keep]})


# below this input estimate the repartition+combine waves cost more
# than pulling the per-block partials straight to the driver
REDUCE_MIN_INPUT_BYTES = 64 << 20


def _cos_topk_finish(cand, k: int, id_col: str, reduce_blocks: int = 8):
    """Distributed final top-k for a (qid, id, cos) candidate stream:
    shuffle-free tree-reduce (repartition + associative per-block
    combine — the ops.knn shape) so the driver only ever sees
    reduce_blocks x Q x k rows, never the full candidate stream (at Q
    queries x B blocks x k the un-reduced stream is the first thing a
    1M-query user would die on). Returns (qid, id, cos) sorted by
    (qid, -cos, id). Small inputs (est < REDUCE_MIN_INPUT_BYTES) skip
    the repartition wave: each partial block is already <= Q x k rows,
    and at that scale the barrier costs more than the driver merge it
    saves (measured +0.2 s on the sf0.1 bench)."""
    import ray

    from .ops import _topk_per_qid
    from .scale import input_bytes_estimate

    est = input_bytes_estimate(cand)
    if est is None or est >= REDUCE_MIN_INPUT_BYTES:
        cand = cand.repartition(reduce_blocks).map_batches(
            _cos_reduce, fn_args=(k, id_col), batch_format="pyarrow",
            batch_size=None)
    blocks = [t for t in ray.get(_arrow_refs(cand)) if t.num_rows > 0]
    if not blocks:
        return pd.DataFrame({"qid": pd.Series([], dtype=np.int64),
                             id_col: pd.Series([], dtype=np.int64),
                             "cos": pd.Series([], dtype=np.float64)})
    tbl = pa.concat_tables(blocks)
    qid = tbl.column("qid").to_numpy()
    ids = tbl.column(id_col).to_numpy()
    cos = tbl.column("cos").to_numpy()
    keep = _topk_per_qid(qid, ids, -cos, k)
    order = np.lexsort((ids[keep], -cos[keep], qid[keep]))
    keep = keep[order]
    return pd.DataFrame({"qid": qid[keep], id_col: ids[keep], "cos": cos[keep]})


def cosine_topk(ds, query_vecs: np.ndarray, k: int,
                id_col: str = "vec_id", emb_col: str = "embedding"):
    """Exact brute-force cosine top-k for Q query vectors.

    Per batch: one (n x d) @ (d x Q) matmul + per-query argpartition;
    per-block partial top-k then a vectorized global merge (same
    reduce shape as ops.knn). Returns (qid, vec_id, cos) sorted by
    (qid, -cos, vec_id).
    """
    import ray

    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    qref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        n = len(batch)
        if n == 0:
            return pa.table({"qid": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             "cos": pa.array([], type=pa.float64())})
        m = _normalize(_emb_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy()
        # pre-sort rows by id so the shared stable top-k kernel breaks
        # exact-cosine ties (duplicate embeddings) by smallest id — the
        # documented (qid, -cos, vec_id) contract
        rid = np.argsort(ids, kind="stable")
        ids, m = ids[rid], m[rid]
        sims = m @ qm.T                      # (n, Q)
        kk = min(k, n)
        from .ops import _topk_rows_per_col

        part = _topk_rows_per_col(-sims, kk)
        return pa.table(
            {
                "qid": np.repeat(np.arange(qm.shape[0], dtype=np.int64), kk),
                id_col: ids[part].ravel(order="F"),
                "cos": np.take_along_axis(sims, part, axis=0).ravel(order="F"),
            }
        )

    cand = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return _cos_topk_finish(cand, k, id_col)


def _hyperplanes(d: int, n_planes: int = 12, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, d))


def lsh_bucket_ids(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    out = np.zeros(len(m), dtype=np.int64)
    for i in range(planes.shape[0]):
        out |= bits[:, i].astype(np.int64) << i
    return out


def cosine_topk_lsh(ds, query_vecs: np.ndarray, k: int,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    n_planes: int = 8, multiprobe: int = 1):
    """Approximate cosine top-k: hyperplane LSH bucket scan.

    Vectors are bucketed by sign bits of `n_planes` random projections;
    each query scans only its own bucket plus all buckets within
    `multiprobe` Hamming distance. Work per query drops ~2^n_planes-fold
    at the cost of recall (measured against cosine_topk in tests) —
    the IVF/LSH 'scale path' of SURVEY.md's similarity-search item.
    """
    import ray

    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    planes = _hyperplanes(q.shape[1], n_planes)
    qb = lsh_bucket_ids(q, planes)
    # query -> probed buckets (own + all buckets within hamming<=multiprobe)
    probe_sets = []
    for b in qb:
        probes = {int(b)}
        if multiprobe >= 1:
            for i in range(n_planes):
                probes.add(int(b) ^ (1 << i))
        if multiprobe >= 2:
            for i in range(n_planes):
                for j in range(i + 1, n_planes):
                    probes.add(int(b) ^ (1 << i) ^ (1 << j))
        probe_sets.append(probes)
    wanted: dict[int, list[int]] = {}
    for qi, probes in enumerate(probe_sets):
        for p in probes:
            wanted.setdefault(p, []).append(qi)
    qref = ray.put({"q": q, "wanted": wanted, "planes": planes})

    def partial(batch: pa.Table) -> pa.Table:
        st = ray.get(qref)
        n = len(batch)
        if n == 0:
            return pa.table({"qid": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             "cos": pa.array([], type=pa.float64())})
        m = _normalize(_emb_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy()
        # pre-sort by id + stable top-k so exact-cosine ties (duplicate
        # embeddings) break by smallest id — the same (qid, -cos,
        # vec_id) contract as the exact path (bare argpartition could
        # return either duplicate at the k boundary)
        rid = np.argsort(ids, kind="stable")
        ids, m = ids[rid], m[rid]
        buckets = lsh_bucket_ids(m, st["planes"])
        out_q, out_i, out_c = [], [], []
        from .ops import _topk_rows_per_col

        for b in np.unique(buckets):
            qis = st["wanted"].get(int(b))
            if not qis:
                continue
            rows = buckets == b
            sims = m[rows] @ st["q"][qis].T
            kk = min(k, int(rows.sum()))
            part = _topk_rows_per_col(-sims, kk)
            out_q.append(np.repeat(np.asarray(qis, dtype=np.int64), kk))
            out_i.append(ids[rows][part].ravel(order="F"))
            out_c.append(np.take_along_axis(sims, part, axis=0).ravel(order="F"))
        if not out_q:
            return pa.table({"qid": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             "cos": pa.array([], type=pa.float64())})
        return pa.table({"qid": np.concatenate(out_q),
                         id_col: np.concatenate(out_i),
                         "cos": np.concatenate(out_c)})

    cand = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return _cos_topk_finish(cand, k, id_col)


# ~rows a sign-LSH band bucket should hold: small enough that the
# per-bucket O(rows^2) self-merge stays trivial, large enough that
# near-dups still collide
TARGET_LSH_BUCKET_ROWS = 64


def auto_n_planes(ds, target_rows: int = TARGET_LSH_BUCKET_ROWS) -> int:
    """n_planes ≈ log2(N / target_bucket_rows): expected bucket
    population N / 2^n_planes stays ~target_rows, so the per-bucket
    self-merge is bounded no matter the input size. N comes from plan
    metadata (parquet footers) — no execution; unknown N falls back to
    12 planes (4096 buckets/band)."""
    from .scale import input_rows_estimate

    n = input_rows_estimate(ds)
    if not n:
        return 12
    return int(max(4, min(24, np.ceil(np.log2(max(n / target_rows, 2.0))))))


def embedding_neardup(ds, threshold: float = 0.95,
                      id_col: str = "vec_id", emb_col: str = "embedding",
                      n_planes: int | None = None, n_bands: int = 4,
                      seed: int = 11):
    """Embedding-cosine near-duplicate pairs — banded sign-LSH:

    Each vector gets ``n_bands`` independent ``n_planes``-bit sign
    signatures (ids only ride the shuffle, never the vectors);
    same-(band, signature) rows become candidate pairs via one
    vectorized self-merge per coarse partition; globally deduped on a
    pair-hash key; then verified with EXACT cosine in one join stage
    against the embeddings table. Sound (exact cosine on every
    reported pair); recall grows with n_bands and is tested against
    brute force. ``n_planes`` defaults to the log2(N/target) sizing
    rule (auto_n_planes) so bucket population — and the quadratic
    per-bucket merge — stays bounded as the input grows.
    """
    from . import textops as T
    from .scale import shuffle_buckets

    if n_planes is None:
        n_planes = auto_n_planes(ds)
    nb_shuffle = np.uint64(shuffle_buckets(ds))

    def bucketize(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy()
        n = len(batch)
        out_id = np.tile(ids, n_bands)
        out_band = np.repeat(np.arange(n_bands, dtype=np.int64), n)
        sigs = np.concatenate([
            lsh_bucket_ids(m, _hyperplanes(m.shape[1], n_planes, seed=seed + band))
            for band in range(n_bands)
        ])
        bkey = (
            sigs.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + out_band.astype(np.uint64)
        ).astype(np.int64)
        return pa.table({id_col: out_id, "band": out_band, "sig": sigs,
                         "__bkey": bkey})

    sig_ds = ds.map_batches(bucketize, batch_format="pyarrow", batch_size=None)

    def coarse_pairs(g: pa.Table) -> pa.Table:
        g = g.select([id_col, "band", "sig"]).to_pandas()
        m = g.merge(g, on=["band", "sig"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        out = m[[f"{id_col}_a", f"{id_col}_b"]].drop_duplicates()
        a = out[f"{id_col}_a"].to_numpy(dtype=np.int64)
        b = out[f"{id_col}_b"].to_numpy(dtype=np.int64)
        return pa.table({"a": a, "b": b, "__pb": T._pair_bucket(a, b)})

    from .ops import coarse_group_by_cell

    pairs = coarse_group_by_cell(sig_ds, coarse_pairs, key_col="__bkey",
                                 n_buckets=int(nb_shuffle))

    # cross-band duplicate candidates dedup inside the verify join's own
    # shuffle (attach_pair_lookup dedups halves in-bucket) — same
    # barrier-elimination as neardup_minhash
    emb = ds.select_columns([id_col, emb_col])
    with_b = T.attach_pair_lookup(pairs, emb, id_col, emb_col, "__va", "__vb")

    def fin(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "cos": pa.array([], type=pa.float64())})
        va = _normalize(_emb_matrix(b, "__va"))
        vb = _normalize(_emb_matrix(b, "__vb"))
        cos = np.einsum("ij,ij->i", va, vb)
        keep = cos >= threshold
        return pa.table({"a": b.column("a").to_numpy()[keep],
                         "b": b.column("b").to_numpy()[keep],
                         "cos": cos[keep]})

    return with_b.map_batches(fin, batch_format="pyarrow", batch_size=None)


def embedding_neardup_oracle_sql(threshold: float = 0.45, n_planes: int = 4,
                                 n_bands: int = 16, seed: int = 11,
                                 d: int = 64, table: str = "embeddings",
                                 id_col: str = "vec_id",
                                 emb_col: str = "embedding") -> str:
    """Exact DuckDB SQL for ``embedding_neardup`` — the sign-LSH
    candidate generation AND the cosine verification are both
    recomputed in SQL, so the oracle reproduces the approximate
    operator bit-for-bit (same pattern as
    ``textops.neardup_minhash_oracle_sql``).

    The per-band hyperplanes are deterministic (``_hyperplanes`` with
    seed+band) and small (n_bands x n_planes x d doubles), so they are
    embedded as DOUBLE[] literals at full precision; the sign bit
    ``dot > 0`` is scale-invariant, so SQL can test the UNnormalized
    embedding against each plane while the Ray kernel tests the
    normalized one. ``d`` must match the table's embedding width (the
    synthetic fixtures are d=64 at every scale factor).
    """
    band_selects = []
    for band in range(n_bands):
        planes = _hyperplanes(d, n_planes, seed=seed + band)
        bits = []
        for j in range(n_planes):
            lit = "[" + ",".join("%.17g" % x for x in planes[j]) + "]::DOUBLE[]"
            bits.append(
                f"(CASE WHEN list_inner_product(e, {lit}) > 0"
                f" THEN {1 << j} ELSE 0 END)"
            )
        band_selects.append(
            f"SELECT {id_col} AS vid, {band} AS band, ("
            + " + ".join(bits) + ") AS sig FROM v"
        )
    sigs = " UNION ALL ".join(band_selects)
    return f"""
WITH v AS (SELECT {id_col}, CAST({emb_col} AS DOUBLE[]) AS e FROM {table}),
sigs AS ({sigs}),
cand AS (SELECT DISTINCT s1.vid AS a, s2.vid AS b
  FROM sigs s1 JOIN sigs s2
  ON s1.band = s2.band AND s1.sig = s2.sig AND s1.vid < s2.vid)
SELECT c.a, c.b FROM cand c
JOIN v va ON va.{id_col} = c.a
JOIN v vb ON vb.{id_col} = c.b
WHERE list_cosine_similarity(va.e, vb.e) >= {threshold!r}
"""


def cosine_topk_lsh_oracle_sql(k: int = 10, n_planes: int = 6,
                               multiprobe: int = 2, seed: int = 11,
                               d: int = 64, query_id: int = 0,
                               table: str = "embeddings",
                               id_col: str = "vec_id",
                               emb_col: str = "embedding") -> str:
    """Exact DuckDB SQL for ``cosine_topk_lsh`` with a same-table query
    vector: the hyperplanes are deterministic, so the probed-bucket set
    (own bucket + every bucket within hamming<=multiprobe) is
    recomputed in SQL as a per-bit hamming sum, candidates are filtered
    to probed buckets, and the exact-cosine order with the engine's
    (cos DESC, id ASC) tie contract yields the same top-k row set.
    Same literal-embedding pattern as ``embedding_neardup_oracle_sql``.
    """
    planes = _hyperplanes(d, n_planes, seed=seed)

    def bits(col: str) -> str:
        terms = []
        for j in range(n_planes):
            lit = "[" + ",".join("%.17g" % x for x in planes[j]) + "]::DOUBLE[]"
            terms.append(f"(CASE WHEN list_inner_product({col}, {lit}) > 0"
                         f" THEN {1 << j} ELSE 0 END)")
        return "(" + " + ".join(terms) + ")"

    ham = " + ".join(f"(((bk >> {j}) & 1) != ((qbk >> {j}) & 1))::INT"
                     for j in range(n_planes))
    return f"""
WITH v AS (SELECT {id_col}, CAST({emb_col} AS DOUBLE[]) AS e FROM {table}),
q AS (SELECT e AS qe, {bits('e')} AS qbk FROM v WHERE {id_col} = {query_id}),
b AS (SELECT {id_col}, e, {bits('e')} AS bk FROM v)
SELECT b.{id_col} FROM b, q
WHERE {ham} <= {multiprobe}
ORDER BY list_cosine_similarity(b.e, q.qe) DESC, b.{id_col}
LIMIT {k}"""


# ---------------------------------------------------------------------------
# IVF: k-means coarse quantizer (train / assign / probe)
# ---------------------------------------------------------------------------

def ivf_build(ds, n_centroids: int = 64, iters: int = 4,
              emb_col: str = "embedding", seed: int = 13,
              tree: bool | None = None) -> np.ndarray:
    """Train an IVF coarse quantizer with distributed k-means (cosine
    metric: spherical k-means — vectors and centroids normalized,
    assignment by max dot product).

    Each iteration is ONE map_batches pass: every block emits its
    per-centroid partial (sum, count) — an (n_centroids x d) matrix,
    tiny regardless of data size. On large inputs the partials fold in
    a two-wave tree (repartition + associative per-block combine, the
    _cos_topk_finish shape) so the driver reads ONE kc-row table per
    iteration regardless of block count; below REDUCE_MIN_INPUT_BYTES
    the block count is itself bounded (sized reads) and the barrier
    waves cost more than the bounded driver fold they replace, so the
    partials fold on the driver. No vector ever leaves its block; the
    only driver state is the centroid matrix itself.

    Init is two-level farthest-point (k-means||-style): every block
    emits its own n_centroids maxmin representatives (one extra pass,
    n_centroids x d per block), maxmin over the union picks the seeds —
    robust to inputs ORDERED BY CLUSTER, where a limit() sample would
    seed a handful of clusters and strand centroids between them. On
    the tree path a combine wave runs maxmin within each rep partition
    first, so the driver-side union is reduce_blocks x kc rows, not
    blocks x kc. NOTE the two reductions have different equivalence
    strength: the per-ITERATION (cnt, vsum) combine is associative
    summation, so tree and driver folds agree up to fp order; the SEED
    wave's maxmin-of-maxmin is a coarser farthest-point net than flat
    maxmin over the full rep union and may pick different (equally
    spread) seeds — the contract is centroid QUALITY, not seed
    identity (pytest pins quality on both paths plus per-path
    determinism). Deterministic for a fixed block layout; empty
    clusters re-seed from a fixed rotation of the live set.
    """
    import ray

    from .scale import input_bytes_estimate

    if tree is None:
        est = input_bytes_estimate(ds)
        # unknown size == assume big (same contract as _cos_topk_finish)
        tree = est is None or est >= REDUCE_MIN_INPUT_BYTES
    reduce_blocks = 8

    def _maxmin(m: np.ndarray, count: int) -> np.ndarray:
        picked = [0]
        mind = 1.0 - m @ m[0]
        for _ in range(1, min(count, len(m))):
            nxt = int(np.argmax(mind))
            picked.append(nxt)
            mind = np.minimum(mind, 1.0 - m @ m[nxt])
        return m[picked]

    def block_reps(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"rep": pa.array([], type=pa.list_(pa.float64()))})
        m = _normalize(_emb_matrix(batch, emb_col))
        reps = _maxmin(m, n_centroids)
        off = np.arange(0, reps.size + 1, reps.shape[1], dtype=np.int32)
        return pa.table({"rep": pa.ListArray.from_arrays(
            pa.array(off), pa.array(reps.ravel()))})

    def rep_combine(batch: pa.Table) -> pa.Table:
        # associative: maxmin over the union of this partition's reps
        # is itself a valid rep set for the partition
        if len(batch) == 0:
            return pa.table({"rep": pa.array([], type=pa.list_(pa.float64()))})
        return block_reps_table(_emb_matrix(batch, "rep"))

    def block_reps_table(m: np.ndarray) -> pa.Table:
        reps = _maxmin(m, n_centroids)
        off = np.arange(0, reps.size + 1, reps.shape[1], dtype=np.int32)
        return pa.table({"rep": pa.ListArray.from_arrays(
            pa.array(off), pa.array(reps.ravel()))})

    reps_ds = ds.map_batches(block_reps, batch_format="pyarrow",
                             batch_size=None)
    if tree:
        reps_ds = reps_ds.repartition(reduce_blocks).map_batches(
            rep_combine, batch_format="pyarrow", batch_size=None)
    rep_blocks = [t for t in ray.get(_arrow_refs(reps_ds))
                  if t.num_rows > 0]
    s = np.concatenate([_emb_matrix(t, "rep") for t in rep_blocks])
    c = _maxmin(s, n_centroids)
    d = c.shape[1]

    for _ in range(iters):
        cref = ray.put(c)
        kc = len(c)

        def partial(batch: pa.Table, cref=cref, kc=kc) -> pa.Table:
            cm = ray.get(cref)
            if len(batch) == 0:
                return pa.table({
                    "cid": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                    "vsum": pa.array([], type=pa.list_(pa.float64(), d)),
                })
            m = _normalize(_emb_matrix(batch, emb_col))
            assign = np.argmax(m @ cm.T, axis=1)
            sums = np.zeros((kc, d))
            np.add.at(sums, assign, m)
            cnt = np.bincount(assign, minlength=kc).astype(np.int64)
            return pa.table({
                "cid": np.arange(kc, dtype=np.int64),
                "cnt": cnt,
                "vsum": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel()), d),
            })

        def ivf_combine(batch: pa.Table, kc=kc) -> pa.Table:
            # associative fold of concatenated (cid, cnt, vsum) partials
            # into one kc-row partial — runs in the tree waves so the
            # driver never loops over per-block tables on large inputs
            if len(batch) == 0:
                return pa.table({
                    "cid": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                    "vsum": pa.array([], type=pa.list_(pa.float64(), d)),
                })
            cid = batch.column("cid").to_numpy()
            sm = np.zeros((kc, d))
            np.add.at(sm, cid, _emb_matrix(batch, "vsum"))
            ct = np.zeros(kc, dtype=np.int64)
            np.add.at(ct, cid, batch.column("cnt").to_numpy())
            return pa.table({
                "cid": np.arange(kc, dtype=np.int64),
                "cnt": ct,
                "vsum": pa.FixedSizeListArray.from_arrays(
                    pa.array(sm.ravel()), d),
            })

        agg = ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
        if tree:
            agg = (agg.repartition(reduce_blocks)
                   .map_batches(ivf_combine, batch_format="pyarrow",
                                batch_size=None)
                   .repartition(1)
                   .map_batches(ivf_combine, batch_format="pyarrow",
                                batch_size=None))
        parts = ray.get(_arrow_refs(agg))
        sums = np.zeros((kc, d))
        cnt = np.zeros(kc, dtype=np.int64)
        for t in parts:  # tree path: exactly one kc-row table
            if t.num_rows == 0:
                continue
            cid = t.column("cid").to_numpy()
            cnt[cid] += t.column("cnt").to_numpy()
            sums[cid] += _emb_matrix(t, "vsum")
        live = cnt > 0
        c_new = np.where(live[:, None], sums / np.maximum(cnt, 1)[:, None], c)
        # empty clusters: re-seed from a fixed rotation of live centroids
        # with a deterministic nudge so they separate next iteration
        dead = np.nonzero(~live)[0]
        if len(dead) and live.any():
            src = np.nonzero(live)[0][np.arange(len(dead)) % int(live.sum())]
            rng = np.random.default_rng(seed)
            c_new[dead] = c_new[src] + rng.standard_normal((len(dead), d)) * 1e-3
        c = _normalize(c_new)
    return c


def ivf_assign(ds, centroids: np.ndarray, emb_col: str = "embedding"):
    """Add the coarse-quantizer cell id (`cid`) to every row — the IVF
    'index build': at scale, follow with write_parquet partitioned by
    cid so probes read only their lists."""
    import ray

    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def f(batch: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        if len(batch) == 0:
            return batch.append_column("cid", pa.array([], type=pa.int64()))
        m = _normalize(_emb_matrix(batch, emb_col))
        return batch.append_column(
            "cid", pa.array(np.argmax(m @ cm.T, axis=1).astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def cosine_topk_ivf(ds, query_vecs: np.ndarray, k: int,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    n_centroids: int = 64, nprobe: int = 8, iters: int = 4):
    """Approximate cosine top-k via an IVF coarse quantizer: train
    spherical k-means (ivf_build), then each query scans only its
    `nprobe` nearest centroid lists — work per query drops
    ~n_centroids/nprobe-fold; recall measured against cosine_topk in
    tests. Same (qid, -cos, vec_id) output contract as the other paths.

    At scale the build/assign halves run once (persisted partitioned by
    cid) and only the probe stage runs per query batch."""
    import ray

    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    cm = ivf_build(ds, n_centroids, iters, emb_col)
    probes = np.argsort(-(q @ cm.T), axis=1, kind="stable")[:, :nprobe]
    # centroid -> flat [qids] (sorted per centroid for determinism)
    order = np.argsort(probes.ravel(), kind="stable")
    flat_cid = probes.ravel()[order]
    flat_qid = np.repeat(np.arange(len(q), dtype=np.int64), nprobe)[order]
    qref = ray.put({"q": q, "cm": cm, "cids": flat_cid, "qids": flat_qid})

    def partial(batch: pa.Table) -> pa.Table:
        st = ray.get(qref)
        empty = pa.table({"qid": pa.array([], type=pa.int64()),
                          id_col: pa.array([], type=pa.int64()),
                          "cos": pa.array([], type=pa.float64())})
        n = len(batch)
        if n == 0:
            return empty
        m = _normalize(_emb_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy()
        rid = np.argsort(ids, kind="stable")   # (cos, id) tie contract
        ids, m = ids[rid], m[rid]
        assign = np.argmax(m @ st["cm"].T, axis=1)
        out_q, out_i, out_c = [], [], []
        from .ops import _topk_rows_per_col

        for cid in np.unique(assign):
            s0 = np.searchsorted(st["cids"], cid, side="left")
            s1 = np.searchsorted(st["cids"], cid, side="right")
            if s1 == s0:
                continue
            qis = st["qids"][s0:s1]
            rows = assign == cid
            sims = m[rows] @ st["q"][qis].T
            kk = min(k, int(rows.sum()))
            part = _topk_rows_per_col(-sims, kk)
            out_q.append(np.repeat(qis, kk))
            out_i.append(ids[rows][part].ravel(order="F"))
            out_c.append(np.take_along_axis(sims, part, axis=0).ravel(order="F"))
        if not out_q:
            return empty
        return pa.table({"qid": np.concatenate(out_q),
                         id_col: np.concatenate(out_i),
                         "cos": np.concatenate(out_c)})

    cand = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return _cos_topk_finish(cand, k, id_col)


# --------------------------------------------------------------------------
# Persisted ANN index (build-once / query-many, the spatial-index shape)
# --------------------------------------------------------------------------

ANN_MANIFEST = "_ann_manifest.json"


def build_ann_index(ds, path: str, n_centroids: int = 64, iters: int = 4,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    resume: bool = True) -> dict:
    """Persist an IVF index: train the coarse quantizer (ivf_build),
    shuffle rows once on their centroid id, write one parquet list per
    centroid + a manifest holding the centroid matrix and per-list
    lineage (rows/bytes/file) — the embedding twin of
    pipeline.build_partitioned_index. Queries then read ONLY their
    probed lists (ann_query_index). Resume skips finished lists, same
    checkpoint contract as the spatial build."""
    import json
    import os
    import time as _time

    import pyarrow.parquet as pq

    from .ops import coarse_group_by_cell

    t0 = _time.perf_counter()
    os.makedirs(path, exist_ok=True)
    man_path = os.path.join(path, ANN_MANIFEST)
    done: dict[str, dict] = {}
    cm = None
    if resume and os.path.exists(man_path):
        with open(man_path) as f:
            old = json.load(f)
        done = old["lists"]
        # the quantizer must be REUSED on resume: list membership is
        # only meaningful under the centroids that produced it
        cm = np.asarray(old["centroids"], dtype=np.float64)
    if cm is None:
        cm = ivf_build(ds, n_centroids, iters, emb_col)
    assigned = ivf_assign(ds.select_columns([id_col, emb_col]), cm, emb_col)
    done_ids = {int(c) for c in done}

    def write_list(group: pa.Table) -> pa.Table:
        out_c, out_r, out_b, out_s = [], [], [], []
        if group.num_rows and "cid" in group.column_names:
            cids = group.column("cid").to_numpy()
            order = np.argsort(cids, kind="stable")
            cs = cids[order]
            bnd = np.concatenate(
                [[0], np.nonzero(cs[1:] != cs[:-1])[0] + 1, [len(cs)]])
            for gi in range(len(bnd) - 1):
                rows = order[bnd[gi]: bnd[gi + 1]]
                cid = int(cs[bnd[gi]])
                if cid in done_ids:
                    p = done[str(cid)]
                    out_c.append(cid); out_r.append(p["rows"])
                    out_b.append(p["bytes"]); out_s.append(1)
                    continue
                part = group.take(pa.array(rows))
                if "__cg" in part.column_names:
                    part = part.drop_columns(["__cg"])
                fname = os.path.join(path, f"list-{cid}.parquet")
                tmp = fname + ".tmp"
                pq.write_table(part, tmp)
                os.replace(tmp, fname)
                out_c.append(cid); out_r.append(len(part))
                out_b.append(os.path.getsize(fname)); out_s.append(0)
        return pa.table({"cid": pa.array(out_c, type=pa.int64()),
                         "rows": pa.array(out_r, type=pa.int64()),
                         "bytes": pa.array(out_b, type=pa.int64()),
                         "skipped": pa.array(out_s, type=pa.int64())})

    stats = coarse_group_by_cell(assigned, write_list,
                                 key_col="cid").to_pandas()
    man = {
        "centroids": cm.tolist(),
        "id_col": id_col, "emb_col": emb_col,
        "n_centroids": int(n_centroids),
        "total_rows": int(stats["rows"].sum()),
        "built_lists": int((stats["skipped"] == 0).sum()),
        "resumed_lists": int((stats["skipped"] == 1).sum()),
        "wall_sec": round(_time.perf_counter() - t0, 3),
        "lists": {str(int(r.cid)): {"file": f"list-{int(r.cid)}.parquet",
                                    "rows": int(r.rows),
                                    "bytes": int(r.bytes)}
                  for r in stats.itertuples()},
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, man_path)
    return man


def ann_query_index(path: str, query_vecs: np.ndarray, k: int,
                    nprobe: int = 8):
    """Approximate cosine top-k against a BUILT ANN index: rank
    centroids per query from the manifest (driver-side, tiny), read
    ONLY the probed lists, answer routed queries per block, finish with
    the shared distributed top-k reduce. nprobe = n_centroids degrades
    to EXACT brute force (pytest pins that identity)."""
    import json
    import os

    import ray
    import ray.data as rd

    with open(os.path.join(path, ANN_MANIFEST)) as f:
        man = json.load(f)
    cm = np.asarray(man["centroids"], dtype=np.float64)
    id_col, emb_col = man["id_col"], man["emb_col"]
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    nprobe = min(nprobe, len(cm))
    probes = np.argsort(-(q @ cm.T), axis=1, kind="stable")[:, :nprobe]
    order = np.argsort(probes.ravel(), kind="stable")
    flat_cid = probes.ravel()[order]
    flat_qid = np.repeat(np.arange(len(q), dtype=np.int64), nprobe)[order]
    touched = [int(c) for c in np.unique(flat_cid)
               if str(int(c)) in man["lists"]]
    if not touched:
        import pandas as pd

        return pd.DataFrame({"qid": pd.Series([], dtype=np.int64),
                             id_col: pd.Series([], dtype=np.int64),
                             "cos": pd.Series([], dtype=np.float64)})
    qref = ray.put({"q": q, "cids": flat_cid, "qids": flat_qid})
    files = [os.path.join(path, man["lists"][str(c)]["file"])
             for c in touched]

    def probe(batch: pa.Table) -> pa.Table:
        st = ray.get(qref)
        empty = pa.table({"qid": pa.array([], type=pa.int64()),
                          id_col: pa.array([], type=pa.int64()),
                          "cos": pa.array([], type=pa.float64())})
        if len(batch) == 0:
            return empty
        m = _normalize(_emb_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy()
        rid = np.argsort(ids, kind="stable")  # (cos, id) tie contract
        ids, m = ids[rid], m[rid]
        cid_rows = batch.column("cid").to_numpy()[rid]
        out_q, out_i, out_c = [], [], []
        from .ops import _topk_rows_per_col

        for cid in np.unique(cid_rows):
            s0 = np.searchsorted(st["cids"], cid, side="left")
            s1 = np.searchsorted(st["cids"], cid, side="right")
            if s1 == s0:
                continue
            qis = st["qids"][s0:s1]
            rows = cid_rows == cid
            sims = m[rows] @ st["q"][qis].T
            kk = min(k, int(rows.sum()))
            part = _topk_rows_per_col(-sims, kk)
            out_q.append(np.repeat(qis, kk))
            out_i.append(ids[rows][part].ravel(order="F"))
            out_c.append(
                np.take_along_axis(sims, part, axis=0).ravel(order="F"))
        if not out_q:
            return empty
        return pa.table({"qid": np.concatenate(out_q),
                         id_col: np.concatenate(out_i),
                         "cos": np.concatenate(out_c)})

    ds = rd.read_parquet(files, override_num_blocks=min(64, len(files)))
    cand = ds.map_batches(probe, batch_format="pyarrow", batch_size=None)
    return _cos_topk_finish(cand, k, id_col)
