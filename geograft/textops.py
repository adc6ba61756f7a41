"""Training-data text operators over the `documents` table.

Large-scale pipeline components the 100 TB engine needs beyond the
spatial surface: exact + near deduplication, text quality metrics,
language ID, fingerprinting. Every stage is a vectorized
``map_batches`` kernel; shuffles are pre-aggregated; string hashing is
stable 64-bit xxhash via polars (process-independent, unlike Python's
salted ``hash``).

Near-dup design (MinHash + LSH, the standard banding scheme):
shingle(3-gram) -> 64 minhash permutations -> 16 bands x 4 rows ->
``groupby(band_key)`` buckets -> candidate pairs -> EXACT Jaccard
verification, so reported pairs are sound (no false positives); LSH
recall is probabilistic and tested against brute force on fixtures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = np.uint64((1 << 61) - 1)
N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS


def _stable_hash(texts: pa.Array | pa.ChunkedArray, seed: int = 42) -> np.ndarray:
    """Stable vectorized 64-bit hash of a string column (polars xxhash)."""
    import polars as pl

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    s = pl.from_arrow(texts)
    return s.hash(seed=seed).to_numpy()


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

# Coarse hash-partition count: the groupby key space is folded into this
# many partitions so a shuffle produces O(N_COARSE) vectorized work units
# (pandas C kernels per partition) instead of one Python call per
# distinct key. Scale with cluster size, not key cardinality.
N_COARSE = 32


def dedup_exact(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact duplicate removal: canonical (min id) per distinct text.

    Shape: hash-partition on a stable content hash folded into N_COARSE
    buckets (equal texts always co-locate), then one vectorized pandas
    groupby(text).min per partition — EXACT text equality, so hash
    collisions cannot corrupt the result.
    """
    def add_hash(b: pa.Table) -> pa.Table:
        h = _stable_hash(b.column(text_col)) % np.uint64(N_COARSE)
        return b.select([id_col, text_col]).append_column(
            "__bucket", pa.array(h.astype(np.int64))
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(text_col, sort=False)[id_col].min().reset_index(drop=False)
        return out[[id_col]]

    return hashed.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


# --------------------------------------------------------------------------
# token counting / quality metrics (SQL-oracle-able, exact)
# --------------------------------------------------------------------------

def _count_re(txt, pattern: str) -> np.ndarray:
    """Columnar non-overlapping regex match count per string (int64,
    null -> 0). Replaces pandas .str.count, which routes every row
    through a Python object."""
    return (
        pc.fill_null(pc.count_substring_regex(txt, pattern), 0)
        .cast(pa.int64())
        .to_numpy()
    )


def token_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Whitespace token count + exact char metrics per doc — all
    pyarrow.compute kernels, no per-row Python."""

    def f(b: pa.Table) -> pa.Table:
        txt = b.column(text_col)
        n_tokens = _count_re(txt, r"[^\s]+")
        n_chars_q = pc.fill_null(pc.utf8_length(txt), 0).cast(pa.int64()).to_numpy()
        n_digits = _count_re(txt, "[0-9]")
        n_alpha = _count_re(txt, "[a-z]")
        alpha_ratio = np.where(n_chars_q > 0, n_alpha / np.maximum(n_chars_q, 1), 0.0)
        return pa.table(
            {
                id_col: b.column(id_col),
                "n_tokens": n_tokens,
                "n_chars_q": n_chars_q,
                "n_digits": n_digits,
                "alpha_ratio": alpha_ratio,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


# BPE-ish pre-tokenizer classes (GPT-2-style word/number/punct split,
# simplified to a dialect-portable character-class regex so the DuckDB
# oracle matches exactly)
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_token_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """BPE-ish token counts per doc: words, numbers, punctuation runs —
    the pre-tokenization granularity a byte-pair encoder consumes."""

    def f(b: pa.Table) -> pa.Table:
        txt = b.column(text_col)
        return pa.table(
            {
                id_col: b.column(id_col),
                "n_bpe": _count_re(txt, BPE_PATTERN),
                "n_word": _count_re(txt, "[a-zA-Z]+"),
                "n_num": _count_re(txt, "[0-9]+"),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "on", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "pour", "dans"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "por", "con"},
}


class LangId:
    """Actor-pool stage: n-gram/stopword-heuristic language ID.

    Stateful setup (stopword tables, compiled pattern) happens once per
    actor in __init__; __call__ is per batch. This is the canonical
    'model loaded once per worker' pattern — swap the heuristic for a
    fasttext model on a real cluster without touching the pipeline.
    """

    def __init__(self):
        # stable 64-bit hashes of each language's stopword table: the
        # per-token membership test becomes one vectorized np.isin over
        # hashed tokens per language (a fasttext model would load here)
        self.langs = np.asarray(list(_STOPWORDS))
        self.tables = [
            np.sort(_stable_hash(pa.array(sorted(ws))))
            for ws in _STOPWORDS.values()
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        low = pc.utf8_lower(txt)
        # tokens = maximal [a-zA-Z'] runs: split on the complement, drop
        # edge empties; per-doc counts from the equivalent regex count
        lens = _count_re(low, "[a-zA-Z']+")
        toks = pc.list_flatten(pc.split_pattern_regex(low, "[^a-zA-Z']+"))
        if len(toks):
            toks = toks.filter(pc.greater(pc.utf8_length(toks), 0))
        n = len(batch)
        hits = np.zeros((n, len(self.langs)), dtype=np.int64)
        if len(toks):
            th = _stable_hash(toks)
            doc_idx = np.repeat(np.arange(n), lens)
            for li, table in enumerate(self.tables):
                m = np.isin(th, table)
                hits[:, li] = np.bincount(doc_idx[m], minlength=n)
        best = hits.argmax(axis=1)
        langs = np.where(hits.max(axis=1) > 0, self.langs[best], "unknown")
        return pa.table({"doc_id": batch.column("doc_id"), "lang_pred": pa.array(langs)})


def lang_id(ds, concurrency: int = 2):
    return ds.map_batches(LangId, batch_format="pyarrow", batch_size=4096,
                          concurrency=concurrency)


def _flat_tokens(txt) -> tuple[np.ndarray, "pa.Array"]:
    """(per-doc token count, flattened tokens) with Python str.split()
    semantics (whitespace runs, no empties) — columnar: Arrow split +
    flatten + empty filter, never a Python loop over tokens."""
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    lens = _count_re(txt, r"[^\s]+")
    flat = pc.list_flatten(pc.utf8_split_whitespace(txt))
    if len(flat):
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
    return lens, flat


def fingerprint(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Order-sensitive document fingerprint: polynomial rolling hash of
    the token-hash sequence (Rabin-Karp over tokens, mod 2^61-1).
    Deterministic across processes; swapping two tokens changes it."""

    def f(b: pa.Table) -> pa.Table:
        lens, flat = _flat_tokens(b.column(text_col))
        fp = np.zeros(len(lens), dtype=np.uint64)
        if len(flat):
            th = _stable_hash(flat) % _MERSENNE
            base = np.uint64(1000003)
            # sequential fold per doc: fp = fp*base + h (vectorized over
            # docs at each token position)
            starts = np.cumsum(lens) - lens
            maxlen = int(lens.max())
            for j in range(maxlen):
                active = lens > j
                idx = starts[active] + j
                fp[active] = (fp[active] * base + th[idx]) % _MERSENNE
        return pa.table({id_col: b.column(id_col), "fp": fp.astype(np.int64)})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# shingles / minhash / simhash
# --------------------------------------------------------------------------

def _shingle_hashes(texts: list[str], k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, shingle_hash) for DISTINCT k-gram shingles per doc.
    Docs shorter than k tokens contribute their full token sequence."""
    doc_idx, shingles = [], []
    for i, t in enumerate(texts):
        toks = t.split() if t else []
        if len(toks) < k:
            sh = {" ".join(toks)} if toks else set()
        else:
            sh = {" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)}
        doc_idx.extend([i] * len(sh))
        shingles.extend(sh)
    if not shingles:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    return (
        np.asarray(doc_idx, dtype=np.int64),
        _stable_hash(pa.array(shingles)),
    )


def _perm_params(n_perm: int = N_PERM, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), n_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), n_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3) -> pa.Table:
    """(doc_id, band, band_hash) rows: 64 minhash perms folded into 16
    band keys. One output row per (doc, band) — the LSH bucket keys."""
    texts = batch.column(text_col).to_pylist()
    ids = batch.column(id_col)
    doc_idx, sh = _shingle_hashes(texts, k)
    n = len(texts)
    a, b = _perm_params()
    sig = np.full((n, N_PERM), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh):
        shm = sh % _MERSENNE
        for p in range(N_PERM):
            hv = (a[p] * shm + b[p]) % _MERSENNE
            col = np.full(n, np.iinfo(np.uint64).max, dtype=np.uint64)
            np.minimum.at(col, doc_idx, hv)
            sig[:, p] = col
    # fold each band's rows into one stable 64-bit key
    bands = sig.reshape(n, N_BANDS, ROWS_PER_BAND)
    key = bands[:, :, 0].copy()
    for r in range(1, ROWS_PER_BAND):
        key = key * np.uint64(1099511628211) + bands[:, :, r]  # FNV-ish fold
    out_ids = ids.take(pa.array(np.repeat(np.arange(n), N_BANDS)))
    return pa.table(
        {
            id_col: out_ids,
            "band": np.tile(np.arange(N_BANDS, dtype=np.int64), n),
            "band_hash": key.reshape(-1).astype(np.int64),
        }
    )


def _jaccard_exact(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        toks = t.split() if t else []
        if len(toks) < k:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)}

    sa, sb = sh(a), sh(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def neardup_minhash(ds, tau: float = 0.8, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3):
    """MinHash-LSH near-duplicate pairs with exact verification.

    shingle -> minhash -> band keys (map_batches) -> groupby(band,
    band_hash) buckets -> candidate pairs -> exact Jaccard >= tau.
    Reported pairs are SOUND (verified exactly); recall follows the
    LSH banding curve. Texts needed for verification are carried
    through the bucket shuffle; at 100 TB you would verify in a second
    broadcast/join stage instead.
    """
    def sigs(b: pa.Table) -> pa.Table:
        s = minhash_signatures(b, text_col, id_col, k)
        # carry text for in-bucket verification; coarse partition key
        n = len(b)
        texts = b.column(text_col).take(
            pa.array(np.repeat(np.arange(n), N_BANDS))
        )
        s = s.append_column("text", texts)
        coarse = (
            s.column("band_hash").to_numpy().astype(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
            + s.column("band").to_numpy().astype(np.uint64)
        ) % np.uint64(N_COARSE)
        return s.append_column("__bucket", pa.array(coarse.astype(np.int64)))

    sig_ds = ds.map_batches(sigs, batch_format="pyarrow", batch_size=None)

    def coarse_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # within a coarse partition: enumerate TRUE LSH buckets
        # (band, band_hash) vectorized, then verify candidates exactly
        out_a, out_b, out_j = [], [], []
        seen: set[tuple[int, int]] = set()
        texts_by_id = dict(zip(g[id_col], g["text"]))
        for _, grp in g.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(grp[id_col].unique())
            if len(ids) < 2:
                continue
            ai, bi = np.triu_indices(len(ids), 1)
            for x, y in zip(ids[ai], ids[bi]):
                key = (int(x), int(y))
                if key in seen:
                    continue
                seen.add(key)
                jac = _jaccard_exact(texts_by_id[x], texts_by_id[y], k)
                if jac >= tau:
                    out_a.append(x); out_b.append(y); out_j.append(jac)
        return pd.DataFrame({"a": np.asarray(out_a, dtype=np.int64),
                             "b": np.asarray(out_b, dtype=np.int64),
                             "jaccard": np.asarray(out_j, dtype=np.float64)})

    pairs = sig_ds.groupby("__bucket").map_groups(coarse_pairs, batch_format="pandas")

    # the same pair can still surface from bands living in DIFFERENT
    # coarse partitions -> one more tiny exact dedup (pairs are few)
    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["a", "b"])

    return pairs.groupby("a").map_groups(dedup, batch_format="pandas")


def simhash(ds, text_col: str = "text", id_col: str = "doc_id"):
    """64-bit SimHash over token hashes: per bit, sum +/-1 across tokens,
    sign gives the bit. Near-identical docs differ in few bits."""

    def f(b: pa.Table) -> pa.Table:
        lens, flat = _flat_tokens(b.column(text_col))
        n = len(lens)
        acc = np.zeros((n, 64), dtype=np.int64)
        if len(flat):
            th = _stable_hash(flat)
            bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            contrib = 2 * bits - 1
            doc_idx = np.repeat(np.arange(n), lens)
            np.add.at(acc, doc_idx, contrib)
        out = (acc > 0).astype(np.uint64)
        sh = np.zeros(n, dtype=np.uint64)
        for bit in range(64):
            sh |= out[:, bit] << np.uint64(bit)
        return pa.table({id_col: b.column(id_col), "simhash": sh.astype(np.int64)})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# exact n-gram Jaccard pairs via token inverted index (SQL-oracle-able)
# --------------------------------------------------------------------------

def jaccard_pairs_exact(ds, tau: float, k: int = 3,
                        text_col: str = "text", id_col: str = "doc_id"):
    """ALL pairs with k-gram Jaccard >= tau — exact, via a distributed
    shingle inverted index: explode distinct shingles, groupby(shingle
    hash) emits per-bucket doc pairs, groupby(pair) sums intersections,
    sizes joined from a broadcast, final filter. The shuffle key is the
    8-byte shingle hash. Exact counterpart of the probabilistic
    neardup_minhash; its DuckDB oracle is the same algebra in SQL.
    """
    import ray

    def shingles(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        doc_idx, sh = _shingle_hashes(texts, k)
        ids = b.column(id_col).take(pa.array(doc_idx))
        return pa.table(
            {
                id_col: ids,
                "sh": sh.astype(np.int64),
                "__bucket": (sh % np.uint64(N_COARSE)).astype(np.int64),
            }
        )

    sh_ds = ds.map_batches(shingles, batch_format="pyarrow", batch_size=None)

    # doc shingle-set sizes: small aggregate, broadcast
    sizes_df = sh_ds.groupby(id_col).count().to_pandas()
    sizes_ref = ray.put(dict(zip(sizes_df[id_col], sizes_df["count()"])))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # self-merge on the exact shingle hash (vectorized), count
        # co-occurrences per doc pair within this coarse partition
        m = g[[id_col, "sh"]].merge(g[[id_col, "sh"]], on="sh", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        out = (
            m.groupby([f"{id_col}_a", f"{id_col}_b"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return out.rename(columns={f"{id_col}_a": "a", f"{id_col}_b": "b"})

    partial = sh_ds.groupby("__bucket").map_groups(bucket_pairs, batch_format="pandas")

    # sum intersections per pair: coarse-partition on a pair hash, then a
    # vectorized pandas groupby-sum per partition (Ray's multi-key
    # aggregate is per-key Python — avoid it)
    def add_pair_bucket(b: pa.Table) -> pa.Table:
        h = (
            b.column("a").to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ b.column("b").to_numpy().astype(np.uint64)
        ) % np.uint64(N_COARSE)
        return b.append_column("__pb", pa.array(h.astype(np.int64)))

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["a", "b"], sort=False)["c"].sum().reset_index()

    inter = (
        partial.map_batches(add_pair_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("__pb")
        .map_groups(sum_pairs, batch_format="pandas")
    )

    def finalize(b: pa.Table) -> pa.Table:
        sizes = ray.get(sizes_ref)
        a = b.column("a").to_numpy()
        bb = b.column("b").to_numpy()
        c = b.column("c").to_numpy()
        sa = np.fromiter((sizes[x] for x in a), dtype=np.int64, count=len(a))
        sb = np.fromiter((sizes[x] for x in bb), dtype=np.int64, count=len(bb))
        jac = c / (sa + sb - c)
        keep = jac >= tau
        return pa.table({"a": a[keep], "b": bb[keep], "jaccard": jac[keep]})

    return inter.map_batches(finalize, batch_format="pyarrow", batch_size=None)
