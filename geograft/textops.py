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
# SQL-recomputable token hash (FNV-1a over code points + splitmix64)
#
# `_stable_hash` (polars xxhash) is fast but no SQL engine can recompute
# it, which locks every op built on it into rows-only verification. The
# hash below is chosen so a DuckDB oracle can reproduce it EXACTLY with
# list_reduce/HUGEINT arithmetic: FNV-1a folded over Unicode code points
# (mod 2^64), then the splitmix64 finalizer for bit dispersion (FNV-1a
# alone has correlated high bits — simhash needs each bit ~uniform).
# Both sides are generated from the same constants (`token_hash_sql`),
# the scrub_pii precedent: engine and oracle cannot drift.
# --------------------------------------------------------------------------

_FNV_BASIS = 14695981039346656037
_FNV_PRIME = 1099511628211
_MIX1 = 0xBF58476D1CE4E5B9
_MIX2 = 0x94D049BB133111EB
_M64 = 1 << 64


def _codepoints(flat: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lens, starts, codepoints) for a flat string array, bulk-decoded:
    ASCII reads the Arrow data buffer zero-copy (bytes == code points);
    anything else takes ONE C-level utf8->utf32 decode of the whole
    buffer — never a Python loop over tokens."""
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(flat)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=np.uint64)
    if pa.types.is_large_string(flat.type):
        flat = flat.cast(pa.string())
    voff = np.frombuffer(flat.buffers()[1], dtype=np.int32)[
        flat.offset: flat.offset + n + 1].astype(np.int64)
    data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    seg = data[voff[0]: voff[-1]]
    if len(seg) == 0 or seg.max() < 0x80:
        lens = np.diff(voff)
        starts = voff[:-1] - voff[0]
        return lens, starts, seg.astype(np.uint64)
    cp = np.frombuffer(
        bytes(seg).decode("utf-8").encode("utf-32-le"), dtype="<u4"
    ).astype(np.uint64)
    lens = pc.utf8_length(flat).cast(pa.int64()).to_numpy()
    starts = np.cumsum(lens) - lens
    return lens, starts, cp


def _sql_hash(flat: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 token hash matching `token_hash_sql` bit for bit."""
    lens, starts, cp = _codepoints(flat)
    h = np.full(len(lens), np.uint64(_FNV_BASIS), dtype=np.uint64)
    if len(cp):
        prime = np.uint64(_FNV_PRIME)
        with np.errstate(over="ignore"):
            for j in range(int(lens.max())):
                active = np.nonzero(lens > j)[0]
                idx = starts[active] + j
                h[active] = (h[active] ^ cp[idx]) * prime
        h = _splitmix64_np(h)
    return h


# Unicode White_Space as an RE2 class: \p{Z} (Zs+Zl+Zp) + the ASCII
# controls + NEL — the exact set pyarrow's utf8_split_whitespace splits
# on, so SQL tokenization matches `_flat_tokens` on every input.
_WS_REGEX = r"[\p{Z}\x09-\x0d\x85]+"


def tokens_sql(text_expr: str) -> str:
    """SQL list expr: whitespace tokens of `text_expr`, empties dropped
    (mirrors _flat_tokens)."""
    return (f"list_filter(string_split_regex({text_expr}, '{_WS_REGEX}'), "
            f"t -> t <> '')")


def _mulmod64_sql(z_expr: str, c: int) -> str:
    """SQL for (z * c) mod 2^64 on a HUGEINT-valued expr. A direct
    product of two ~2^64 values overflows INT128, so multiply the 32-bit
    halves separately (every partial stays under 2^96)."""
    return (f"(((({z_expr}) % 4294967296) * {c}"
            f" + (((({z_expr}) // 4294967296) * {c}) % 4294967296)"
            f" * 4294967296) % {_M64}::HUGEINT)")


def token_hash_sql_ctes(tok_source: str, extra_cols: str = "") -> str:
    """CTE chain computing `h` (UBIGINT == _sql_hash) for every row of
    `tok_source`, a relation with a `tok` column; `extra_cols` (e.g.
    'doc_id, pos,') are carried through. GENERATED from the engine's own
    constants. Ends with a CTE named `th`."""
    # FNV fold: acc < 2^64 and the prime is 2^40, so the plain product
    # fits INT128; the splitmix mixers are ~2^64 and need _mulmod64_sql.
    return f"""h0 AS (
  SELECT {extra_cols} list_reduce(
    list_prepend({_FNV_BASIS}::HUGEINT,
      list_transform(string_split(tok, ''), c -> unicode(c)::HUGEINT)),
    (a, b) -> ((xor(a::UBIGINT, b::UBIGINT))::HUGEINT * {_FNV_PRIME})
              % {_M64}::HUGEINT) AS z
  FROM {tok_source}
), h1 AS (
  SELECT {extra_cols}
         {_mulmod64_sql("xor(z::UBIGINT, z::UBIGINT >> 30)::HUGEINT", _MIX1)}
         AS z FROM h0
), h2 AS (
  SELECT {extra_cols}
         {_mulmod64_sql("xor(z::UBIGINT, z::UBIGINT >> 27)::HUGEINT", _MIX2)}
         AS z FROM h1
), th AS (
  SELECT {extra_cols} xor(z::UBIGINT, z::UBIGINT >> 31) AS h FROM h2
)"""


def simhash_sig_ctes(table: str = "documents", text_col: str = "text",
                     id_col: str = "doc_id") -> str:
    """CTE chain ending in `sig(id, u)`: the unsigned 64-bit simhash of
    every row of `table` (docs with zero tokens get u = 0), matching
    `simhash` bit for bit."""
    bit_terms = " + ".join(
        f"CASE WHEN sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)"
        f" > 0 THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END"
        for b in range(64)
    )
    return f"""WITH toks AS (
  SELECT {id_col} AS id, unnest({tokens_sql(text_col)}) AS tok FROM {table}
), {token_hash_sql_ctes("toks", "id,")}, rawsig AS (
  SELECT id, {bit_terms} AS u FROM th GROUP BY id
), sig AS (
  SELECT d.{id_col} AS id, coalesce(r.u, 0::HUGEINT) AS u
  FROM {table} d LEFT JOIN rawsig r ON d.{id_col} = r.id
)"""


def simhash_oracle_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB SQL reproducing `simhash` exactly (int64 = two's-complement
    reinterpret of the unsigned signature, matching astype(int64))."""
    return f"""{simhash_sig_ctes(table, text_col, id_col)}
SELECT id AS {id_col},
       (CASE WHEN u >= {1 << 63}::HUGEINT THEN u::HUGEINT - {_M64}::HUGEINT
             ELSE u::HUGEINT END)::BIGINT AS simhash
FROM sig ORDER BY id"""


def neardup_simhash_oracle_sql(max_hamming: int, table: str = "documents",
                               text_col: str = "text",
                               id_col: str = "doc_id") -> str:
    """DuckDB SQL reproducing `neardup_simhash` exactly: brute-force all
    pairs, XOR-popcount filter (the engine's pigeonhole banding is a
    candidate-generation strategy, not a semantics change)."""
    return f"""{simhash_sig_ctes(table, text_col, id_col)}
SELECT s1.id AS a, s2.id AS b,
       bit_count(xor(s1.u::UBIGINT, s2.u::UBIGINT))::BIGINT AS hamming
FROM sig s1 JOIN sig s2 ON s1.id < s2.id
WHERE bit_count(xor(s1.u::UBIGINT, s2.u::UBIGINT)) <= {max_hamming}
ORDER BY a, b"""


def fingerprint_oracle_sql(table: str = "documents", text_col: str = "text",
                           id_col: str = "doc_id") -> str:
    """DuckDB SQL reproducing `fingerprint` exactly: ordered polynomial
    fold of the per-token hashes mod 2^61-1 (docs with no tokens -> 0)."""
    m = int(_MERSENNE)
    return f"""WITH toks AS (
  SELECT {id_col} AS id, unnest(l) AS tok,
         unnest(range(1, len(l) + 1)) AS pos
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS l FROM {table})
), {token_hash_sql_ctes("toks", "id, pos,")}, fp AS (
  SELECT id, list_reduce(
    list_prepend(0::HUGEINT,
                 list((h % {m})::HUGEINT ORDER BY pos)),
    (a, b) -> (a * 1000003 + b) % {m}) AS fp
  FROM th GROUP BY id
)
SELECT d.{id_col}, coalesce(f.fp, 0)::BIGINT AS fp
FROM {table} d LEFT JOIN fp f ON d.{id_col} = f.id
ORDER BY d.{id_col}"""


def neardup_minhash_oracle_sql(tau: float, k: int = 3,
                               table: str = "documents",
                               text_col: str = "text",
                               id_col: str = "doc_id") -> str:
    """DuckDB SQL reproducing `neardup_minhash` EXACTLY — candidates
    AND verification. GENERATED from the engine's own constants
    (`_perm_params`, N_PERM/N_BANDS/ROWS_PER_BAND, _SHINGLE_BASE,
    _MERSENNE), so engine and oracle cannot drift:

    token hash (token_hash_sql_ctes) -> uint64-wrap rolling k-gram
    shingle fold -> 64 minhash perms hv = ((a*sh') wrap64 + b) wrap64
    mod 2^61-1 over the distinct shingle set (shingle-less docs pin
    every perm at uint64 max, exactly like the engine's np.full init)
    -> 16 band keys (uint64-wrap FNV-ish fold over 4 rows) -> candidate
    pairs sharing any (band, key) -> exact distinct-shingle jaccard
    >= tau (empty-vs-empty = 1.0, the engine's union-0 contract)."""
    m64 = _M64
    mers = int(_MERSENNE)
    base = int(_SHINGLE_BASE)
    a, b = _perm_params()
    perm_rows = ", ".join(
        f"({p}, {int(a[p])}::HUGEINT, {int(b[p])}::HUGEINT)"
        for p in range(N_PERM))
    umax = (1 << 64) - 1
    # (sm * pa) mod 2^64 with pa a COLUMN (not a literal): 32-bit-half
    # split keeps every partial under 2^94 (INT128-safe)
    wrapmul = ("(((sm % 4294967296) * pa"
               " + (((sm // 4294967296) * pa) % 4294967296)"
               f" * 4294967296) % {m64}::HUGEINT)")
    return f"""WITH t AS (
  SELECT {id_col} AS did, {tokens_sql(text_col)} AS w FROM {table}
), toks AS (
  SELECT did, unnest(w) AS tok, unnest(range(1, len(w) + 1)) AS pos
  FROM t
), {token_hash_sql_ctes("toks", "did, pos,")}, hlist AS (
  SELECT did, list(h::HUGEINT ORDER BY pos) AS hl, count(*) AS n
  FROM th GROUP BY did
), widx AS (
  SELECT did, hl, n,
         unnest(range(1, greatest(n - {k - 1}, 1) + 1))::BIGINT AS i
  FROM hlist
), sh0 AS (
  SELECT did, list_reduce(
    CASE WHEN n >= {k} THEN list_slice(hl, i, i + {k - 1}) ELSE hl END,
    (x, y) -> (((x * {base}::HUGEINT) % {m64}::HUGEINT) + y)
              % {m64}::HUGEINT) AS sh
  FROM widx
), dsh AS (
  SELECT DISTINCT did, sh FROM sh0
), perms(p, pa, pb) AS (
  VALUES {perm_rows}
), mn AS (
  SELECT did, p,
         min((({wrapmul} + pb) % {m64}::HUGEINT) % {mers}::HUGEINT) AS mn
  FROM (SELECT did, sh % {mers}::HUGEINT AS sm FROM dsh) CROSS JOIN perms
  GROUP BY did, p
), allsig AS (
  SELECT doc.did, pr.p, coalesce(s.mn, {umax}::HUGEINT) AS mn
  FROM (SELECT {id_col} AS did FROM {table}) doc
  CROSS JOIN perms pr
  LEFT JOIN mn s ON s.did = doc.did AND s.p = pr.p
), band AS (
  SELECT did, p // {ROWS_PER_BAND} AS band,
         list_reduce(list(mn ORDER BY p),
           (x, y) -> (((x * {base}::HUGEINT) % {m64}::HUGEINT) + y)
                     % {m64}::HUGEINT) AS bh
  FROM allsig GROUP BY did, p // {ROWS_PER_BAND}
), cand AS (
  SELECT DISTINCT x.did AS a, y.did AS b
  FROM band x JOIN band y
    ON x.band = y.band AND x.bh = y.bh AND x.did < y.did
), sz AS (
  SELECT did, count(*) AS n FROM dsh GROUP BY did
), inter AS (
  SELECT c.a, c.b, count(*) AS cnt
  FROM cand c
  JOIN dsh da ON da.did = c.a
  JOIN dsh db ON db.did = c.b AND db.sh = da.sh
  GROUP BY c.a, c.b
), scored AS (
  SELECT c.a, c.b,
    CASE WHEN coalesce(sa.n, 0) + coalesce(sb.n, 0) - coalesce(i.cnt, 0) > 0
         THEN CAST(coalesce(i.cnt, 0) AS DOUBLE)
              / (coalesce(sa.n, 0) + coalesce(sb.n, 0) - coalesce(i.cnt, 0))
         ELSE 1.0 END AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
  LEFT JOIN sz sa ON sa.did = c.a
  LEFT JOIN sz sb ON sb.did = c.b
)
SELECT a, b, jaccard FROM scored WHERE jaccard >= {tau} ORDER BY a, b"""


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

# Legacy fixed coarse partition count — still the DEFAULT for the
# tiny fixed-size pair-hash spaces, but every data-proportional
# exchange now sizes itself via scale.shuffle_buckets (input bytes /
# ~512 MB, floored at 2x cluster cores) so a map_groups bucket stays
# bounded no matter the input size.
N_COARSE = 32


def dedup_exact(ds, text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int | None = None):
    """Exact duplicate removal: canonical (min id) per distinct text.

    Shape: hash-partition on a stable content hash folded into a
    data-size-driven number of buckets (equal texts always co-locate),
    then one vectorized pandas groupby(text).min per partition — EXACT
    text equality, so hash collisions cannot corrupt the result.
    """
    from . import ops as _ops
    from .scale import shuffle_buckets

    nb = n_buckets or shuffle_buckets(ds)

    def add_hash(b: pa.Table) -> pa.Table:
        h = _stable_hash(b.column(text_col)).astype(np.int64)
        return b.select([id_col, text_col]).append_column(
            "__h", pa.array(h)
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pa.Table) -> pa.Table:
        out = (g.select([id_col, text_col]).to_pandas()
               .groupby(text_col, sort=False)[id_col].min()
               .reset_index(drop=False))
        return pa.table({id_col: out[id_col].to_numpy(dtype=np.int64)})

    # content-hash exchange on the sort-free direct split+gather (equal
    # texts share __h, so they co-locate; exact per-text dedup inside)
    return _ops.coarse_group_by_cell(hashed, per_bucket, key_col="__h",
                                     n_buckets=nb)


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


# --------------------------------------------------------------------------
# PII scrubbing / regex redaction (SQL-oracle-able, exact)
# --------------------------------------------------------------------------

# Default redaction ruleset a training-data pipeline applies before any
# text leaves the ingest stage. RE2 syntax only (no backrefs/lookahead)
# so the pyarrow kernels and the DuckDB oracle share one dialect.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9() .-]{7,}[0-9]", "<PHONE>"),
]


def scrub_text(ds, rules: list[tuple[str, str, str]] | None = None,
               text_col: str = "text", id_col: str = "doc_id",
               out_col: str = "text_clean"):
    """Sequential regex redaction: for each (name, pattern, replacement)
    rule IN ORDER, count non-overlapping matches in the CURRENT text,
    then replace them — later rules see earlier rules' replacements,
    exactly like a chained `regexp_replace(..., 'g')` in SQL. Output:
    id, scrubbed text, one `n_<name>` count column per rule, and the
    total `n_redacted`. All pyarrow.compute kernels (RE2), zero
    per-row Python; embarrassingly parallel, no shuffle."""
    if rules is None:
        rules = PII_RULES

    def f(b: pa.Table) -> pa.Table:
        cur = b.column(text_col)
        cols: dict = {id_col: b.column(id_col)}
        total = np.zeros(len(b), dtype=np.int64)
        for name, pat, rep in rules:
            n = _count_re(cur, pat)
            cur = pc.replace_substring_regex(cur, pat, rep)
            cols[f"n_{name}"] = n
            total += n
        cols[out_col] = cur
        cols["n_redacted"] = total
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def scrub_oracle_sql(rules: list[tuple[str, str, str]] | None = None,
                     table: str = "documents", text_col: str = "text",
                     id_col: str = "doc_id",
                     out_col: str = "text_clean") -> str:
    """The DuckDB-equivalent CTE chain for scrub_text's sequential
    semantics, generated from the SAME ruleset (single source of
    truth so the oracle can never drift from the engine)."""
    if rules is None:
        rules = PII_RULES
    sql = f"WITH s0 AS (SELECT {id_col}, {text_col} AS t FROM {table})"
    names = []
    for i, (name, pat, rep) in enumerate(rules, start=1):
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        prev = ", ".join(f"n_{n}" for n in names)
        prev = prev + ", " if prev else ""
        sql += (f", s{i} AS (SELECT {id_col}, {prev}"
                f"len(regexp_extract_all(t, '{p}')) AS n_{name}, "
                f"regexp_replace(t, '{p}', '{r}', 'g') AS t FROM s{i-1})")
        names.append(name)
    counts = ", ".join(f"n_{n}" for n in names)
    total = " + ".join(f"n_{n}" for n in names)
    return (f"{sql} SELECT {id_col}, {counts}, t AS {out_col}, "
            f"{total} AS n_redacted FROM s{len(rules)}")


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


def lang_id_oracle_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB SQL reproducing `lang_id` exactly — GENERATED from the
    same _STOPWORDS tables (scrub_pii precedent, so engine and oracle
    cannot drift): lowercase [a-zA-Z']-run tokens, per-language
    stopword hit counts, argmax with ties to the FIRST language in
    table order (the engine's np.argmax), 'unknown' when no language
    scores. The engine tests membership by 64-bit token hash; equality
    holds absent a hash collision between a corpus token and a stopword
    (~1e-17 per corpus)."""
    langs = list(_STOPWORDS)
    hit_cols = []
    for lang in langs:
        words = ", ".join("'" + w.replace("'", "''") + "'"
                          for w in sorted(_STOPWORDS[lang]))
        hit_cols.append(
            f"sum(CASE WHEN tok IN ({words}) THEN 1 ELSE 0 END) AS h_{lang}")
    # ordered >= chain == np.argmax first-max tie rule
    case = "CASE WHEN " + " + ".join(f"coalesce(h_{lang}, 0)"
                                     for lang in langs) + " = 0 " \
        "OR " + " IS NULL AND ".join(f"h_{lang}" for lang in langs) + \
        " IS NULL THEN 'unknown' "
    for i, lang in enumerate(langs):
        conds = " AND ".join(
            f"coalesce(h_{lang}, 0) >= coalesce(h_{other}, 0)"
            for other in langs[i + 1:]) or "TRUE"
        prior = " AND ".join(
            f"coalesce(h_{lang}, 0) > coalesce(h_{other}, 0)"
            for other in langs[:i])
        cond = conds if not prior else f"{prior} AND {conds}"
        case += f"WHEN coalesce(h_{lang}, 0) > 0 AND {cond} " \
                f"THEN '{lang}' "
    case += "ELSE 'unknown' END"
    return f"""WITH toks AS (
  SELECT {id_col} AS id,
         unnest(list_filter(
           string_split_regex(lower({text_col}), '[^a-zA-Z'']+'),
           t -> t <> '')) AS tok
  FROM {table}
), hits AS (
  SELECT id, {', '.join(hit_cols)} FROM toks GROUP BY id
)
SELECT d.{id_col}, {case} AS lang_pred
FROM {table} d LEFT JOIN hits h ON d.{id_col} = h.id
ORDER BY d.{id_col}"""


def lang_id(ds, concurrency: int = 2):
    return ds.map_batches(LangId, batch_format="pyarrow", batch_size=4096,
                          concurrency=concurrency)


class QualityScorer:
    """Actor-pool model-inference stage — the training-data pipeline's
    'quality classifier' slot.

    Weights load ONCE per actor in __init__ (here a deterministic
    built-in linear model standing in for a classifier checkpoint — no
    model weights ship in this sandbox; on a real cluster point
    ``weight_source`` at a checkpoint file and load it here), and
    __call__ scores each batch with one vectorized feature extraction +
    dot product. Same actor shape as LangId: swap the model without
    touching the pipeline.

    The built-in weights are dyadic rationals (powers of two) over
    integer count features, so every product and partial sum is EXACT
    in float64: scores are bit-identical under any summation order,
    which is what lets a SQL oracle hash-verify a model-scoring
    pipeline end to end.
    """

    #: (feature, weight); dyadic weights => exact float64 arithmetic
    WEIGHTS = (("n_tokens", 0.5), ("n_alpha", 0.125),
               ("n_digits", -0.25), ("n_chars", -0.015625))
    #: dyadic; centers the testdata score distribution so `keep` is a
    #: discriminating ~50/50 split, not a constant column
    BIAS = -52.0

    def __init__(self, weight_source: str | None = None):
        if weight_source is not None:  # pragma: no cover - cluster path
            raise NotImplementedError(
                "external checkpoint loading needs a model format choice")
        self.w = {k: v for k, v in self.WEIGHTS}

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        feats = {
            "n_tokens": _count_re(txt, r"[^\s]+"),
            "n_alpha": _count_re(txt, "[a-z]"),
            "n_digits": _count_re(txt, "[0-9]"),
            "n_chars": pc.fill_null(pc.utf8_length(txt), 0)
                         .cast(pa.int64()).to_numpy(),
        }
        z = np.full(len(batch), self.BIAS)
        for name, w in self.WEIGHTS:
            z += w * feats[name]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "q_score": pa.array(z),
            "keep": pa.array(z > 0.0),
        })


def quality_score(ds, concurrency: int = 2):
    """Model-scored document quality: (doc_id, q_score, keep)."""
    return ds.map_batches(QualityScorer, batch_format="pyarrow",
                          batch_size=4096, concurrency=concurrency)


def _flat_tokens(txt) -> tuple[np.ndarray, "pa.Array"]:
    """(per-doc token count, flattened tokens) with Python str.split()
    semantics (whitespace runs, no empties) — columnar: Arrow split +
    flatten + empty filter, never a Python loop over tokens.

    The counts are derived from the SAME split that produces the flat
    tokens (not a separate regex with a different whitespace class), so
    ``sum(lens) == len(flat)`` holds for every input — including text
    containing non-ASCII whitespace (\\x0b, \\xa0, …) where an RE2
    ``\\s`` count would disagree with ``utf8_split_whitespace``."""
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    splits = pc.utf8_split_whitespace(txt)
    n = len(txt)
    raw_lens = pc.fill_null(pc.list_value_length(splits), 0).cast(
        pa.int64()).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(splits)
    if len(flat):
        nonempty = pc.greater(pc.utf8_length(flat), 0)
        flat = flat.filter(nonempty)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), raw_lens)
        mask = nonempty.to_numpy(zero_copy_only=False)
        lens = np.bincount(doc_of[mask], minlength=n).astype(np.int64)
    else:
        lens = np.zeros(n, dtype=np.int64)
    return lens, flat


def fingerprint(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Order-sensitive document fingerprint: polynomial rolling hash of
    the token-hash sequence (Rabin-Karp over tokens, mod 2^61-1).
    Deterministic across processes; swapping two tokens changes it.
    Token hashes use the SQL-recomputable `_sql_hash`, so
    `fingerprint_oracle_sql` reproduces this exactly in DuckDB."""

    def f(b: pa.Table) -> pa.Table:
        lens, flat = _flat_tokens(b.column(text_col))
        fp = np.zeros(len(lens), dtype=np.uint64)
        if len(flat):
            th = _sql_hash(flat) % _MERSENNE
            base = np.uint64(1000003)
            # sequential fold per doc: fp = fp*base + h (vectorized over
            # docs at each token position)
            starts = np.cumsum(lens) - lens
            maxlen = int(lens.max())
            for j in range(maxlen):
                active = lens > j
                idx = starts[active] + j
                # fp*base is up to 2^81 — a plain uint64 product wraps
                # BEFORE the mod and silently changes the hash. Exact
                # mod-M via the Mersenne identity 2^61 = 1 (mod M):
                # fp = hi*2^30 + lo; hi*base*2^30 = a*2^61 + b*2^30
                # = a + b*2^30 (mod M). Every intermediate < 2^62.
                f_ = fp[active]
                hi, lo = f_ >> np.uint64(30), f_ & np.uint64((1 << 30) - 1)
                t1 = hi * base  # < 2^51
                a = t1 >> np.uint64(31)
                bb = (t1 & np.uint64((1 << 31) - 1)) << np.uint64(30)
                fp[active] = (
                    (a + bb) % _MERSENNE + lo * base + th[idx]
                ) % _MERSENNE
        return pa.table({id_col: b.column(id_col), "fp": fp.astype(np.int64)})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# shingles / minhash / simhash
# --------------------------------------------------------------------------

_SHINGLE_BASE = np.uint64(1099511628211)  # FNV prime fold of token hashes


def _shingle_hashes(txt, k: int = 3,
                    sql_hash: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, shingle_hash) for DISTINCT k-gram shingles per doc —
    fully vectorized: flat token hashes + a k-slice rolling combine, no
    Python loop over docs or tokens. A shingle's identity is its token
    sequence (hash-combined), so equality matches the joined-string
    definition the SQL oracles use. Docs shorter than k tokens
    contribute their full token sequence as one shingle.

    ``sql_hash=True`` swaps the token hash to the SQL-recomputable
    `_sql_hash` so a DuckDB oracle can reproduce the shingle hash
    VALUES bit for bit (minhash banding needs the values, not just
    hash identity); the default keeps the faster xxhash where only
    set identity matters (exact-jaccard verification)."""
    lens, flat = _flat_tokens(txt)
    n = len(lens)
    if len(flat) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    th = _sql_hash(flat) if sql_hash else _stable_hash(flat)
    starts = np.cumsum(lens) - lens
    doc_of_tok = np.repeat(np.arange(n, dtype=np.int64), lens)
    off = np.arange(len(th), dtype=np.int64) - starts[doc_of_tok]
    # full k-windows (docs with >= k tokens)
    valid = (lens[doc_of_tok] >= k) & (off <= lens[doc_of_tok] - k)
    p = np.nonzero(valid)[0]
    h = th[p].copy()
    for j in range(1, k):
        h = h * _SHINGLE_BASE + th[p + j]
    dd = [doc_of_tok[p]]
    hh = [h]
    # short docs: one shingle folding the whole token sequence
    short = np.nonzero((lens > 0) & (lens < k))[0]
    for length in np.unique(lens[short]):
        docs_l = short[lens[short] == length]
        s = starts[docs_l]
        hs = th[s].copy()
        for j in range(1, int(length)):
            hs = hs * _SHINGLE_BASE + th[s + j]
        dd.append(docs_l)
        hh.append(hs)
    doc_idx = np.concatenate(dd)
    sh = np.concatenate(hh)
    # DISTINCT (doc, shingle): lexsort + adjacent-dup drop
    order = np.lexsort((sh, doc_idx))
    doc_idx, sh = doc_idx[order], sh[order]
    if len(doc_idx) > 1:
        keep = np.empty(len(doc_idx), dtype=bool)
        keep[0] = True
        keep[1:] = (doc_idx[1:] != doc_idx[:-1]) | (sh[1:] != sh[:-1])
        doc_idx, sh = doc_idx[keep], sh[keep]
    return doc_idx, sh


def _perm_params(n_perm: int = N_PERM, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), n_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), n_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3,
                       sql_hash: bool = True) -> pa.Table:
    """(doc_id, band, band_hash) rows: 64 minhash perms folded into 16
    band keys. One output row per (doc, band) — the LSH bucket keys.
    Default token hash is the SQL-recomputable one so
    `neardup_minhash_oracle_sql` reproduces the band keys exactly."""
    ids = batch.column(id_col)
    doc_idx, sh = _shingle_hashes(batch.column(text_col), k,
                                  sql_hash=sql_hash)
    n = len(batch)
    a, b = _perm_params()
    sig = np.full((n, N_PERM), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh):
        shm = sh % _MERSENNE
        # doc_idx is doc-sorted (lexsort in _shingle_hashes), so each
        # doc's shingles are one contiguous segment: minimum.reduceat
        # over segments beats unbuffered np.minimum.at ~1.6x; a single
        # (shingles x 64) 2-D pass is WORSE (memory traffic), so the
        # permutation loop stays. Elementwise formula (uint64 wrap then
        # mod) is unchanged.
        seg = np.concatenate([[0], np.nonzero(doc_idx[1:] != doc_idx[:-1])[0] + 1])
        seg_docs = doc_idx[seg]
        for p in range(N_PERM):
            hv = (a[p] * shm + b[p]) % _MERSENNE
            sig[seg_docs, p] = np.minimum.reduceat(hv, seg)
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


# --------------------------------------------------------------------------
# distributed pair machinery: dedup, lookup join, exact verification
# --------------------------------------------------------------------------

def _pair_bucket(a: np.ndarray, b: np.ndarray,
                 n_buckets: int = N_COARSE) -> np.ndarray:
    h = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ b.astype(np.uint64)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def attach_pair_lookup(pairs_ds, lookup_ds, lookup_key: str, lookup_col: str,
                       out_a: str, out_b: str, n_buckets: int | None = None):
    """Attach one lookup column to BOTH endpoints of an (a, b) pair
    stream with a SINGLE pass over the lookup table: each pair is keyed
    twice (once per endpoint) into the same coarse hash(key) shuffle as
    the lookup rows; the two half-annotated copies are then pivoted
    back together on a PAIRS-sized pair-hash shuffle. The big table is
    exchanged once — two attach_lookup passes would shuffle it twice.
    """
    from .scale import shuffle_buckets

    nb = n_buckets or shuffle_buckets(pairs_ds, lookup_ds)
    lk_schema = lookup_ds.schema()
    lk_type = dict(zip(lk_schema.names, lk_schema.types))[lookup_col]

    def tag_pairs(b: pa.Table) -> pa.Table:
        if len(b) == 0 or "a" not in b.column_names:
            return pa.table({"__k": pa.array([], type=pa.int64()),
                             "a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "__slot": pa.array([], type=pa.int8()),
                             "__v": pa.array([], type=lk_type)})
        a = b.column("a").to_numpy()
        bb = b.column("b").to_numpy()
        keys = np.concatenate([a, bb])
        out = {
            "__k": pa.array(keys.astype(np.int64)),
            "a": pa.array(np.concatenate([a, a])),
            "b": pa.array(np.concatenate([bb, bb])),
            "__slot": pa.array(
                np.repeat(np.array([0, 1], dtype=np.int8), len(a))),
            "__v": pa.nulls(2 * len(a), type=lk_type),
        }
        return pa.table(out)

    def tag_lookup(b: pa.Table) -> pa.Table:
        keys = b.column(lookup_key).to_numpy()
        n = len(b)
        return pa.table({
            "__k": pa.array(keys.astype(np.int64)),
            "a": pa.nulls(n, type=pa.int64()),
            "b": pa.nulls(n, type=pa.int64()),
            "__slot": pa.array(np.full(n, 2, dtype=np.int8)),
            "__v": b.column(lookup_col),
        })

    cols = ["__k", "a", "b", "__slot", "__v"]
    both = (
        pairs_ds.map_batches(tag_pairs, batch_format="pyarrow", batch_size=None)
        .select_columns(cols)
        .union(
            lookup_ds.map_batches(tag_lookup, batch_format="pyarrow", batch_size=None)
            .select_columns(cols)
        )
    )

    def annotate(g: pa.Table) -> pa.Table:
        """Attach the lookup value to each half-pair in this bucket;
        emit pair-hash-keyed halves for the pivot."""
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64()),
                          "__slot": pa.array([], type=pa.int8()),
                          "__v": pa.array([], type=lk_type),
                          "__pb": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "__slot" not in g.column_names:
            return empty
        slot = g.column("__slot").to_numpy()
        halves_t = g.filter(pa.array(slot != 2))
        if halves_t.num_rows == 0:
            return empty
        # keys stay in numpy/pandas (fast int merges); the payload
        # column stays in ARROW and is gathered by `take` at the end —
        # routing list/binary payloads through pandas would box every
        # value into a Python object
        halves = halves_t.select(["__k", "a", "b", "__slot"]).to_pandas()
        halves["__i"] = np.arange(len(halves), dtype=np.int64)
        # duplicate input pairs (e.g. the same candidate surfacing from
        # several LSH bands) dedup HERE, inside the shuffle they already
        # ride — all copies of a half share its endpoint key, hence this
        # bucket. Saves callers a dedicated global-dedup exchange; also
        # keeps the pivot's merge 1x1 (duplicated halves would multiply
        # quadratically there).
        halves = halves.drop_duplicates(subset=["__k", "a", "b", "__slot"])
        lk_t = g.filter(pa.array(slot == 2))
        lk = lk_t.select(["__k"]).to_pandas()
        lk["__j"] = np.arange(len(lk), dtype=np.int64)
        merged = halves.merge(lk, on="__k", how="inner")
        a = merged["a"].to_numpy(dtype=np.int64)
        b = merged["b"].to_numpy(dtype=np.int64)
        vals = lk_t.column("__v").take(
            pa.array(merged["__j"].to_numpy(dtype=np.int64)))
        return pa.table({
            "a": a, "b": b,
            "__slot": pa.array(merged["__slot"].to_numpy(dtype=np.int8)),
            "__v": vals,
            "__pb": pa.array(_pair_bucket(a, b, nb)),
        })

    from . import ops as _ops

    # both exchanges ride the sort-free direct split+gather when the
    # stream fits (auto falls back to the streaming sorted groupby)
    halves = _ops.coarse_group_by_cell(both, annotate, key_col="__k",
                                       n_buckets=nb)

    def pivot(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64()),
                          out_a: pa.array([], type=lk_type),
                          out_b: pa.array([], type=lk_type)})
        if g.num_rows == 0 or "__slot" not in g.column_names:
            return empty
        slot = g.column("__slot").to_numpy()
        ga_t = g.filter(pa.array(slot == 0))
        gb_t = g.filter(pa.array(slot == 1))
        ga = ga_t.select(["a", "b"]).to_pandas()
        ga["__i"] = np.arange(len(ga), dtype=np.int64)
        gb = gb_t.select(["a", "b"]).to_pandas()
        gb["__j"] = np.arange(len(gb), dtype=np.int64)
        merged = ga.merge(gb, on=["a", "b"])
        ia = pa.array(merged["__i"].to_numpy(dtype=np.int64))
        ib = pa.array(merged["__j"].to_numpy(dtype=np.int64))
        return pa.table({
            "a": pa.array(merged["a"].to_numpy(dtype=np.int64)),
            "b": pa.array(merged["b"].to_numpy(dtype=np.int64)),
            out_a: ga_t.column("__v").take(ia),
            out_b: gb_t.column("__v").take(ib),
        })

    return _ops.coarse_group_by_cell(halves, pivot, key_col="__pb",
                                     n_buckets=nb)


def _exact_jaccard_cols(text_a, text_b, k: int = 3) -> np.ndarray:
    """Row-wise exact k-gram Jaccard between two string columns —
    vectorized over ALL pairs in the batch (shingle both columns flat,
    count per-row intersections by sorted duplicate detection)."""
    n = len(text_a)
    da, ha = _shingle_hashes(text_a, k)
    db, hb = _shingle_hashes(text_b, k)
    sa = np.bincount(da, minlength=n)
    sb = np.bincount(db, minlength=n)
    cd = np.concatenate([da, db])
    ch = np.concatenate([ha, hb])
    order = np.lexsort((ch, cd))
    cd, ch = cd[order], ch[order]
    inter = np.zeros(n, dtype=np.int64)
    if len(cd) > 1:
        dup = (cd[1:] == cd[:-1]) & (ch[1:] == ch[:-1])
        inter = np.bincount(cd[1:][dup], minlength=n)
    union = sa + sb - inter
    # both sides empty -> Jaccard 1.0 by convention
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


def shingle_sig_ds(ds, k: int = 3, text_col: str = "text",
                   id_col: str = "doc_id"):
    """(id, sig) — each doc's DISTINCT shingle hashes as an ascending
    list<int64> column. Shingling happens ONCE per doc here; every
    downstream verification intersects the precomputed lists instead of
    re-tokenizing text per candidate pair (a doc in p pairs would be
    re-shingled p times on the text path)."""

    def f(b: pa.Table) -> pa.Table:
        di, sh = _shingle_hashes(b.column(text_col), k)
        sizes = np.bincount(di, minlength=len(b))
        offsets = np.zeros(len(b) + 1, dtype=np.int64)
        np.cumsum(sizes, out=offsets[1:])
        sig = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            pa.array(sh.astype(np.int64)))
        return pa.table({id_col: b.column(id_col), "sig": sig})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def _exact_jaccard_from_sigs(la, lb) -> np.ndarray:
    """Row-wise exact Jaccard between two list<int64> columns of
    DISTINCT sorted hashes — one flat duplicate-detection pass, no
    per-row Python."""
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    if isinstance(lb, pa.ChunkedArray):
        lb = lb.combine_chunks()
    n = len(la)
    sa = pc.fill_null(pc.list_value_length(la), 0).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    sb = pc.fill_null(pc.list_value_length(lb), 0).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    fa = pc.list_flatten(la).to_numpy(zero_copy_only=False)
    fb = pc.list_flatten(lb).to_numpy(zero_copy_only=False)
    cd = np.concatenate([np.repeat(np.arange(n, dtype=np.int64), sa),
                         np.repeat(np.arange(n, dtype=np.int64), sb)])
    ch = np.concatenate([fa, fb])
    order = np.lexsort((ch, cd))
    cd, ch = cd[order], ch[order]
    inter = np.zeros(n, dtype=np.int64)
    if len(cd) > 1:
        dup = (cd[1:] == cd[:-1]) & (ch[1:] == ch[:-1])
        inter = np.bincount(cd[1:][dup], minlength=n)
    union = sa + sb - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


# past this many candidate pairs the endpoint id set is too big to
# hold on the driver; verification falls back to the full exchange
SEMIJOIN_MAX_PAIRS = 2_000_000


def verify_jaccard_pairs(pairs_ds, docs_ds, tau: float, k: int = 3,
                         text_col: str = "text", id_col: str = "doc_id",
                         via: str = "sig"):
    """Exact verification stage for candidate (a, b) pairs: attach both
    endpoints' payloads via ONE coarse-bucket hash join pass over the
    docs table (no payload ever rides the candidate shuffle, no driver
    state), then one vectorized exact-Jaccard kernel + threshold
    filter. ``via='sig'`` (default) ships each doc's precomputed
    distinct-shingle-hash list — same bytes as the text, but shingling
    runs once per DOC instead of once per PAIR ENDPOINT (measured ~60 s
    of redundant tokenization on a 548k-candidate verify at 200k docs).
    ``via='text'`` ships raw text and re-shingles per pair — kept as
    the cross-check path."""
    if via == "sig":
        import ray

        from . import ops as _ops

        # endpoint semi-join: candidates are ids-only — when the pair
        # set is small, broadcast the distinct endpoint ids and
        # compute/ship sigs for ONLY those docs instead of the whole
        # corpus (measured: 200k docs shingled+shuffled to verify ~10k
        # pairs). The gate keeps the driver-held id set bounded; past
        # it, the full exchange (which never holds ids on the driver)
        # takes over. Deciding the gate must not re-execute the pair
        # pipeline: an already-materialized input (the direct-exchange
        # path) answers from block metadata for free; a LAZY input
        # (the sort-exchange fallback) is materialized ONCE and then
        # metadata-counted — BOTH branches consume the stream right
        # after, so this single execution is the floor, whereas a
        # limit(gate+1).count() probe re-runs the upstream sort
        # shuffle a second time for whichever branch wins (measured
        # +85 s on the 2 M-doc jaccard lap: the probe's cost is the
        # INPUT shuffle, not the probed row count). The losing branch
        # holds only ids-only pair rows (~24 B each) for the moment
        # before the verify join drains them.
        from ray.data.dataset import MaterializedDataset

        if not isinstance(pairs_ds, MaterializedDataset):
            pairs_ds = pairs_ds.materialize()
        small = pairs_ds.count() <= SEMIJOIN_MAX_PAIRS
        docs_src = docs_ds
        if small:
            id_blocks = [t.select(["a", "b"]) for t in
                         ray.get(_ops.arrow_refs(pairs_ds))
                         if t.num_rows > 0 and "a" in t.column_names]
            if id_blocks:
                cat = pa.concat_tables(id_blocks)
                need = np.unique(np.concatenate(
                    [cat.column("a").to_numpy(), cat.column("b").to_numpy()]))
                need_ref = ray.put(need)

                def only_endpoints(b: pa.Table) -> pa.Table:
                    ids = b.column(id_col).to_numpy()
                    m = np.isin(ids, ray.get(need_ref),
                                assume_unique=False)
                    return b.filter(pa.array(m))

                docs_src = docs_ds.map_batches(
                    only_endpoints, batch_format="pyarrow", batch_size=None)
        sigs = shingle_sig_ds(docs_src, k, text_col, id_col)
        with_b = attach_pair_lookup(pairs_ds, sigs, id_col, "sig",
                                    "__sa", "__sb")

        def fin(b: pa.Table) -> pa.Table:
            if len(b) == 0:
                return pa.table({"a": pa.array([], type=pa.int64()),
                                 "b": pa.array([], type=pa.int64()),
                                 "jaccard": pa.array([], type=pa.float64())})
            jac = _exact_jaccard_from_sigs(b.column("__sa"), b.column("__sb"))
            keep = jac >= tau
            return pa.table({"a": b.column("a").to_numpy()[keep],
                             "b": b.column("b").to_numpy()[keep],
                             "jaccard": jac[keep]})

        return with_b.map_batches(fin, batch_format="pyarrow", batch_size=None)

    docs = docs_ds.select_columns([id_col, text_col])
    with_b = attach_pair_lookup(pairs_ds, docs, id_col, text_col, "__ta", "__tb")

    def fin(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "jaccard": pa.array([], type=pa.float64())})
        jac = _exact_jaccard_cols(b.column("__ta"), b.column("__tb"), k)
        keep = jac >= tau
        return pa.table({"a": b.column("a").to_numpy()[keep],
                         "b": b.column("b").to_numpy()[keep],
                         "jaccard": jac[keep]})

    return with_b.map_batches(fin, batch_format="pyarrow", batch_size=None)


def neardup_minhash(ds, tau: float = 0.8, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3):
    """MinHash-LSH near-duplicate pairs with exact verification.

    shingle -> minhash -> band keys (map_batches, IDS ONLY — document
    text never enters the band shuffle) -> coarse (band, band_hash)
    buckets -> vectorized candidate self-merge -> exact-Jaccard
    verification joined against the docs table (cross-band duplicate
    candidates dedup inside the join's own shuffle — no dedicated
    dedup barrier). Reported pairs are SOUND (verified exactly); recall
    follows the LSH banding curve (tested against brute force).
    """
    from . import ops as _ops
    from .scale import shuffle_buckets

    nb = shuffle_buckets(ds)

    def sigs(b: pa.Table) -> pa.Table:
        s = minhash_signatures(b, text_col, id_col, k)
        # one int64 exchange key per LSH bucket: equal (band, band_hash)
        # => equal key => co-located by the coarse exchange
        key = (
            s.column("band_hash").to_numpy().astype(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
            + s.column("band").to_numpy().astype(np.uint64)
        ).astype(np.int64)
        return s.append_column("__bkey", pa.array(key))

    sig_ds = ds.map_batches(sigs, batch_format="pyarrow", batch_size=None)

    def coarse_pairs(g: pa.Table) -> pa.Table:
        """True LSH buckets live inside this coarse partition: one
        vectorized self-merge on (band, band_hash) enumerates every
        same-bucket pair; emits ids only, pre-keyed for global dedup."""
        g = g.select([id_col, "band", "band_hash"]).to_pandas()
        m = g.merge(g, on=["band", "band_hash"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        out = m[[f"{id_col}_a", f"{id_col}_b"]].drop_duplicates()
        a = out[f"{id_col}_a"].to_numpy(dtype=np.int64)
        b = out[f"{id_col}_b"].to_numpy(dtype=np.int64)
        return pa.table({"a": a, "b": b, "__pb": _pair_bucket(a, b)})

    # band exchange on the sort-free direct split+gather (auto falls
    # back to the streaming sorted groupby past the size gate)
    pairs = _ops.coarse_group_by_cell(sig_ds, coarse_pairs,
                                      key_col="__bkey", n_buckets=nb)

    # the same pair can surface from bands in DIFFERENT coarse
    # partitions; the global dedup rides the verify join's own shuffle
    # (attach_pair_lookup dedups halves in-bucket) — one less all-to-all
    # barrier than a dedicated dedup stage
    return verify_jaccard_pairs(pairs, ds, tau, k, text_col, id_col)


def simhash(ds, text_col: str = "text", id_col: str = "doc_id"):
    """64-bit SimHash over token hashes: per bit, sum +/-1 across tokens,
    sign gives the bit. Near-identical docs differ in few bits. Token
    hashes use the SQL-recomputable `_sql_hash`, so `simhash_oracle_sql`
    / `neardup_simhash_oracle_sql` reproduce this exactly in DuckDB."""

    def f(b: pa.Table) -> pa.Table:
        lens, flat = _flat_tokens(b.column(text_col))
        n = len(lens)
        acc = np.zeros((n, 64), dtype=np.int64)
        if len(flat):
            th = _sql_hash(flat)
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


def neardup_simhash(ds, max_hamming: int = 3, text_col: str = "text",
                    id_col: str = "doc_id"):
    """ALL pairs whose 64-bit SimHash signatures differ in at most
    ``max_hamming`` bits — EXACT at the signature level by pigeonhole
    banding: the 64 bits split into max_hamming+1 disjoint bands, so a
    pair within the threshold has zero differing bits in at least one
    band and collides there. Candidates ride an ids-only band shuffle;
    both signatures are attached in one hash-join pass
    (attach_pair_lookup, which also dedups cross-band duplicates) and
    the exact XOR popcount filters. Completes the dedup family: exact
    (hash), MinHash-LSH (probabilistic Jaccard), n-gram Jaccard
    (exact), SimHash (exact hamming), embedding cosine."""
    from .scale import shuffle_buckets

    from . import ops as _ops

    nband = max_hamming + 1
    cuts = np.linspace(0, 64, nband + 1).astype(np.uint64)
    n_buckets = shuffle_buckets(ds)
    sig = simhash(ds, text_col, id_col)

    def bands(b: pa.Table) -> pa.Table:
        h = b.column("simhash").to_numpy().astype(np.uint64)
        n = len(h)
        out_id = np.tile(b.column(id_col).to_numpy(), nband)
        out_band = np.repeat(np.arange(nband, dtype=np.int64), n)
        def band_mask(width: np.uint64) -> np.uint64:
            # width == 64 (max_hamming=0: one full-width band) would
            # make 1<<64 undefined in numpy — full mask special-cased
            if int(width) >= 64:
                return ~np.uint64(0)
            return (np.uint64(1) << width) - np.uint64(1)

        keys = np.concatenate([
            ((h >> cuts[i]) & band_mask(cuts[i + 1] - cuts[i]))
            for i in range(nband)
        ]).astype(np.int64)
        bkey = (
            keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + out_band.astype(np.uint64)
        ).astype(np.int64)
        return pa.table({id_col: out_id, "band": out_band, "key": keys,
                         "__bkey": bkey})

    band_ds = sig.map_batches(bands, batch_format="pyarrow", batch_size=None)

    def coarse_pairs(g: pa.Table) -> pa.Table:
        g = g.select([id_col, "band", "key"]).to_pandas()
        m = g.merge(g, on=["band", "key"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        out = m[[f"{id_col}_a", f"{id_col}_b"]].drop_duplicates()
        a = out[f"{id_col}_a"].to_numpy(dtype=np.int64)
        b = out[f"{id_col}_b"].to_numpy(dtype=np.int64)
        return pa.table({"a": a, "b": b, "__pb": _pair_bucket(a, b)})

    pairs = _ops.coarse_group_by_cell(band_ds, coarse_pairs,
                                      key_col="__bkey", n_buckets=n_buckets)
    with_h = attach_pair_lookup(pairs, sig, id_col, "simhash", "__ha", "__hb")

    def fin(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        x = (b.column("__ha").to_numpy().astype(np.uint64)
             ^ b.column("__hb").to_numpy().astype(np.uint64))
        ham = np.unpackbits(x.view(np.uint8)).reshape(len(x), 64).sum(
            axis=1).astype(np.int64)
        keep = ham <= max_hamming
        return pa.table({"a": b.column("a").to_numpy()[keep],
                         "b": b.column("b").to_numpy()[keep],
                         "hamming": ham[keep]})

    return with_h.map_batches(fin, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# exact n-gram Jaccard pairs via token inverted index (SQL-oracle-able)
# --------------------------------------------------------------------------

def jaccard_pairs_exact(ds, tau: float, k: int = 3,
                        text_col: str = "text", id_col: str = "doc_id",
                        df_cap: int | None = None,
                        prefix_filter: bool = True):
    """ALL pairs with k-gram Jaccard >= tau via a distributed shingle
    inverted index: explode distinct shingles (each row carrying its
    doc's shingle-set size — no driver-side sizes broadcast),
    groupby(shingle hash) emits per-bucket doc pairs, groupby(pair
    hash) sums intersections and computes Jaccard in place. The shuffle
    key is the 8-byte shingle hash. Exact counterpart of the
    probabilistic neardup_minhash; its DuckDB oracle is the same
    algebra in SQL.

    ``df_cap``: with skewed corpora one hot shingle of document
    frequency df emits O(df^2) pair rows. Setting df_cap drops shingles
    with df > df_cap from the index (stop-shingles) and switches the
    tail of the pipeline to candidate generation + EXACT verification
    against full shingle sets — reported pairs stay exact; only pairs
    ALL of whose common shingles are hot can be missed (the documented
    contract, standard stop-word practice). df_cap=None is fully exact.

    ``prefix_filter``: AllPairs prefix filtering (Bayardo et al., WWW
    2007) — index only each doc's |A| - ceil(tau*|A|) + 1 smallest
    shingle hashes. For any pair with J >= tau the common shingle count
    c >= ceil(tau*max(|A|,|B|)), so the SMALLEST common shingle sits
    within the first |X| - c + 1 <= prefix elements of BOTH docs: every
    qualifying pair still collides in the index, and candidates go
    through the exact verification join — EXACT results from a
    (1-tau)-fraction index. This is the 100-TB shape: the quadratic
    pair expansion shrinks ~(1-tau)^2-fold and the shuffled index rows
    drop by tau, at the cost of one extra exchange (the verify join).
    ON by default — it is the scale-safe path and passes the same
    exact oracle; ``prefix_filter=False`` keeps the naive full-index
    algebra (quadratic on a hot shingle) for test cross-checks.
    """

    from . import ops as _ops
    from .scale import shuffle_buckets

    nb = shuffle_buckets(ds)

    def shingles(b: pa.Table) -> pa.Table:
        doc_idx, sh = _shingle_hashes(b.column(text_col), k)
        ids = b.column(id_col).take(pa.array(doc_idx))
        # per-doc distinct-shingle count rides along on every index row:
        # the pair stage reads sizes from its own co-located rows
        sizes = np.bincount(doc_idx, minlength=len(b))
        if prefix_filter and len(doc_idx):
            # _shingle_hashes output is doc-segment-contiguous with
            # shingle hashes ASCENDING inside each segment (its lexsort
            # orders by (doc, hash)) — the prefix is a positional mask
            lens = sizes[doc_idx]
            starts = np.cumsum(sizes) - sizes
            pos = np.arange(len(doc_idx), dtype=np.int64) - starts[doc_idx]
            pfx = lens - np.ceil(tau * lens).astype(np.int64) + 1
            keep = pos < pfx
            doc_idx, sh, pos = doc_idx[keep], sh[keep], pos[keep]
            ids = b.column(id_col).take(pa.array(doc_idx))
        out = {
            id_col: ids,
            "sh": sh.astype(np.int64),
            "sz": sizes[doc_idx].astype(np.int64),
        }
        if prefix_filter and df_cap is None:
            # position = rank of the shingle in the doc's ascending
            # hash list; feeds the PPJoin positional filter downstream
            out["pos"] = (pos if len(doc_idx) else
                          np.empty(0, dtype=np.int64))
        return pa.table(out)

    sh_ds = ds.map_batches(shingles, batch_format="pyarrow", batch_size=None)

    def bucket_pairs(g: pa.Table) -> pa.Table:
        """All same-shingle doc pairs of this bucket, aggregated to one
        row per (a, b) — pure numpy: sort by (shingle, id), enumerate
        each shingle segment's upper triangle arithmetically (ids
        ascending within a segment, so a < b by construction), then one
        (a, b) lexsort + reduceat for the per-pair counts/firsts/maxes.
        A doc's DISTINCT shingles mean a segment never repeats an id.
        All rows of one shingle are co-located here, so its true
        document frequency is computable in place — the df_cap guard
        drops hot shingles BEFORE the quadratic enumeration."""
        empty_cols = {"a": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64()),
                      "c": pa.array([], type=pa.int32()),
                      "sa": pa.array([], type=pa.int32()),
                      "sb": pa.array([], type=pa.int32())}
        has_pos = "pos" in g.column_names
        if has_pos:
            empty_cols["mpa"] = pa.array([], type=pa.int32())
            empty_cols["mpb"] = pa.array([], type=pa.int32())
        empty_cols["__pb"] = pa.array([], type=pa.int64())
        if g.num_rows == 0 or "sh" not in g.column_names:
            return pa.table(empty_cols)
        ids = g.column(id_col).to_numpy()
        sh = g.column("sh").to_numpy()
        sz = g.column("sz").to_numpy()
        pos = g.column("pos").to_numpy() if has_pos else None
        order = np.lexsort((ids, sh))
        sh_s = sh[order]
        n = len(sh_s)
        boundary = np.empty(n, dtype=bool)
        boundary[0] = True
        boundary[1:] = sh_s[1:] != sh_s[:-1]
        seg_start = np.maximum.accumulate(
            np.where(boundary, np.arange(n), 0))
        seg_len = np.zeros(n, dtype=np.int64)
        starts = np.nonzero(boundary)[0]
        lens = np.diff(np.append(starts, n))
        seg_len[starts] = lens
        f = np.repeat(lens, lens)            # segment length per row
        within = np.arange(n) - seg_start    # rank within segment
        if df_cap is not None:
            keepable = f <= df_cap
        else:
            keepable = np.ones(n, dtype=bool)
        # upper-triangle enumeration: row r pairs with the
        # (f - 1 - within) rows after it in its segment
        reps = np.where(keepable, f - 1 - within, 0)
        total = int(reps.sum())
        if total == 0:
            return pa.table(empty_cols)
        ai = np.repeat(np.arange(n), reps)
        block_start = np.cumsum(reps) - reps
        bi = ai + 1 + (np.arange(total) - block_start[ai])
        ga, gb = order[ai], order[bi]
        # length filter, exact in every mode: J = c/(sa+sb-c) <=
        # min/max < tau when sizes are incompatible — drop those pairs
        # BEFORE they enter the pair-sum exchange (the volume driver:
        # sum over shingles of df^2 partial rows)
        sa_v = sz[ga].astype(np.float64)
        sb_v = sz[gb].astype(np.float64)
        m = np.minimum(sa_v, sb_v) * (1.0 + 1e-12) >= \
            tau * np.maximum(sa_v, sb_v)
        ga, gb = ga[m], gb[m]
        if len(ga) == 0:
            return pa.table(empty_cols)
        a_v, b_v = ids[ga], ids[gb]
        # one lexsort + segment reduceat replaces the pandas groupby agg
        po = np.lexsort((b_v, a_v))
        a_v, b_v, ga, gb = a_v[po], b_v[po], ga[po], gb[po]
        pb = np.empty(len(a_v), dtype=bool)
        pb[0] = True
        pb[1:] = (a_v[1:] != a_v[:-1]) | (b_v[1:] != b_v[:-1])
        seg = np.nonzero(pb)[0]
        c = np.diff(np.append(seg, len(a_v))).astype(np.int32)
        out = {"a": a_v[seg], "b": b_v[seg], "c": c,
               "sa": sz[ga[seg]].astype(np.int32),
               "sb": sz[gb[seg]].astype(np.int32)}
        if has_pos:
            out["mpa"] = np.maximum.reduceat(pos[ga], seg).astype(np.int32)
            out["mpb"] = np.maximum.reduceat(pos[gb], seg).astype(np.int32)
        out["__pb"] = _pair_bucket(out["a"], out["b"], nb)
        return pa.table(out)

    # shingle-hash exchange: sort-free two-wave direct split+gather when
    # the input fits (the spatial_join round-3 win — Ray's sort-based
    # groupby was ~half this pipeline's wall), sorted streaming groupby
    # beyond the gate
    partial = _ops.coarse_group_by_cell(sh_ds, bucket_pairs, key_col="sh",
                                        n_buckets=nb)

    # sum intersections per pair, FUSED with the threshold/bound filter:
    # the pair-sum exchange carries ~df^2 partial rows; emitting the
    # filtered result from the same task avoids materializing the
    # summed-pair stream (measured 17M rows -> 52k survivors on the
    # 200k-doc suite corpus) into a second stage
    def sum_pairs_filter(g: pa.Table) -> pa.Table:
        naive = df_cap is None and not prefix_filter
        empty_cols = {"a": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64())}
        if naive:
            empty_cols["jaccard"] = pa.array([], type=pa.float64())
        if g.num_rows == 0 or "a" not in g.column_names:
            return pa.table(empty_cols)
        has_pos = "mpa" in g.column_names
        # lexsort + reduceat in place of a pandas groupby agg — the
        # partial stream is the pipeline's volume peak (~18M rows on
        # the 200k-doc suite corpus)
        a_r = g.column("a").to_numpy()
        b_r = g.column("b").to_numpy()
        c_r = g.column("c").to_numpy().astype(np.int64)
        po = np.lexsort((b_r, a_r))
        a_r, b_r, c_r = a_r[po], b_r[po], c_r[po]
        nb_mask = np.empty(len(a_r), dtype=bool)
        nb_mask[0] = True
        nb_mask[1:] = (a_r[1:] != a_r[:-1]) | (b_r[1:] != b_r[:-1])
        seg = np.nonzero(nb_mask)[0]
        a = a_r[seg].astype(np.int64)
        bb = b_r[seg].astype(np.int64)
        c = np.add.reduceat(c_r, seg).astype(np.float64)
        sa = g.column("sa").to_numpy()[po][seg].astype(np.float64)
        sb = g.column("sb").to_numpy()[po][seg].astype(np.float64)
        if naive:
            # full index: the summed c IS the exact intersection
            jac = c / (sa + sb - c)
            keep = jac >= tau
            return pa.table({"a": a[keep], "b": bb[keep],
                             "jaccard": jac[keep]})
        # length filter (exact): J >= tau needs min(|A|,|B|) >= tau*max
        keep = np.minimum(sa, sb) * (1.0 + 1e-12) >= tau * np.maximum(sa, sb)
        if prefix_filter and df_cap is None and has_pos:
            # Remaining-overlap filter, two sound bounds combined:
            # (1) suffix bound — the smallest uncounted common is
            #     outside one doc's prefix, and hash order then forces
            #     ALL uncounted commons into that SAME doc's suffix:
            #     u <= max(ceil(tau*sa), ceil(tau*sb)) - 1.
            # (2) PPJoin positional bound (Xiao et al., WWW 2008) —
            #     every uncounted common hashes above the max-hash
            #     counted common at positions (mpa, mpb) (per-doc hash
            #     ranks, so one shingle holds both maxes):
            #     u <= min(sa-1-mpa, sb-1-mpb).
            # Neither dominates: an EARLY prefix match makes (2) loose
            # (measured: (2) alone let candidates explode 548k -> 8M on
            # the 200k-doc suite corpus), a LATE match makes (1) loose.
            # total overlap <= c + min of both; J >= tau needs total
            # overlap >= tau/(1+tau)*(|A|+|B|). Kills the
            # one-shared-shingle candidate flood BEFORE payloads ship.
            mpa = np.maximum.reduceat(
                g.column("mpa").to_numpy()[po], seg).astype(np.float64)
            mpb = np.maximum.reduceat(
                g.column("mpb").to_numpy()[po], seg).astype(np.float64)
            sfx = np.maximum(np.ceil(tau * sa), np.ceil(tau * sb)) - 1.0
            rem = np.minimum(sa - 1.0 - mpa, sb - 1.0 - mpb)
            max_total = c + np.minimum(sfx, rem)
            keep &= max_total * (1.0 + tau) * (1.0 + 1e-12) >= tau * (sa + sb)
        return pa.table({"a": a[keep], "b": bb[keep]})

    result = _ops.coarse_group_by_cell(partial, sum_pairs_filter,
                                       key_col="__pb", n_buckets=nb)
    if df_cap is None and not prefix_filter:
        return result

    # df_cap / prefix_filter path: the reduced index undercounts
    # intersections (hot shingles dropped / suffix shingles unindexed),
    # so candidates go through the exact verification join instead of
    # the in-place algebra
    return verify_jaccard_pairs(result, ds, tau, k, text_col, id_col)


def checkpointed_dedup_exact(ds, out_dir: str, text_col: str = "text",
                             id_col: str = "doc_id", resume: bool = True) -> dict:
    """dedup_exact with resumable, partitioned output — the shape a
    100-TB dedup run needs: survivors are written one parquet file per
    content-hash bucket (`survivors-{bucket}.parquet`, atomic rename)
    plus a manifest recording rows/bytes/wall_ms per bucket. On rerun,
    finished buckets are filtered out BEFORE the shuffle — their rows
    never enter the exchange, so a resumed run only pays for the
    missing partitions. Returns the manifest; read results with
    read_parquet(out_dir)."""
    import json
    import os
    import time

    import pyarrow.parquet as pq

    from .scale import shuffle_buckets

    os.makedirs(out_dir, exist_ok=True)
    man_path = os.path.join(out_dir, "manifest.json")
    done: dict[str, dict] = {}
    nb: int | None = None
    if resume and os.path.exists(man_path):
        with open(man_path) as f:
            man0 = json.load(f)
        done = man0["buckets"]
        # bucket ids are only meaningful under the count that produced
        # them — a resumed run MUST reuse the manifest's count, never
        # re-derive it from (possibly re-estimated) input bytes
        nb = int(man0.get("n_buckets") or 0) or None
    if nb is None:
        nb = shuffle_buckets(ds)
    done_ids = np.fromiter((int(k) for k in done), dtype=np.int64,
                           count=len(done))
    nbu = np.uint64(nb)

    def add_hash(b: pa.Table) -> pa.Table:
        h = (_stable_hash(b.column(text_col)) % nbu).astype(np.int64)
        keep = ~np.isin(h, done_ids)
        return (
            b.select([id_col, text_col])
            .append_column("__bucket", pa.array(h))
            .filter(pa.array(keep))
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", batch_size=None)

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"bucket": np.int64, "rows": np.int64, "bytes": np.int64,
                "wall_ms": float}
        if len(g) == 0 or "__bucket" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})
        t0 = time.perf_counter()
        bucket = int(g["__bucket"].iloc[0])
        out = (g.groupby(text_col, sort=False)[id_col].min()
               .reset_index(drop=False)[[id_col]].sort_values(id_col))
        fname = os.path.join(out_dir, f"survivors-{bucket}.parquet")
        tmp = fname + ".tmp"
        # strip the pandas schema-metadata dict: unhashable metadata
        # disables Ray's block-schema dedup when the shard is read back
        pq.write_table(
            pa.Table.from_pandas(out, preserve_index=False)
            .replace_schema_metadata(None), tmp)
        os.replace(tmp, fname)
        return pd.DataFrame({"bucket": [bucket], "rows": [len(out)],
                             "bytes": [os.path.getsize(fname)],
                             "wall_ms": [round((time.perf_counter() - t0) * 1e3, 2)]})

    stats = hashed.groupby("__bucket").map_groups(
        write_bucket, batch_format="pandas").to_pandas()
    buckets = dict(done)
    for r in stats.itertuples():
        buckets[str(int(r.bucket))] = {
            "file": f"survivors-{int(r.bucket)}.parquet",
            "rows": int(r.rows), "bytes": int(r.bytes),
            "wall_ms": float(r.wall_ms),
        }
    man = {
        "n_buckets": nb,
        "total_survivors": sum(b["rows"] for b in buckets.values()),
        "built_buckets": len(stats), "resumed_buckets": len(done),
        "buckets": buckets,
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, man_path)
    return man


def dup_spans(ds, k: int = 8, df_cap: int | None = 64,
              text_col: str = "text", id_col: str = "doc_id"):
    """Duplicate k-token span detection — all (a, b) doc pairs sharing
    at least one contiguous k-token span, with the count of DISTINCT
    shared spans. The substring-level dedup signal of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better") at a
    fixed window: exact-substring dedup is approximated by k-gram
    identity, which is the standard scalable shape.

    Same two-exchange plan as ``jaccard_pairs_exact`` (shingle-hash
    exchange -> per-bucket upper-triangle pair enumeration -> pair-hash
    exchange -> per-pair sum), minus the similarity algebra: the span
    count itself is the output.

    ``df_cap`` drops spans shared by more than df_cap documents BEFORE
    the quadratic per-span pair enumeration — at corpus scale a span in
    thousands of docs is boilerplate, and reporting its O(df^2) pairs
    is both useless and the one unbounded-skew hazard of the plan. The
    cap is part of the operator's exact semantics (the SQL oracle
    applies the same HAVING), not a lossy heuristic.
    """
    from . import ops as _ops
    from .scale import shuffle_buckets

    nb = shuffle_buckets(ds)

    def spans(b: pa.Table) -> pa.Table:
        doc_idx, sh = _shingle_hashes(b.column(text_col), k)
        ids = b.column(id_col).take(pa.array(doc_idx))
        return pa.table({id_col: ids, "sh": sh.astype(np.int64)})

    sh_ds = ds.map_batches(spans, batch_format="pyarrow", batch_size=None)

    def bucket_pairs(g: pa.Table) -> pa.Table:
        empty = {"a": pa.array([], type=pa.int64()),
                 "b": pa.array([], type=pa.int64()),
                 "c": pa.array([], type=pa.int64()),
                 "__pb": pa.array([], type=pa.int64())}
        if g.num_rows == 0 or "sh" not in g.column_names:
            return pa.table(empty)
        ids = g.column(id_col).to_numpy()
        sh = g.column("sh").to_numpy()
        order = np.lexsort((ids, sh))
        sh_s, ids_s = sh[order], ids[order]
        n = len(sh_s)
        boundary = np.empty(n, dtype=bool)
        boundary[0] = True
        boundary[1:] = sh_s[1:] != sh_s[:-1]
        starts = np.nonzero(boundary)[0]
        lens = np.diff(np.append(starts, n))
        f = np.repeat(lens, lens)
        within = np.arange(n) - np.repeat(starts, lens)
        keepable = f <= df_cap if df_cap is not None else np.ones(n, bool)
        reps = np.where(keepable, f - 1 - within, 0)
        total = int(reps.sum())
        if total == 0:
            return pa.table(empty)
        ai = np.repeat(np.arange(n), reps)
        block_start = np.cumsum(reps) - reps
        bi = ai + 1 + (np.arange(total) - block_start[ai])
        a_v, b_v = ids_s[ai], ids_s[bi]
        # per-doc shingles are DISTINCT, so every (a, b) row here is a
        # distinct shared span; combine duplicates within the bucket
        po = np.lexsort((b_v, a_v))
        a_v, b_v = a_v[po], b_v[po]
        pb = np.empty(len(a_v), dtype=bool)
        pb[0] = True
        pb[1:] = (a_v[1:] != a_v[:-1]) | (b_v[1:] != b_v[:-1])
        seg = np.nonzero(pb)[0]
        c = np.diff(np.append(seg, len(a_v))).astype(np.int64)
        a_o, b_o = a_v[seg], b_v[seg]
        return pa.table({"a": a_o, "b": b_o, "c": c,
                         "__pb": _pair_bucket(a_o, b_o, nb)})

    partial = _ops.coarse_group_by_cell(sh_ds, bucket_pairs, key_col="sh",
                                        n_buckets=nb)

    def sum_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "a" not in g.column_names:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "n_shared": pa.array([], type=pa.int64())})
        a_r = g.column("a").to_numpy()
        b_r = g.column("b").to_numpy()
        c_r = g.column("c").to_numpy()
        po = np.lexsort((b_r, a_r))
        a_r, b_r, c_r = a_r[po], b_r[po], c_r[po]
        nb_mask = np.empty(len(a_r), dtype=bool)
        nb_mask[0] = True
        nb_mask[1:] = (a_r[1:] != a_r[:-1]) | (b_r[1:] != b_r[:-1])
        seg = np.nonzero(nb_mask)[0]
        return pa.table({"a": a_r[seg].astype(np.int64),
                         "b": b_r[seg].astype(np.int64),
                         "n_shared": np.add.reduceat(c_r, seg).astype(np.int64)})

    return _ops.coarse_group_by_cell(partial, sum_pairs, key_col="__pb",
                                     n_buckets=nb)


def dup_spans_oracle_sql(k: int = 8, df_cap: int | None = 64,
                         table: str = "documents", text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    """Exact DuckDB SQL for ``dup_spans``: k-gram spans as joined token
    strings (shingle-hash identity == token-sequence identity), the
    SAME df_cap HAVING, pair counts by self-join. Docs shorter than k
    tokens contribute their whole token sequence as one span — the
    ``_shingle_hashes`` short-doc rule, reproduced in the first CTE."""
    cap = "" if df_cap is None else f" HAVING count(*) <= {df_cap}"
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(k)).replace(
        "w[i+0]", "w[i]")
    return f"""
WITH t AS (SELECT {id_col}, {tokens_sql(text_col)} AS w FROM {table}),
g AS (
  SELECT {id_col}, {gram} AS sh
  FROM t, unnest(generate_series(1, len(w) - {k - 1})) AS u(i)
  WHERE len(w) >= {k}
  UNION ALL
  SELECT {id_col}, array_to_string(w, ' ') AS sh FROM t
  WHERE len(w) > 0 AND len(w) < {k}
),
d AS (SELECT DISTINCT {id_col}, sh FROM g),
ok AS (SELECT sh FROM d GROUP BY sh{cap})
SELECT x.{id_col} AS a, y.{id_col} AS b, count(*)::BIGINT AS n_shared
FROM d x JOIN d y ON x.sh = y.sh AND x.{id_col} < y.{id_col}
JOIN ok ON ok.sh = x.sh
GROUP BY 1, 2
"""


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition quality metrics (the Gopher-rule family,
    Rae et al. 2021, token-level): total/distinct 2-gram and 3-gram
    occurrence counts, the top-2-gram occurrence count, and the
    fraction of tokens covered by the most frequent 2-gram
    (``top_2g_frac = 2 * top_2g_count / n_tokens``). High values mark
    boilerplate/spam for training-data filtering.

    Integer counts plus ONE final IEEE division — the SQL oracle
    performs the identical division of the identical integers, so even
    the float column compares bit-for-bit.
    """

    def stats(b: pa.Table) -> pa.Table:
        lens, flat = _flat_tokens(b.column(text_col))
        n = len(lens)
        th = _stable_hash(flat)
        starts = np.cumsum(lens) - lens
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        out = {id_col: b.column(id_col),
               "n_tokens": lens.astype(np.int64)}
        for kk in (2, 3):
            tot = np.maximum(lens - (kk - 1), 0)
            off = np.arange(len(th), dtype=np.int64) - starts[doc_of]
            valid = off <= lens[doc_of] - kk
            p = np.nonzero(valid)[0]
            h = th[p].copy()
            for j in range(1, kk):
                h = h * _SHINGLE_BASE + th[p + j]
            d = doc_of[p]
            po = np.lexsort((h, d))
            d_s, h_s = d[po], h[po]
            m = len(d_s)
            runs = np.empty(m, dtype=bool)
            if m:
                runs[0] = True
                runs[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
            rs = np.nonzero(runs)[0]
            rlen = np.diff(np.append(rs, m))
            rdoc = d_s[rs]
            distinct = np.bincount(rdoc, minlength=n) if m else \
                np.zeros(n, dtype=np.int64)
            out[f"n_{kk}g"] = tot.astype(np.int64)
            out[f"n_{kk}g_distinct"] = distinct.astype(np.int64)
            if kk == 2:
                top = np.zeros(n, dtype=np.int64)
                if m:
                    db = np.empty(m, dtype=bool)
                    db[0] = True
                    db[1:] = d_s[1:] != d_s[:-1]
                    dstarts = np.nonzero(db[rs])[0]
                    docs_present = rdoc[dstarts]
                    top[docs_present] = np.maximum.reduceat(rlen, dstarts)
                out["top_2g_count"] = top
                frac = np.zeros(n, dtype=np.float64)
                nz = lens > 0
                frac[nz] = (2.0 * top[nz]) / lens[nz]
                out["top_2g_frac"] = frac
        return pa.table(out)

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=None)


def repetition_stats_oracle_sql(table: str = "documents",
                                text_col: str = "text",
                                id_col: str = "doc_id") -> str:
    """Exact DuckDB SQL for ``repetition_stats`` — counts from the same
    token windows, top-2-gram fraction as the same single division."""
    return f"""
WITH t AS (SELECT {id_col}, {tokens_sql(text_col)} AS w FROM {table}),
g2 AS (SELECT {id_col}, w[i] || ' ' || w[i+1] AS g
       FROM t, unnest(generate_series(1, len(w) - 1)) AS u(i)),
g3 AS (SELECT {id_col}, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
       FROM t, unnest(generate_series(1, len(w) - 2)) AS u(i)),
c2 AS (SELECT {id_col}, g, count(*) AS c FROM g2 GROUP BY 1, 2),
a2 AS (SELECT {id_col}, sum(c)::BIGINT AS n_2g, count(*)::BIGINT AS d_2g,
              max(c)::BIGINT AS top2 FROM c2 GROUP BY 1),
a3 AS (SELECT {id_col}, count(*)::BIGINT AS n_3g,
              count(DISTINCT g)::BIGINT AS d_3g FROM g3 GROUP BY 1)
SELECT t.{id_col}, coalesce(len(w), 0)::BIGINT AS n_tokens,
  coalesce(a2.n_2g, 0) AS n_2g, coalesce(a2.d_2g, 0) AS n_2g_distinct,
  coalesce(a2.top2, 0) AS top_2g_count,
  CASE WHEN len(w) > 0
       THEN CAST(2 * coalesce(a2.top2, 0) AS DOUBLE) / len(w)
       ELSE 0.0 END AS top_2g_frac,
  coalesce(a3.n_3g, 0) AS n_3g, coalesce(a3.d_3g, 0) AS n_3g_distinct
FROM t LEFT JOIN a2 ON a2.{id_col} = t.{id_col}
       LEFT JOIN a3 ON a3.{id_col} = t.{id_col}
"""


def _splitmix64_np(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer on uint64 (same mixers as _sql_hash)."""
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(_MIX1)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(_MIX2)
        return z ^ (z >> np.uint64(31))


def _check_rates(rates: dict[str, float]) -> None:
    """Sampling rates must be honest probabilities: outside [0, 1] the
    engine's uint64 threshold wraps (a -0.1 would keep ~90%) while the
    SQL oracle's negative literal keeps nothing — fail loudly instead
    of diverging silently."""
    bad = {k: v for k, v in rates.items() if not (0.0 <= float(v) <= 1.0)}
    if bad:
        raise ValueError(f"sampling rates must be in [0, 1]: {bad}")


def sample_stratified(ds, rates: dict[str, float],
                      strata_col: str = "source",
                      key_col: str = "doc_id",
                      default_rate: float = 1.0,
                      seed: int = 0x9E3779B97F4A7C15):
    """Deterministic stratified (data-mixing) sample: keep a row iff
    splitmix64(key XOR seed) < rate[stratum] * 2^64. The standard
    reproducible-downsampling shape for corpus mixing at scale:

    - NO shuffle, no RNG state — one streaming map_batches filter, so
      it composes with any pipeline position and costs one pass;
    - decisions depend only on (key, seed, stratum rate), so retries,
      resumes and re-runs keep EXACTLY the same rows (a sampled shard
      can be rebuilt bit-identically after a node loss);
    - per-stratum rates are exact integer thresholds (floor(rate*2^64)
      compared against the 64-bit mix), so the realized sample is the
      same in any engine that reproduces the mix — the DuckDB oracle
      (`sample_stratified_oracle_sql`) is generated from the same
      constants.

    Strata absent from ``rates`` keep ``default_rate``. Keys must be
    non-negative int64 (the oracle's ``::UBIGINT`` cast rejects
    negatives loudly rather than silently wrapping like numpy would).
    """
    _check_rates({**rates, "<default>": default_rate})
    thr = {k: min(int(v * float(_M64)), _M64) for k, v in rates.items()}
    default_thr = min(int(default_rate * float(_M64)), _M64)
    seed_u = np.uint64(seed & (_M64 - 1))

    def keep(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        ids = b.column(key_col).to_numpy().astype(np.uint64)
        h = _splitmix64_np(ids ^ seed_u)
        strata = b.column(strata_col)
        if isinstance(strata, pa.ChunkedArray):
            strata = strata.combine_chunks()
        enc = strata.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        # a rate-1.0 threshold is 2^64, one past uint64: carry it as a
        # separate always-keep flag so the h < thr compare stays exact.
        # A NULL stratum gets default_rate (matching the SQL CASE's
        # ELSE branch): the sentinel slot appended after the dictionary
        t_all = [thr.get(u, default_thr) for u in uniq] + [default_thr]
        t_small = np.array([min(t, _M64 - 1) for t in t_all],
                           dtype=np.uint64)
        t_full = np.array([t >= _M64 for t in t_all], dtype=bool)
        idx = pc.fill_null(enc.indices, len(uniq)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        mask = (h < t_small[idx]) | t_full[idx]
        return b.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)


def sample_stratified_oracle_sql(rates: dict[str, float],
                                 strata_col: str = "source",
                                 key_col: str = "doc_id",
                                 default_rate: float = 1.0,
                                 seed: int = 0x9E3779B97F4A7C15,
                                 table: str = "documents") -> str:
    """Exact DuckDB SQL for ``sample_stratified``: the splitmix64 mix
    and the integer thresholds are reproduced with HUGEINT arithmetic
    (the token_hash_sql_ctes machinery), so the kept row set is
    bit-identical."""
    _check_rates({**rates, "<default>": default_rate})
    thr = {k: min(int(v * float(_M64)), _M64) for k, v in rates.items()}
    default_thr = min(int(default_rate * float(_M64)), _M64)
    cases = " ".join(f"WHEN '{k}' THEN {v}::HUGEINT"
                     for k, v in sorted(thr.items()))
    case_sql = (f"CASE {strata_col} {cases} ELSE {default_thr}::HUGEINT END"
                if thr else f"{default_thr}::HUGEINT")
    seed_u = seed & (_M64 - 1)
    z0 = f"xor({key_col}::UBIGINT, {seed_u}::UBIGINT)::HUGEINT"
    z1 = _mulmod64_sql(f"xor(({z0})::UBIGINT, ({z0})::UBIGINT >> 30)::HUGEINT",
                       _MIX1)
    return f"""
WITH m1 AS (SELECT *, {z1} AS z FROM {table}),
m2 AS (SELECT * EXCLUDE (z),
       {_mulmod64_sql("xor(z::UBIGINT, z::UBIGINT >> 27)::HUGEINT", _MIX2)}
       AS z FROM m1),
mf AS (SELECT * EXCLUDE (z), xor(z::UBIGINT, z::UBIGINT >> 31)::HUGEINT AS h
       FROM m2)
SELECT * EXCLUDE (h) FROM mf WHERE h < {case_sql}
"""
