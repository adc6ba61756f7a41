"""Training-data text ops vs DuckDB / brute-force oracles (sf0.001)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geograft import textops as T
from geograft.io import read_parquet_sized


@pytest.fixture(scope="module")
def con(sf_small):
    c = duckdb.connect()
    c.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    return c


def docs_ds(sf_dir):
    return read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def test_dedup_exact_vs_sql(ray_session, con, sf_small):
    got = np.sort(T.dedup_exact(docs_ds(sf_small)).to_pandas()["doc_id"].to_numpy())
    want = con.sql(
        "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id"
    ).df()["doc_id"].to_numpy()
    np.testing.assert_array_equal(got, want)
    assert len(got) <= 500


def test_token_stats_vs_sql(ray_session, con, sf_small):
    got = T.token_stats(docs_ds(sf_small)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = con.sql(
        "SELECT doc_id, len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))::BIGINT AS n_tokens, "
        "length(text)::BIGINT AS n_chars_q, "
        "(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT AS n_digits, "
        "CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END AS alpha_ratio "
        "FROM documents ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lang_id_heuristic(ray_session, sf_small):
    out = T.lang_id(docs_ds(sf_small)).to_pandas()
    assert len(out) == 500
    assert set(out.columns) == {"doc_id", "lang_pred"}
    # the synthetic corpus is English word soup containing 'the'/'a'
    assert (out["lang_pred"] == "en").mean() > 0.5


def test_fingerprint_order_sensitive(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": [0, 1, 2, 3],
                  "text": ["a b c", "a b c", "c b a", ""]})
    out = T.fingerprint(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    fp = out["fp"].to_numpy()
    assert fp[0] == fp[1]          # identical text -> identical fp
    assert fp[0] != fp[2]          # reordered tokens -> different fp
    assert fp[3] == 0              # empty text -> zero fp


def test_minhash_soundness_and_recall(ray_session, con, sf_small):
    tau = 0.8
    got = T.neardup_minhash(docs_ds(sf_small), tau=tau).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    # exact ground truth from DuckDB 3-gram jaccard
    want = con.sql(f"""
        WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS w FROM documents),
        g AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
              FROM t, unnest(generate_series(1, len(w)-2)) AS u(i)),
        d AS (SELECT DISTINCT doc_id, sh FROM g),
        sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
                  FROM d a JOIN d b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1,2)
        SELECT i, j FROM inter JOIN sz sa ON sa.doc_id = i JOIN sz sb ON sb.doc_id = j
        WHERE CAST(c AS DOUBLE)/(sa.n + sb.n - c) >= {tau}
    """).fetchall()
    want_pairs = set(want)
    # soundness: every reported pair is a true pair (Jaccard verified exactly)
    assert got_pairs <= want_pairs
    # recall: banding (16 bands x 4 rows) catches J>=0.8 pairs w.h.p.
    if want_pairs:
        assert len(got_pairs) / len(want_pairs) >= 0.9
        assert len(want_pairs) > 0


def test_jaccard_pairs_exact_vs_sql(ray_session, con, sf_small):
    tau = 0.5
    got = T.jaccard_pairs_exact(docs_ds(sf_small), tau=tau).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    want = con.sql(f"""
        WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS w FROM documents),
        g AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
              FROM t, unnest(generate_series(1, len(w)-2)) AS u(i)),
        d AS (SELECT DISTINCT doc_id, sh FROM g),
        sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
                  FROM d a JOIN d b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1,2)
        SELECT i, j FROM inter JOIN sz sa ON sa.doc_id = i JOIN sz sb ON sb.doc_id = j
        WHERE CAST(c AS DOUBLE)/(sa.n + sb.n - c) >= {tau}
    """).fetchall()
    assert got_pairs == set(want)
    assert len(got_pairs) > 0, "fixture has near-duplicate docs"


def test_simhash_near_dup_property(ray_session):
    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog again and again today"
    t = pa.table({
        "doc_id": [0, 1, 2],
        "text": [base, base.replace("today", "tonight"), "completely different words entirely unrelated content here"],
    })
    out = T.simhash(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    h = out["simhash"].to_numpy().astype(np.uint64)
    d01 = bin(int(h[0]) ^ int(h[1])).count("1")
    d02 = bin(int(h[0]) ^ int(h[2])).count("1")
    assert d01 < d02, f"near-dup hamming {d01} should beat unrelated {d02}"
    # determinism across calls
    out2 = T.simhash(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    np.testing.assert_array_equal(out["simhash"].to_numpy(), out2["simhash"].to_numpy())


def test_jaccard_df_cap_matches_exact_on_fixture(ray_session, sf_small):
    """df_cap far above the fixture's max shingle df must not change the
    result — the candidate+verify tail is as exact as the algebra."""
    got_exact = T.jaccard_pairs_exact(docs_ds(sf_small), tau=0.5).to_pandas()
    got_cap = T.jaccard_pairs_exact(docs_ds(sf_small), tau=0.5, df_cap=512).to_pandas()
    a = set(zip(got_exact["a"], got_exact["b"]))
    b = set(zip(got_cap["a"], got_cap["b"]))
    assert a == b and len(a) > 0
    ja = got_exact.sort_values(["a", "b"])["jaccard"].to_numpy()
    jb = got_cap.sort_values(["a", "b"])["jaccard"].to_numpy()
    np.testing.assert_allclose(ja, jb)


def test_jaccard_hot_shingle_guard(ray_session):
    """One shingle shared by EVERY doc must not emit O(n^2) pair rows
    when df_cap is set; near-dup pairs sharing rare shingles are still
    found with exact jaccard."""
    import ray.data as rd

    n = 2000
    hot = "alpha beta gamma"          # one 3-gram shared by all docs
    texts = [f"{hot} doc{i} filler{i} token{i} extra{i}" for i in range(n)]
    # docs 0 and 1: near-identical beyond the hot shingle
    texts[0] = f"{hot} same same same same same one"
    texts[1] = f"{hot} same same same same same two"
    t = pa.table({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    out = T.jaccard_pairs_exact(
        rd.from_arrow(t), tau=0.5, df_cap=64
    ).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (0, 1) in pairs
    # exact jaccard on full sets (hot shingle counted!): each doc has 9
    # tokens -> 5 DISTINCT shingles; common = {hot, 'beta gamma same',
    # 'gamma same same', 'same same same'} = 4
    row = out[(out["a"] == 0) & (out["b"] == 1)].iloc[0]
    want = 4 / (5 + 5 - 4)
    np.testing.assert_allclose(row["jaccard"], want)

def test_jaccard_prefix_filter_matches_exact(ray_session, sf_small):
    """AllPairs prefix filtering is EXACT: any tau-similar pair shares
    its smallest common shingle within both prefixes, so the reduced
    index finds the same pair set and verification the same values."""
    for tau in (0.3, 0.5, 0.8):
        got_exact = T.jaccard_pairs_exact(
            docs_ds(sf_small), tau=tau, prefix_filter=False).to_pandas()
        got_pfx = T.jaccard_pairs_exact(
            docs_ds(sf_small), tau=tau, prefix_filter=True).to_pandas()
        a = set(zip(got_exact["a"], got_exact["b"]))
        b = set(zip(got_pfx["a"], got_pfx["b"]))
        assert a == b, f"tau={tau}: prefix pair set diverged"
        ja = got_exact.sort_values(["a", "b"])["jaccard"].to_numpy()
        jb = got_pfx.sort_values(["a", "b"])["jaccard"].to_numpy()
        np.testing.assert_allclose(ja, jb)
    assert len(a) > 0


def test_jaccard_prefix_overlap_bound_sound(ray_session):
    """Regression for the remaining-overlap filter bound: uncounted
    common shingles can ALL sit in the larger doc's suffix, so the
    bound must use max(suffix_A, suffix_B), not min. A random
    small-vocab corpus (heavy overlap, k=1 so token sets ARE shingle
    sets) makes boundary pairs common; the prefix path must report the
    IDENTICAL pair set as the naive full-index algebra at every tau."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 16), replace=False))
        for _ in range(120)
    ]
    # plant boundary pairs: supersets whose overlap is exactly tau-sized
    texts[100] = "w0 w30 w31 w32"
    texts[101] = "w0 w1 w2 w3 w4 w30 w31 w32"   # J=0.5, advice counterexample
    t = pa.table({"doc_id": np.arange(len(texts), dtype=np.int64),
                  "text": texts})

    def pairs(df):
        return set(zip(df["a"], df["b"])) if len(df) else set()

    for tau in (0.3, 0.5, 0.7):
        naive = T.jaccard_pairs_exact(
            rd.from_arrow(t), tau=tau, k=1, prefix_filter=False).to_pandas()
        pfx = T.jaccard_pairs_exact(
            rd.from_arrow(t), tau=tau, k=1, prefix_filter=True).to_pandas()
        a, b = pairs(naive), pairs(pfx)
        assert a == b, f"tau={tau}: prefix dropped {a - b} / added {b - a}"
        if tau <= 0.5:
            assert (100, 101) in a and len(a) > 1


def test_flat_tokens_nonascii_whitespace(ray_session):
    """Counts and flattened tokens must come from ONE whitespace
    definition: text containing \\x0b / \\xa0 (Unicode whitespace not in
    RE2's ASCII \\s) used to desync them and crash _shingle_hashes."""
    import ray.data as rd

    txt = pa.array(["a\x0bb c", "x\xa0y", "plain text here", "", None])
    lens, flat = T._flat_tokens(txt)
    assert int(lens.sum()) == len(flat)
    assert lens.tolist() == [3, 2, 3, 0, 0]
    # downstream ops run without broadcast errors and stay per-doc
    doc_idx, sh = T._shingle_hashes(txt, k=3)
    assert set(doc_idx.tolist()) <= {0, 1, 2}
    t = pa.table({"doc_id": np.arange(5, dtype=np.int64), "text": txt})
    fp = T.fingerprint(rd.from_arrow(t)).to_pandas()
    assert len(fp) == 5
    sh_out = T.simhash(rd.from_arrow(t)).to_pandas()
    assert len(sh_out) == 5


def test_neardup_simhash_zero_hamming(ray_session):
    """max_hamming=0 means one full-width 64-bit band; the band mask
    must be ~0 (1<<64 is undefined in numpy), so only identical
    signatures collide and the pair set is exact duplicates only."""
    import ray.data as rd

    texts = ["alpha beta gamma delta", "alpha beta gamma delta",
             "totally different content words", "alpha beta gamma delt"]
    t = pa.table({"doc_id": np.arange(4, dtype=np.int64), "text": texts})
    out = T.neardup_simhash(rd.from_arrow(t), max_hamming=0).to_pandas()
    assert set(zip(out["a"], out["b"])) == {(0, 1)}
    assert out["hamming"].tolist() == [0]


def test_jaccard_prefix_filter_shrinks_index(ray_session):
    """The prefix index holds ~(1-tau)|A|+1 shingles per doc, and
    identical docs are still found at tau=1.0-epsilon (the smallest
    shingle is always indexed)."""
    import ray.data as rd

    n = 500
    texts = [f"one two three four five six seven eight nine ten doc{i}"
             for i in range(n)]
    texts[7] = texts[3]  # plant an exact duplicate pair
    t = pa.table({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    out = T.jaccard_pairs_exact(
        rd.from_arrow(t), tau=0.95, prefix_filter=True).to_pandas()
    assert set(zip(out["a"], out["b"])) == {(3, 7)}
    np.testing.assert_allclose(out["jaccard"].to_numpy(), [1.0])
    # index volume check: prefix keeps |A| - ceil(tau|A|) + 1 rows/doc
    doc_idx, sh = T._shingle_hashes(t.column("text"), 3)
    sizes = np.bincount(doc_idx, minlength=n)
    pfx = sizes - np.ceil(0.95 * sizes).astype(np.int64) + 1
    assert pfx.sum() < 0.25 * sizes.sum()

def test_checkpointed_dedup_resume(ray_session, sf_small, tmp_path):
    """Partitioned survivor output + manifest; a rerun skips every
    finished bucket; a damaged bucket is rebuilt alone; the union of
    survivor files equals dedup_exact."""
    import os

    import pyarrow.parquet as pq

    out = str(tmp_path / "dedup_ckpt")
    man = T.checkpointed_dedup_exact(docs_ds(sf_small), out)
    assert man["resumed_buckets"] == 0 and man["built_buckets"] > 0
    want = set(T.dedup_exact(docs_ds(sf_small)).to_pandas()["doc_id"])
    got = set(pq.read_table(out, ignore_prefixes=["manifest", "."]).column("doc_id").to_pylist())
    assert got == want
    # full resume: nothing rebuilt
    man2 = T.checkpointed_dedup_exact(docs_ds(sf_small), out)
    assert man2["built_buckets"] == 0
    assert man2["resumed_buckets"] == man["built_buckets"]
    assert man2["total_survivors"] == man["total_survivors"]
    # damage one bucket -> only it rebuilds
    import json
    victim = next(iter(man2["buckets"]))
    os.remove(os.path.join(out, man2["buckets"][victim]["file"]))
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    del m["buckets"][victim]
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(m, f)
    man3 = T.checkpointed_dedup_exact(docs_ds(sf_small), out)
    assert man3["built_buckets"] == 1
    got3 = set(pq.read_table(out, ignore_prefixes=["manifest", "."]).column("doc_id").to_pylist())
    assert got3 == want

def test_neardup_simhash_exact_vs_brute(ray_session):
    """Pigeonhole banding is exhaustive at the signature level: the op's
    pair set equals brute-force all-pairs hamming on the same simhash
    signatures, including the hamming values."""
    import ray.data as rd

    rng = np.random.default_rng(9)
    vocab = [f"tok{i}" for i in range(60)]
    n = 250
    texts = [" ".join(rng.choice(vocab, 25)) for _ in range(n)]
    # planted near-dups: single-token edits of shared bases
    for i in range(0, 40, 4):
        base = texts[i].split()
        base[3] = "edited"
        texts[i + 1] = " ".join(base)
    t = pa.table({"doc_id": np.arange(n, dtype=np.int64), "text": texts})

    got = T.neardup_simhash(rd.from_arrow(t), max_hamming=6).to_pandas()
    sig = T.simhash(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    h = sig["simhash"].to_numpy().astype(np.uint64)
    x = h[:, None] ^ h[None, :]
    ham = np.unpackbits(x.view(np.uint8)).reshape(n, n, 64).sum(axis=2)
    ii, jj = np.nonzero((ham <= 6) & (np.arange(n)[:, None] < np.arange(n)[None, :]))
    want = {(int(a), int(b)): int(ham[a, b]) for a, b in zip(ii, jj)}
    got_map = {(int(r.a), int(r.b)): int(r.hamming) for r in got.itertuples()}
    assert got_map == want
    assert len(want) > 0, "planted near-dups must collide"


def test_quality_score_exact_vs_sql_and_discriminating(ray_session, con, sf_small):
    # model-inference stage: dyadic weights over integer features =>
    # bit-exact scores in any summation order; SQL oracle hash parity
    got = T.quality_score(docs_ds(sf_small)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = con.sql(r"""
        WITH f AS (SELECT doc_id,
          len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))::BIGINT AS n_tokens,
          (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT AS n_digits,
          length(regexp_replace(text, '[^a-z]', '', 'g'))::BIGINT AS n_alpha,
          length(text)::BIGINT AS n_chars FROM documents)
        SELECT doc_id,
          -52.0 + 0.5*n_tokens + 0.125*n_alpha - 0.25*n_digits - 0.015625*n_chars AS q_score,
          (-52.0 + 0.5*n_tokens + 0.125*n_alpha - 0.25*n_digits - 0.015625*n_chars) > 0.0 AS keep
        FROM f ORDER BY doc_id
    """).df().reset_index(drop=True)
    np.testing.assert_array_equal(got["q_score"].to_numpy(), want["q_score"].to_numpy())
    np.testing.assert_array_equal(got["keep"].to_numpy(), want["keep"].to_numpy())
    frac = got["keep"].mean()
    assert 0.1 < frac < 0.9, "keep must be a discriminating split"


def test_scrub_text_pii_and_sequential_semantics(ray_session):
    """scrub_text: default PII rules redact emails/IPs/phones; counts
    are per-rule on the text AS OF that step (sequential, matching the
    generated SQL oracle chain), verified against DuckDB."""
    import duckdb
    import ray.data as rd

    rows = {
        "doc_id": [1, 2, 3, 4],
        "text": [
            "mail me at a.user+x@example.org or b@c.io now",
            "server 10.0.0.1 and 192.168.1.255 are up, call +1 555-123-4567",
            "clean text with no pii at all",
            "edge: not-an-email @ nope, 999.999.999.999 still matches shape",
        ],
    }
    out = (T.scrub_text(rd.from_items(
        [dict(zip(rows, t)) for t in zip(*rows.values())]))
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["n_email"]) == [2, 0, 0, 0]
    assert list(out["n_ipv4"]) == [0, 2, 0, 1]
    assert list(out["n_phone"]) == [0, 1, 0, 0]
    assert out.loc[0, "text_clean"] == "mail me at <EMAIL> or <EMAIL> now"
    assert "<IP>" in out.loc[1, "text_clean"] and "<PHONE>" in out.loc[1, "text_clean"]
    assert int(out["n_redacted"].sum()) == 6

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows))
    ora = (con.sql(T.scrub_oracle_sql()).df()
           .sort_values("doc_id").reset_index(drop=True))
    for c in ["n_email", "n_ipv4", "n_phone", "text_clean", "n_redacted"]:
        assert list(out[c]) == list(ora[c]), c


@pytest.mark.parametrize("tau", [0.5, 0.8])
def test_jaccard_positional_filter_exact_vs_naive(ray_session, tau):
    """The combined suffix+positional candidate bound must keep the
    prefix path's pair set IDENTICAL to the naive full-index algebra
    for any corpus — including near-duplicate docs whose first common
    shingle sits early (positional bound loose) and docs overlapping
    only in their hash suffixes (suffix bound loose)."""
    import ray.data as rd

    rng = np.random.default_rng(int(tau * 100))
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(70):
        n = rng.integers(5, 40)
        texts.append(" ".join(rng.choice(vocab, size=n)))
    # planted near-dups: small edits of earlier docs
    for i in range(20):
        base = texts[i].split()
        j = rng.integers(0, len(base))
        base[j] = "edited"
        texts.append(" ".join(base))
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    naive = T.jaccard_pairs_exact(ds, tau=tau, prefix_filter=False).to_pandas()
    pref = T.jaccard_pairs_exact(ds, tau=tau, prefix_filter=True).to_pandas()
    ns = set(zip(naive["a"], naive["b"]))
    ps = set(zip(pref["a"], pref["b"]))
    assert ns == ps
    assert len(ns) > 0  # the fixture must actually produce pairs


def test_sql_hash_matches_generated_duckdb_sql():
    """textops._sql_hash (FNV-1a over code points + splitmix64) must
    match the GENERATED DuckDB SQL bit for bit — including multi-byte
    and astral code points (bulk utf-32 fallback) and 40-char tokens."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from geograft.textops import _sql_hash, token_hash_sql_ctes

    toks = ["a", "hello", "h\xe9llo", "\U0001d11eclef", "xyzzy123", "\xe9",
            "日本語", "mixed\xe9日\U0001d11e", "z" * 40, "0"]
    eng = _sql_hash(pa.array(toks))
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"tok": toks}))
    got = dict(con.sql(
        f"WITH {token_hash_sql_ctes('t', 'tok,')} SELECT tok, h FROM th"
    ).fetchall())
    assert all(int(got[t]) == int(e) for t, e in zip(toks, eng))


def test_tokens_sql_matches_flat_tokens_on_unicode_whitespace():
    """tokens_sql's RE2 class [\\p{Z}\\x09-\\x0d\\x85] must split exactly
    like pc.utf8_split_whitespace (Unicode White_Space), including
    \\x0b, \\xa0 and U+3000 — the cases an ASCII \\s would miss."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from geograft.textops import _flat_tokens, tokens_sql

    texts = ["hello  world", " lead trail ", "a\x0bb", "a\xa0b", "x y",
             "", "   ", "one", "t　u", "p qr"]
    con = duckdb.connect()
    con.register("d", pd.DataFrame({"doc_id": range(len(texts)),
                                    "text": texts}))
    sql_toks = [r[1] for r in con.sql(
        f"SELECT doc_id, {tokens_sql('text')} FROM d ORDER BY doc_id"
    ).fetchall()]
    lens, flat = _flat_tokens(pa.array(texts))
    flat = flat.to_pylist()
    pos = np.cumsum(lens) - lens
    eng_toks = [flat[pos[i]: pos[i] + lens[i]] for i in range(len(texts))]
    assert sql_toks == eng_toks


def test_lang_id_oracle_matches_engine_on_tricky_texts(ray_session):
    """Generated lang_id SQL == engine on apostrophes, case, ties
    (first-language argmax), zero-token and empty docs."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from geograft.textops import lang_id, lang_id_oracle_sql

    texts = ["The THE the and of", "der und ist", "le la de de",
             "el la de y", "de de de",          # fr/es tie -> fr (order)
             "don't won't can't", "", "12345 !!!", "und the",  # en/de tie -> en
             "LE ET EST pour dans"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    eng = lang_id(rd.from_pandas(df), concurrency=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    got = con.sql(lang_id_oracle_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(eng["lang_pred"]) == list(got["lang_pred"])


def test_semijoin_gate_streams_losing_branch(ray_session, monkeypatch):
    """verify_jaccard_pairs must DECIDE the semi-join gate with at most
    ONE execution of the pair pipeline: a lazy input is materialized
    once and metadata-counted (a limit-probe would re-run the upstream
    shuffle for whichever branch wins — measured +85 s at 2 M docs), an
    already-materialized input is counted for free. The tracer pins
    single consumption on the losing branch, with output identical to
    the semi-join path's."""
    import ray
    import ray.data as rd

    # 24 docs, known 3-gram jaccard structure: 3 exact-dup groups
    texts = []
    for i in range(24):
        g = i % 3
        texts.append(f"the quick brown fox group {g} jumps over the lazy dog")
    doc_t = pa.table({"doc_id": np.arange(24, dtype=np.int64),
                      "text": texts})
    docs = rd.from_arrow(doc_t)

    # all 276 unordered pairs, 20 lazy blocks, with a row-counting
    # tracer stage so we can observe how often the stream is consumed
    a, b = np.triu_indices(24, k=1)
    pair_t = pa.table({"a": a.astype(np.int64), "b": b.astype(np.int64)})
    n_pairs = pair_t.num_rows

    @ray.remote
    class Cnt:
        def __init__(self):
            self.n = 0

        def add(self, k):
            self.n += k

        def get(self):
            return self.n

    cnt = Cnt.remote()

    def tracer(t: pa.Table) -> pa.Table:
        ray.get(cnt.add.remote(len(t)))
        return t

    blocks = [pair_t.slice(i, 14) for i in range(0, n_pairs, 14)]
    lazy_pairs = rd.from_arrow(blocks).map_batches(
        tracer, batch_format="pyarrow", batch_size=None)

    monkeypatch.setattr(T, "SEMIJOIN_MAX_PAIRS", 10)  # force losing branch
    out = T.verify_jaccard_pairs(lazy_pairs, docs, tau=0.9).to_pandas()

    # correctness: exactly the same-group pairs (exact dups, jaccard 1)
    want = {(x, y) for x, y in zip(a, b) if x % 3 == y % 3}
    got = set(zip(out["a"], out["b"]))
    assert got == want
    np.testing.assert_allclose(out["jaccard"].to_numpy(), 1.0)

    # streaming evidence: one full consumption + an early-exited probe,
    # far below the 2x of materialize-for-the-gate
    seen = ray.get(cnt.get.remote())
    assert seen >= n_pairs
    assert seen < 2 * n_pairs, (
        f"losing branch consumed the pair stream twice in full: {seen}")

    # winning branch on an already-materialized stream: gate answers
    # from block metadata, semi-join result identical
    monkeypatch.setattr(T, "SEMIJOIN_MAX_PAIRS", 2_000_000)
    out2 = T.verify_jaccard_pairs(
        rd.from_arrow(blocks).materialize(), docs, tau=0.9).to_pandas()
    assert set(zip(out2["a"], out2["b"])) == want


def test_neardup_minhash_oracle_sql_exact(ray_session):
    """The generated DuckDB oracle reproduces neardup_minhash EXACTLY —
    candidate generation (SQL-recomputable token hash + wrap-64 perm
    family + band fold) and verification (distinct-shingle jaccard,
    empty-vs-empty = 1.0) — on a fixture with unicode tokens, odd
    whitespace, short (<k) docs, exact dups, and shingle-less docs."""
    import duckdb
    import ray.data as rd

    rng = np.random.default_rng(9)
    vocab = [f"tok{i}" for i in range(25)] + ["café", "日本語"]
    texts = []
    for i in range(60):
        base = list(rng.choice(vocab, rng.integers(1, 15)))
        texts.append(" ".join(base))
        if i % 4 == 0:
            mod = base.copy()
            if len(mod) > 2:
                mod[1] = "ZZ"
            texts.append(" ".join(mod))
    texts += ["", " \t ", "a b", "a b", "q"]
    t = pa.table({"doc_id": np.arange(len(texts), dtype=np.int64),
                  "text": texts})
    for tau in (0.3, 0.8):
        eng = (T.neardup_minhash(rd.from_arrow(t), tau=tau).to_pandas()
               .sort_values(["a", "b"]).reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", t)
        ora = (con.sql(T.neardup_minhash_oracle_sql(tau)).df()
               .sort_values(["a", "b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            eng[["a", "b", "jaccard"]].astype({"a": "int64", "b": "int64"}),
            ora.astype({"a": "int64", "b": "int64"}), check_exact=True)
        # the empty-token docs pair at jaccard 1.0 (union-0 contract)
        if tau <= 0.9:
            empties = {(len(texts) - 5, len(texts) - 4),
                       (len(texts) - 3, len(texts) - 2)}
            assert empties <= set(zip(eng["a"], eng["b"]))


def test_dup_spans_vs_sql(ray_session, con, sf_small):
    got = (T.dup_spans(docs_ds(sf_small), k=8, df_cap=64).to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    want = (con.sql(T.dup_spans_oracle_sql(k=8, df_cap=64)).df()
            .sort_values(["a", "b"]).reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_dup_spans_edge_cases(ray_session):
    """Short docs (<k tokens) fold to one whole-sequence span; df_cap
    drops a boilerplate span's pair flood; empty docs contribute
    nothing."""
    import ray.data as rd

    texts = (["a b c"] * 3                # 3-token docs, k=8: whole-doc span
             + ["one two three four five six seven eight nine"] * 2
             + ["boiler plate span here shared by many many docs x%d" % i
                for i in range(4)]        # distinct docs, no shared 8-gram
             + [""])
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": texts})
    out = T.dup_spans(rd.from_arrow(tbl), k=8, df_cap=64).to_pandas()
    pairs = set(zip(out.a, out.b))
    # the 3 identical short docs pair up via the whole-sequence rule
    assert {(0, 1), (0, 2), (1, 2)} <= pairs
    # the two 9-token duplicates share 2 distinct 8-gram spans
    row = out[(out.a == 3) & (out.b == 4)]
    assert len(row) == 1 and int(row.n_shared.iloc[0]) == 2
    # df_cap=2 kills the short-doc triple (df=3 > 2) but keeps the pair
    capped = T.dup_spans(rd.from_arrow(tbl), k=8, df_cap=2).to_pandas()
    cp = set(zip(capped.a, capped.b))
    assert (0, 1) not in cp and (3, 4) in cp


def test_repetition_stats_vs_sql(ray_session, con, sf_small):
    got = (T.repetition_stats(docs_ds(sf_small)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = (con.sql(T.repetition_stats_oracle_sql()).df()
            .sort_values("doc_id").reset_index(drop=True))
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(),
                                      err_msg=c)


def test_repetition_stats_known_values(ray_session):
    import ray.data as rd

    tbl = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                    "text": ["spam spam spam spam",  # top 2-gram covers all
                             "a b c d",              # all distinct
                             ""]})
    out = (T.repetition_stats(rd.from_arrow(tbl)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.n_tokens.tolist() == [4, 4, 0]
    assert out.n_2g.tolist() == [3, 3, 0]
    assert out.n_2g_distinct.tolist() == [1, 3, 0]
    assert out.top_2g_count.tolist() == [3, 1, 0]
    assert out.top_2g_frac.tolist() == [1.5, 0.5, 0.0]
    assert out.n_3g_distinct.tolist() == [1, 2, 0]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(st.lists(st.lists(st.sampled_from("abcde"), min_size=0, max_size=12),
                min_size=2, max_size=12),
       st.sampled_from([None, 2]))
def test_dup_spans_matches_brute_force(ray_session, token_docs, df_cap):
    """dup_spans == per-doc k-gram set intersection counts with the
    df_cap drop and the short-doc whole-sequence rule (brute force)."""
    import ray.data as rd

    k = 3
    texts = [" ".join(toks) for toks in token_docs]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": texts})
    out = T.dup_spans(rd.from_arrow(tbl), k=k, df_cap=df_cap).to_pandas()
    got = {(int(r.a), int(r.b)): int(r.n_shared) for r in out.itertuples()}

    spans = []
    for toks in token_docs:
        if len(toks) >= k:
            spans.append({tuple(toks[i:i + k])
                          for i in range(len(toks) - k + 1)})
        elif toks:
            spans.append({tuple(toks)})
        else:
            spans.append(set())
    df = {}
    for s in spans:
        for sp in s:
            df[sp] = df.get(sp, 0) + 1
    want = {}
    for a in range(len(spans)):
        for b in range(a + 1, len(spans)):
            shared = {sp for sp in spans[a] & spans[b]
                      if df_cap is None or df[sp] <= df_cap}
            if shared:
                want[(a, b)] = len(shared)
    assert got == want


def test_dup_spans_and_repetition_stats_null_and_unicode_ws(ray_session):
    """NULL text and non-ASCII whitespace (\xa0, \x0b) must agree
    between the engine (_flat_tokens / utf8_split_whitespace) and the
    generated oracles (tokens_sql) — the RE2 '\\s' class would NOT
    split on these (review finding, round 5)."""
    import duckdb
    import ray.data as rd

    texts = ["a b\xa0c d e", "z a b\x0bc d q", None, "", "p q r"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    con2 = duckdb.connect()
    con2.register("documents_tbl", tbl.to_pandas())
    con2.sql("CREATE VIEW documents AS SELECT * FROM documents_tbl")

    got = (T.repetition_stats(rd.from_arrow(tbl)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = (con2.sql(T.repetition_stats_oracle_sql()).df()
            .sort_values("doc_id").reset_index(drop=True))
    for c in sorted(got.columns):
        np.testing.assert_array_equal(got[c].to_numpy(),
                                      want[c].to_numpy(), err_msg=c)
    assert got.n_tokens.tolist() == [5, 6, 0, 0, 3]

    g2 = T.dup_spans(rd.from_arrow(tbl), k=3, df_cap=None).to_pandas()
    w2 = con2.sql(T.dup_spans_oracle_sql(k=3, df_cap=None)).df()
    assert len(g2) == 1  # docs 0/1 share 'b c d' across \xa0 and \x0b
    assert (set(zip(g2.a, g2.b, g2.n_shared))
            == set(zip(w2.a, w2.b, w2.n_shared)))


def test_sample_stratified_vs_sql_and_determinism(ray_session, con, sf_small):
    """Deterministic stratified sampler: kept-row SET is bit-identical
    to the generated HUGEINT SQL; rate-0 strata vanish, rate-1 strata
    survive whole; re-running keeps EXACTLY the same rows (the
    resume/retry contract)."""
    rates = {"src0": 0.0, "src1": 1.0, "src2": 0.25}

    def run():
        return T.sample_stratified(
            read_parquet_sized(f"{sf_small}/documents.parquet"),
            rates, default_rate=0.6,
        ).to_pandas()

    got = run()
    want = con.sql(T.sample_stratified_oracle_sql(rates, default_rate=0.6)).df()
    assert set(got.doc_id) == set(want.doc_id) and len(got) > 0
    by = got.groupby("source").size()
    assert "src0" not in by.index
    assert by["src1"] == 25  # every src1 doc kept at rate 1.0
    again = run()
    assert set(again.doc_id) == set(got.doc_id)


def test_sample_stratified_null_stratum_and_bad_rates(ray_session):
    """NULL stratum takes default_rate on BOTH sides (engine fill-null
    sentinel == SQL CASE ELSE), and out-of-range rates fail loudly in
    both generators instead of silently diverging (uint64 wrap vs
    negative SQL literal)."""
    import duckdb
    import ray.data as rd

    tbl = pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "source": pa.array(["a", "a", None, None, "b", "b"]),
        "text": ["t"] * 6,
    })
    rates = {"a": 0.0, "b": 1.0}
    got = T.sample_stratified(rd.from_arrow(tbl), rates,
                              default_rate=1.0).to_pandas()
    con2 = duckdb.connect()
    con2.register("documents_tbl", tbl.to_pandas())
    con2.sql("CREATE VIEW documents AS SELECT * FROM documents_tbl")
    want = con2.sql(T.sample_stratified_oracle_sql(
        rates, default_rate=1.0)).df()
    assert set(got.doc_id) == set(want.doc_id) == {2, 3, 4, 5}
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        T.sample_stratified(rd.from_arrow(tbl), {"a": -0.1})
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        T.sample_stratified_oracle_sql({"a": 1.5})


def test_sample_stratified_realized_fraction(ray_session):
    """Over many keys the realized keep-fraction must track the rate
    (splitmix64 is a good mixer; deterministic given fixed keys), and
    disjoint seeds give different — equally sized — samples."""
    import ray.data as rd

    n = 20000
    tbl = pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                    "source": pa.array(["s"] * n)})
    kept = T.sample_stratified(rd.from_arrow(tbl), {"s": 0.3}).to_pandas()
    frac = len(kept) / n
    assert abs(frac - 0.3) < 0.02, frac
    other = T.sample_stratified(rd.from_arrow(tbl), {"s": 0.3},
                                seed=12345).to_pandas()
    assert abs(len(other) / n - 0.3) < 0.02
    # different seeds pick materially different rows
    overlap = len(set(kept.doc_id) & set(other.doc_id)) / len(kept)
    assert overlap < 0.5, overlap
