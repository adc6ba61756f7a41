"""Deterministic synthesis of the interleaved text+media document table.

BASELINE.json input_hint: the engine's primary input is a table
``(doc_id:string, spans:list<struct<kind:string, text:string,
media_ref:string, offset:int32>>)`` of interleaved text + media + geo
spans. The per-row invariant every pipeline stage must preserve is
byte-identical span-sequence equality ``(kind, text, media_ref,
order)`` (FIXTURES.md §1).

Two generators, both fully deterministic:

* :func:`make_random_docs` — seeded random docs (1–8 spans, kinds
  text/media/geo, geo text ``POINT(x y)`` / ``RECT(...)`` / ``LINE(...)``
  with exact round-trip f64 repr) — mirrors the reference's seeded
  test generators (rstar/src/test_utilities.rs:6-50).
* :func:`docs_from_events` — derives one doc per row of the driver's
  ``events`` table, embedding a geo POINT span at
  ``(value, user_id)``. Because the coordinates come straight from
  table columns, the full pipeline (synthesize → explode → parse →
  query) has an ANSI-SQL oracle over the original table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa river "
    "mountain basin plateau delta-fan moraine terrace scarp ridge valley"
).split()


def _geo_text(rng: np.random.Generator) -> str:
    shape = rng.integers(0, 3)
    if shape == 0:
        return f"POINT({rng.uniform()!r} {rng.uniform()!r})"
    if shape == 1:
        x0, y0 = rng.uniform(), rng.uniform()
        return f"RECT({x0!r} {y0!r} {x0 + rng.uniform(0, 0.2)!r} {y0 + rng.uniform(0, 0.2)!r})"
    return f"LINE({rng.uniform()!r} {rng.uniform()!r} {rng.uniform()!r} {rng.uniform()!r})"


def make_random_docs(n: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    doc_ids, spans = [], []
    for i in range(n):
        doc_id = f"d{i:08d}"
        k = int(rng.integers(1, 9))
        row, offset = [], 0
        for j in range(k):
            kind = ("text", "media", "geo")[rng.integers(0, 3)]
            if kind == "text":
                text = " ".join(rng.choice(_WORDS, rng.integers(1, 6)))
                media = ""
            elif kind == "media":
                text = ""
                media = f"m://{doc_id}/{j}"
            else:
                text = _geo_text(rng)
                media = ""
            row.append({"kind": kind, "text": text, "media_ref": media, "offset": offset})
            offset += len(text) + 1
        doc_ids.append(doc_id)
        spans.append(row)
    return pa.table(
        {"doc_id": doc_ids, "spans": pa.array(spans, type=pa.list_(SPAN_TYPE))},
        schema=DOC_SCHEMA,
    )


def _fmt_f64(arr) -> pa.Array:
    """float64 -> shortest round-trip decimal string (Arrow cast).

    Arrow's float formatter, like Python's repr, emits the shortest
    string that parses back to the identical double — so the
    synthesize -> parse round trip is bit-exact even though integral
    values print as '13' rather than '13.0'."""
    a = arr if isinstance(arr, (pa.Array, pa.ChunkedArray)) else pa.array(arr)
    return pc.cast(a, pa.string())


def _doc_ids(eid_arr) -> pa.Array:
    """event_id -> 'd' + zero-padded-10 id, all-Arrow."""
    s = pc.utf8_lpad(pc.cast(eid_arr, pa.string()), 10, padding="0")
    return pc.binary_join_element_wise("d", s, "")


def _interleave(cols: list[pa.Array]) -> pa.Array:
    """Row-interleave k same-length arrays into one array of length k*n
    (row i -> positions k*i .. k*i+k-1) with one concat + one take —
    no Python row loop."""
    k, n = len(cols), len(cols[0])
    idx = np.empty(k * n, dtype=np.int64)
    for j in range(k):
        idx[j::k] = j * n + np.arange(n)
    return pc.take(pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols]), pa.array(idx))


def docs_from_events(batch: pa.Table) -> pa.Table:
    """One interleaved doc per event row — all-Arrow columnar (no
    per-row Python; this stage fronts the flagship bench, so synthesis
    cost must be kernel cost).

    Span sequence per doc (order is the invariant):
      0: text  — ``{event_type} {props}``
      1: geo   — ``POINT({value} {user_id})`` (shortest round-trip repr)
      2: media — ``m://{doc_id}/2``

    The geo coordinates parse back bit-identically (see _fmt_f64), so
    the oracle SQL can simply read the original columns.
    """
    n = len(batch)
    doc_ids = _doc_ids(batch["event_id"])
    text0 = pc.binary_join_element_wise(batch["event_type"], batch["props"], " ")
    geo = pc.binary_join_element_wise(
        "POINT(", _fmt_f64(batch["value"]),
        " ", _fmt_f64(pc.cast(batch["user_id"], pa.float64())), ")", "")
    media = pc.binary_join_element_wise("m://", doc_ids, "/2", "")
    empty = pc.take(pa.array([""]), pa.array(np.zeros(n, dtype=np.int64)))

    kinds = pa.array(np.tile(["text", "geo", "media"], n))
    texts = _interleave([text0, geo, empty])
    medias = _interleave([empty, empty, media])
    o1 = pc.utf8_length(text0).to_numpy().astype(np.int64) + 1
    o2 = o1 + pc.utf8_length(geo).to_numpy() + 1
    offsets = np.zeros(3 * n, dtype=np.int32)
    offsets[1::3] = o1
    offsets[2::3] = o2
    flat = pa.StructArray.from_arrays(
        [kinds, texts, medias, pa.array(offsets)],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(pa.array(np.arange(0, 3 * n + 1, 3, dtype=np.int32)), flat)
    return pa.table({"doc_id": doc_ids, "spans": spans}, schema=DOC_SCHEMA)


def _single_geo_docs(doc_ids: pa.Array, geo: pa.Array) -> pa.Table:
    """doc table with exactly one geo span per doc."""
    n = len(doc_ids)
    flat = pa.StructArray.from_arrays(
        [pa.array(np.tile(["geo"], n)),
         geo.combine_chunks() if isinstance(geo, pa.ChunkedArray) else geo,
         pc.take(pa.array([""]), pa.array(np.zeros(n, dtype=np.int64))),
         pa.array(np.zeros(n, dtype=np.int32))],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(pa.array(np.arange(n + 1, dtype=np.int32)), flat)
    return pa.table({"doc_id": doc_ids, "spans": spans}, schema=DOC_SCHEMA)


def docs_from_events_lines(batch: pa.Table) -> pa.Table:
    """Interleaved docs whose geo span is a LINE segment derived from
    event columns: from (value, user_id) to (value + k/10, user_id + 1)
    where k comes from the props JSON — so the oracle SQL can recompute
    the endpoints exactly with json_extract. All-Arrow: k is pulled with
    a vectorized regex, not per-row json.loads."""
    val = batch["value"].to_numpy()
    uid = pc.cast(batch["user_id"], pa.float64()).to_numpy()
    ks = pc.cast(
        pc.struct_field(
            pc.extract_regex(batch["props"], r'"k":\s*(?P<k>-?\d+)'), "k"),
        pa.float64()).to_numpy()

    x2 = val + ks / 10.0
    y2 = uid + 1.0
    geo = pc.binary_join_element_wise(
        "LINE(", _fmt_f64(val), " ", _fmt_f64(uid), " ",
        _fmt_f64(x2), " ", _fmt_f64(y2), ")", "")
    return _single_geo_docs(_doc_ids(batch["event_id"]), geo)


def docs_from_events_polys(batch: pa.Table) -> pa.Table:
    """Interleaved docs whose geo span is a POLY triangle derived from
    event columns: vertices (v,u), (v+30,u), (v,u+5), all-Arrow."""
    val = batch["value"].to_numpy()
    uid = pc.cast(batch["user_id"], pa.float64()).to_numpy()
    geo = pc.binary_join_element_wise(
        "POLY(", _fmt_f64(val), " ", _fmt_f64(uid), " ",
        _fmt_f64(val + 30.0), " ", _fmt_f64(uid), " ",
        _fmt_f64(val), " ", _fmt_f64(uid + 5.0), ")", "")
    return _single_geo_docs(_doc_ids(batch["event_id"]), geo)


def span_fingerprints(docs: pa.Table) -> dict[str, int]:
    """hash of the exact (kind, text, media_ref, order) sequence per doc —
    the check every pipeline stage must leave unchanged."""
    out = {}
    for row in docs.select(["doc_id", "spans"]).to_pylist():
        seq = tuple(
            (s["kind"], s["text"], s["media_ref"], i) for i, s in enumerate(row["spans"])
        )
        out[row["doc_id"]] = hash(seq)
    return out
