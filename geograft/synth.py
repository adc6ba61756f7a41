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


def docs_from_events(batch: pa.Table) -> pa.Table:
    """One interleaved doc per event row (vectorized).

    Span sequence per doc (order is the invariant):
      0: text  — ``{event_type} {props}``
      1: geo   — ``POINT({value!r} {float(user_id)!r})``
      2: media — ``m://{doc_id}/2``

    ``repr`` of a Python float round-trips exactly, so parsing the geo
    span back recovers bit-identical coordinates — the oracle SQL can
    simply read the original columns.
    """
    eid = batch["event_id"].to_numpy()
    val = batch["value"].to_numpy()
    uid = batch["user_id"].to_numpy()
    etype = batch["event_type"].to_pylist()
    props = batch["props"].to_pylist()

    doc_ids = [f"d{e:010d}" for e in eid]
    text0 = [f"{t} {p}" for t, p in zip(etype, props)]
    geo = [f"POINT({float(v)!r} {float(u)!r})" for v, u in zip(val, uid)]

    n = len(doc_ids)
    kinds = pa.array(np.tile(["text", "geo", "media"], n))
    texts, medias, offsets = [], [], []
    for i in range(n):
        t0, g = text0[i], geo[i]
        texts += [t0, g, ""]
        medias += ["", "", f"m://{doc_ids[i]}/2"]
        o1 = len(t0) + 1
        offsets += [0, o1, o1 + len(g) + 1]
    flat = pa.StructArray.from_arrays(
        [kinds, pa.array(texts), pa.array(medias), pa.array(offsets, type=pa.int32())],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(pa.array(np.arange(0, 3 * n + 1, 3, dtype=np.int32)), flat)
    return pa.table({"doc_id": pa.array(doc_ids), "spans": spans}, schema=DOC_SCHEMA)


def docs_from_events_lines(batch: pa.Table) -> pa.Table:
    """Interleaved docs whose geo span is a LINE segment derived from
    event columns: from (value, user_id) to (value + k/10, user_id + 1)
    where k comes from the props JSON — so the oracle SQL can recompute
    the endpoints exactly with json_extract."""
    import json as _json

    eid = batch["event_id"].to_numpy()
    val = batch["value"].to_numpy()
    uid = batch["user_id"].to_numpy()
    props = batch["props"].to_pylist()
    ks = np.asarray([_json.loads(p)["k"] for p in props], dtype=np.float64)

    doc_ids = [f"d{e:010d}" for e in eid]
    x2 = val + ks / 10.0
    y2 = uid.astype(np.float64) + 1.0
    geo = [
        f"LINE({float(a)!r} {float(b)!r} {float(c)!r} {float(d)!r})"
        for a, b, c, d in zip(val, uid.astype(np.float64), x2, y2)
    ]
    n = len(doc_ids)
    kinds = pa.array(np.tile(["geo"], n))
    flat = pa.StructArray.from_arrays(
        [kinds, pa.array(geo), pa.array([""] * n),
         pa.array(np.zeros(n, dtype=np.int32))],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(pa.array(np.arange(n + 1, dtype=np.int32)), flat)
    return pa.table({"doc_id": pa.array(doc_ids), "spans": spans}, schema=DOC_SCHEMA)


def docs_from_events_polys(batch: pa.Table) -> pa.Table:
    """Interleaved docs whose geo span is a POLY triangle derived from
    event columns: vertices (v,u), (v+30,u), (v,u+5) with exact reprs."""
    eid = batch["event_id"].to_numpy()
    val = batch["value"].to_numpy()
    uid = batch["user_id"].to_numpy().astype(np.float64)

    doc_ids = [f"d{e:010d}" for e in eid]
    geo = [
        f"POLY({float(v)!r} {float(u)!r} {float(v + 30.0)!r} {float(u)!r} "
        f"{float(v)!r} {float(u + 5.0)!r})"
        for v, u in zip(val, uid)
    ]
    n = len(doc_ids)
    flat = pa.StructArray.from_arrays(
        [pa.array(np.tile(["geo"], n)), pa.array(geo), pa.array([""] * n),
         pa.array(np.zeros(n, dtype=np.int32))],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(pa.array(np.arange(n + 1, dtype=np.int32)), flat)
    return pa.table({"doc_id": pa.array(doc_ids), "spans": spans}, schema=DOC_SCHEMA)


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
