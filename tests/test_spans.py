"""Interleaved-doc synthesis + span extraction.

The per-row invariant (BASELINE.json input_hint): the span sequence
(kind, text, media_ref, order) survives every stage byte-identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from geograft import ops, synth


def test_make_random_docs_deterministic():
    a = synth.make_random_docs(50, seed=7)
    b = synth.make_random_docs(50, seed=7)
    assert a.equals(b)
    c = synth.make_random_docs(50, seed=8)
    assert not a.equals(c)


def test_explode_preserves_span_sequence():
    docs = synth.make_random_docs(200, seed=42)
    fp = synth.span_fingerprints(docs)
    exploded = ops.explode_spans(docs)
    # reassemble per doc from exploded rows, ordered by span_idx
    df = exploded.to_pandas().sort_values(["doc_id", "span_idx"])
    rebuilt = {}
    for doc_id, g in df.groupby("doc_id"):
        rebuilt[doc_id] = hash(
            tuple((r.kind, r.text, r.media_ref, i) for i, r in enumerate(g.itertuples()))
        )
    assert rebuilt == fp


def test_explode_offsets_and_counts():
    docs = synth.make_random_docs(100, seed=1)
    exploded = ops.explode_spans(docs)
    lens = [len(s) for s in docs.column("spans").to_pylist()]
    assert exploded.num_rows == sum(lens)
    # span_idx runs 0..len-1 per doc
    df = exploded.to_pandas()
    for doc_id, g in df.groupby("doc_id"):
        np.testing.assert_array_equal(np.sort(g["span_idx"]), np.arange(len(g)))


def test_geo_parse_roundtrip_exact():
    docs = synth.make_random_docs(300, seed=42)
    geoms = ops.parse_geo_spans(ops.explode_spans(docs))
    # re-serialize each parsed geometry with repr and compare to the span text
    df = geoms.to_pandas()
    spans = ops.explode_spans(docs).to_pandas()
    spans = spans[spans["kind"] == "geo"].set_index(["doc_id", "span_idx"])
    assert len(df) == len(spans)
    for r in df.itertuples():
        text = spans.loc[(r.doc_id, r.span_idx)]["text"]
        if r.geom_kind == "point":
            assert text == f"POINT({r.x0!r} {r.y0!r})"
            assert (r.minx, r.miny, r.maxx, r.maxy) == (r.x0, r.y0, r.x0, r.y0)
        elif r.geom_kind == "rect":
            assert text == f"RECT({r.x0!r} {r.y0!r} {r.x1!r} {r.y1!r})"
        else:
            assert text == f"LINE({r.x0!r} {r.y0!r} {r.x1!r} {r.y1!r})"
            assert r.minx == min(r.x0, r.x1) and r.maxy == max(r.y0, r.y1)


def test_docs_from_events_roundtrip(sf_small):
    events = pq.read_table(f"{sf_small}/events.parquet")
    docs = synth.docs_from_events(events)
    assert docs.schema.equals(synth.DOC_SCHEMA)
    assert docs.num_rows == events.num_rows
    geoms = ops.parse_geo_spans(ops.explode_spans(docs))
    # parsed coordinates == original event columns bit-for-bit
    got = geoms.to_pandas().sort_values("doc_id")
    want_x = events.column("value").to_numpy()
    want_y = events.column("user_id").to_numpy().astype(np.float64)
    np.testing.assert_array_equal(got["x0"].to_numpy(), want_x)
    np.testing.assert_array_equal(got["y0"].to_numpy(), want_y)
    # every doc contributes exactly one geo span, at span_idx 1
    assert (got["span_idx"] == 1).all()


def test_extract_geometries_dataset(ray_session, sf_small):
    import ray.data as rd

    events = pq.read_table(f"{sf_small}/events.parquet")
    docs = synth.docs_from_events(events)
    ds = rd.from_arrow(docs)
    out = ops.extract_geometries(ds)
    assert out.count() == events.num_rows
    s = out.schema()
    assert set(ops.ENV_COLS) <= set(s.names)


def test_parse_geo_spans_drops_malformed_and_unknown_shapes():
    """Malformed arity ('POINT(1.0)') and unknown shape words ('POLY(...)'
    tagged kind='geo') must be dropped, not emit garbage coordinates or
    crash the kind lookup (round-1 advice regression)."""
    import pyarrow as pa

    from geograft import ops

    rows = pa.table({
        "doc_id": ["a", "b", "c", "d", "e"],
        "span_idx": pa.array([0, 0, 0, 0, 0], type=pa.int32()),
        "kind": ["geo"] * 5,
        "text": [
            "POINT(1.5 2.5)",          # valid
            "POINT(1.0)",              # arity mismatch -> drop
            "POLY(0 0 1 0 0 1)",       # unknown shape for geo parser -> drop
            "RECT(0 0 2 2)",           # valid
            "LINE(0 0 1)",             # arity mismatch -> drop
        ],
        "media_ref": [""] * 5,
        "offset": pa.array([0] * 5, type=pa.int64()),
    })
    out = ops.parse_geo_spans(rows)
    assert out.column("doc_id").to_pylist() == ["a", "d"]
    assert out.column("geom_kind").to_pylist() == ["point", "rect"]
    assert out.column("x0").to_pylist() == [1.5, 0.0]
    assert out.column("maxx").to_pylist() == [1.5, 2.0]
