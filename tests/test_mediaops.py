"""Multimodal plumbing: schemas, actor stage, stub modes, doc hand-off."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from geograft import mediaops as M
from geograft import synth


def test_synthesize_media_deterministic():
    refs = [f"m://d{i:08d}/2" for i in range(50)]
    a = M.synthesize_media(refs)
    b = M.synthesize_media(refs)
    assert a.schema.equals(M.MEDIA_SCHEMA)
    assert a.equals(b)


def test_decode_features_fake_mode(ray_session):
    import ray.data as rd

    refs = [f"m://d{i:08d}/2" for i in range(300)]
    media = M.synthesize_media(refs)
    out = M.decode_features(rd.from_arrow(media), concurrency=2, batch_size=64).to_pandas()
    assert len(out) == 300
    assert set(out.columns) == {"media_ref", "kind", "feature"}
    feats = np.stack(out["feature"].to_numpy())
    assert feats.shape == (300, M.DecodeAndFeaturize.FEAT_DIM)
    assert feats.min() >= 0.0 and feats.max() <= 1.0
    # deterministic: payload-derived
    out2 = M.decode_features(rd.from_arrow(media), concurrency=2, batch_size=64).to_pandas()
    f2 = np.stack(out2.sort_values("media_ref")["feature"].to_numpy())
    f1 = np.stack(out.sort_values("media_ref")["feature"].to_numpy())
    np.testing.assert_array_equal(f1, f2)


def test_decode_strict_mode_raises_only_for_video():
    # image/audio decode is REAL (PPM/WAV in numpy) — strict mode only
    # gates the video stub, which genuinely needs a codec stack
    import pyarrow.compute as pc

    stage = M.DecodeAndFeaturize(stub_mode="strict")
    media = M.synthesize_media([f"m://x/{i}" for i in range(20)])
    kinds = set(media.column("kind").to_pylist())
    assert kinds == {"image", "audio", "video"}
    img_audio = media.filter(pc.field("kind") != "video")
    out = stage(img_audio)
    assert len(out) == len(img_audio)
    with pytest.raises(NotImplementedError, match="video decode"):
        stage(media.filter(pc.field("kind") == "video"))


def test_synthesize_media_batching_invariant():
    # ref-keyed synthesis: the same ref produces the same row no matter
    # how the ref list is split across blocks
    refs = [f"m://d{i:08d}/2" for i in range(40)]
    whole = M.synthesize_media(refs)
    parts = pa.concat_tables([M.synthesize_media(refs[:13]),
                              M.synthesize_media(refs[13:])])
    assert whole.equals(parts)


def test_ppm_round_trip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (11, 7, 3)).astype(np.uint8)
    np.testing.assert_array_equal(M.decode_ppm(M.encode_ppm(img)), img)
    # comment + extra whitespace in header is legal PPM
    hdr = b"P6\n# a comment\n 7  11\n255\n" + img.tobytes()
    np.testing.assert_array_equal(M.decode_ppm(hdr), img)
    with pytest.raises(ValueError, match="P6"):
        M.decode_ppm(b"P3\n1 1\n255\n000")


def test_wav_round_trip():
    rng = np.random.default_rng(1)
    s = rng.integers(-30000, 30000, 333).astype(np.int16)
    got, sr = M.decode_wav(M.encode_wav(s, sample_rate=8000))
    assert sr == 8000
    np.testing.assert_array_equal(got, s)
    with pytest.raises(ValueError, match="RIFF"):
        M.decode_wav(b"nope")


def test_image_feature_block_means():
    # constant-color image -> constant feature equal to the gray level
    img = np.full((16, 16, 3), 128, dtype=np.uint8)
    f = M.image_feature(img)
    np.testing.assert_allclose(f, 128.0 / 255.0, rtol=1e-6)
    # quadrant image at grid=2: each block mean is exact
    img2 = np.zeros((4, 4, 3), dtype=np.uint8)
    img2[:2, 2:] = 255
    f2 = M.image_feature(img2, grid=2)
    np.testing.assert_allclose(f2, [0.0, 1.0, 0.0, 0.0], atol=1e-7)


def test_audio_feature_rms_bins():
    # silence -> zeros; full-scale square wave -> ~1.0 in every bin
    assert (M.audio_feature(np.zeros(100, dtype=np.int16)) == 0).all()
    sq = np.full(160, 32767, dtype=np.int16)
    f = M.audio_feature(sq)
    np.testing.assert_allclose(f, 32767.0 / 32768.0, rtol=1e-5)


def test_media_from_doc_spans(ray_session, sf_small):
    import pyarrow.parquet as pq
    import ray.data as rd

    events = pq.read_table(f"{sf_small}/events.parquet")
    docs = synth.docs_from_events(events)
    out = M.media_from_doc_spans(rd.from_arrow(docs)).to_pandas()
    # every synthesized doc has exactly one media span at index 2
    assert len(out) == events.num_rows
    assert (out["span_idx"] == 2).all()
    assert out["media_ref"].str.startswith("m://").all()
