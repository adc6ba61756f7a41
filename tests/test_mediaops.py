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


def test_decode_strict_mode_raises_only_for_compressed_video():
    # image/audio/Y4M-video decode is REAL (PPM/WAV/Y4M in numpy) —
    # strict mode only gates compressed video payloads, which genuinely
    # need a codec stack
    stage = M.DecodeAndFeaturize(stub_mode="strict")
    media = M.synthesize_media([f"m://x/{i}" for i in range(20)])
    kinds = set(media.column("kind").to_pylist())
    assert kinds == {"image", "audio", "video"}
    out = stage(media)  # every synthesized payload decodes for real
    assert len(out) == len(media)
    fake_h264 = pa.table(
        {"media_ref": ["m://z/0"], "kind": ["video"],
         "payload": [b"\x00\x00\x00\x01\x67compressed-bitstream"],
         "meta": ["{}"]}, schema=M.MEDIA_SCHEMA)
    with pytest.raises(NotImplementedError, match="video decode"):
        stage(fake_h264)
    # fake mode keeps the pipeline runnable on the same payload
    assert len(M.DecodeAndFeaturize(stub_mode="fake")(fake_h264)) == 1


def test_y4m_round_trip():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (5, 10, 12)).astype(np.uint8)
    got, fps = M.decode_y4m(M.encode_y4m(frames, fps=(30, 1)))
    assert fps == (30, 1)
    np.testing.assert_array_equal(got, frames)
    # C420 payload: luma plane comes back, chroma walked over correctly
    w, h = 6, 4
    luma = rng.integers(0, 256, (3, h, w)).astype(np.uint8)
    chroma = bytes((w // 2) * (h // 2) * 2)
    pl = b"YUV4MPEG2 W6 H4 F25:1 Ip A1:1 C420jpeg\n" + b"".join(
        b"FRAME\n" + luma[i].tobytes() + chroma for i in range(3))
    got2, _ = M.decode_y4m(pl)
    np.testing.assert_array_equal(got2, luma)
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        M.decode_y4m(b"nope")
    with pytest.raises(ValueError, match="colorspace"):
        M.decode_y4m(b"YUV4MPEG2 W2 H2 C444\nFRAME\n" + bytes(12))


def test_video_feature_frame_sampling():
    # constant-luma frames -> constant feature; 16 dims = 4 frames x 2x2
    frames = np.full((8, 6, 6), 51, dtype=np.uint8)
    f = M.video_feature(frames)
    assert f.shape == (16,)
    np.testing.assert_allclose(f, 51.0 / 255.0, rtol=1e-6)
    # sampling picks evenly spaced frames: frame i has luma i*30
    ramp = (np.arange(8, dtype=np.uint8) * 30)[:, None, None] * np.ones(
        (1, 4, 4), dtype=np.uint8)
    fr = M.video_feature(ramp.astype(np.uint8))
    np.testing.assert_allclose(
        fr.reshape(4, 4), np.repeat([[0, 60, 120, 180]], 4, axis=0).T / 255.0,
        rtol=1e-6)


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
