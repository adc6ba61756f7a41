"""Multimodal column plumbing: image/audio/video as opaque binary.

Media travels as binary payload columns with typed JSON metadata; the
decode/feature stage is an actor pool (setup once per actor, small
batches because rows are wide).

The decode step is REAL for three container-friendly formats — no
codec library needed, pure numpy over the payload bytes:
  * image: PPM (P6, 8-bit RGB) — header parse + pixel reshape, then
    grayscale + block-mean downsample to a 4x4 patch (16 dims);
  * audio: WAV (RIFF, 16-bit PCM) — chunk walk + int16 view, then RMS
    energy over 16 equal time bins;
  * video: Y4M (YUV4MPEG2, uncompressed; Cmono/C420) — header parse +
    per-frame plane walk, then frame-sample 4 frames x 2x2 luma block
    means (16 dims) — the decode / frame-sample / featurize shape.
COMPRESSED video (h264/vp9/...) genuinely requires a codec stack
(ffmpeg) that is not in this container; non-Y4M video payloads stay a
clearly-marked stub (strict mode raises, fake mode emits a
deterministic byte-hash feature so pipelines remain runnable).

Schema convention for a media table:
  media_ref:string, kind:string(image|audio|video), payload:binary,
  meta:string(JSON: width/height/sample_rate/...)
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("meta", pa.string()),
    ]
)


# ---------------------------------------------------------------------------
# codecs: PPM (P6) and WAV (16-bit PCM) in pure numpy
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """8-bit RGB (h, w, 3) -> binary PPM (P6)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("PPM P6 is RGB")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> uint8 array (h, w, 3). Whitespace/comment
    tolerant header parse, as the format allows."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 ints, separated by whitespace; '#' starts a comment
    vals: list[int] = []
    i = 2
    n = len(payload)
    while len(vals) < 3 and i < n:
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.index(b"\n", i)
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    i += 1  # single whitespace after maxval, then raster
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return px.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono int16 PCM -> RIFF/WAVE bytes."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE 16-bit PCM -> (int16 samples, sample_rate). Walks the
    chunk list, so extra chunks (LIST/fact) are skipped correctly."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    sr = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (sz,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if cid == b"fmt ":
            audio_fmt, _ch, sr, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[i + 8 : i + 24]
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM supported")
        elif cid == b"data":
            data = np.frombuffer(payload, dtype="<i2", count=sz // 2, offset=i + 8)
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return data, sr


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """uint8 luma frames (t, h, w) -> YUV4MPEG2 bytes (Cmono)."""
    f = np.asarray(frames, dtype=np.uint8)
    t, h, w = f.shape
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 Cmono\n" % (w, h, *fps)
    return head + b"".join(b"FRAME\n" + f[i].tobytes() for i in range(t))


def decode_y4m(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """YUV4MPEG2 -> (uint8 luma frames (t, h, w), (fps_num, fps_den)).
    Cmono and C420* supported (C420 chroma planes are walked over;
    luma is what the feature stage consumes). Frame-level parameter
    tags (allowed by the spec) are skipped."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    fps = (25, 1)
    csp = b"420"  # spec default when no C tag is present
    for tag in payload[9:nl].split():
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"F":
            num, den = tag[1:].split(b":")
            fps = (int(num), int(den))
        elif tag[:1] == b"C":
            csp = tag[1:]
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if csp == b"mono":
        fsize = w * h
    elif csp.startswith(b"420"):
        fsize = w * h + 2 * ((w // 2) * (h // 2))
    else:
        raise ValueError(f"unsupported Y4M colorspace C{csp.decode()}")
    frames = []
    i = nl + 1
    n = len(payload)
    while i < n:
        if payload[i : i + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame header")
        i = payload.index(b"\n", i) + 1
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=i
                          ).reshape(h, w))
        i += fsize
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), fps


# ---------------------------------------------------------------------------
# synthesis: deterministic REAL payloads (valid PPM / WAV / Y4M bytes)
# ---------------------------------------------------------------------------

def synthesize_media(refs: list[str], seed: int = 42) -> pa.Table:
    """Deterministic media blobs for pipeline tests: every image payload
    is a valid PPM, every audio payload a valid WAV, every video payload
    a valid Y4M. Keyed on crc32 of the REF string (not the list
    position, so any batching of the same refs yields identical rows;
    not hash(), which is salted)."""
    import zlib

    kinds, payloads, metas = [], [], []
    for r in refs:
        key = zlib.crc32(r.encode())
        rng = np.random.default_rng([seed, key])
        kind = ("image", "audio", "video")[key % 3]
        if kind == "image":
            w, h = 8 + int(rng.integers(0, 9)), 8 + int(rng.integers(0, 9))
            payloads.append(encode_ppm(rng.integers(0, 256, (h, w, 3))))
            metas.append(json.dumps({"w": w, "h": h}))
        elif kind == "audio":
            n = 256 + int(rng.integers(0, 256))
            payloads.append(encode_wav(rng.integers(-3000, 3000, n)))
            metas.append(json.dumps({"sr": 16000, "n": n}))
        else:
            t = 3 + int(rng.integers(0, 6))
            w, h = 8 + 2 * int(rng.integers(0, 5)), 8 + 2 * int(rng.integers(0, 5))
            payloads.append(
                encode_y4m(rng.integers(0, 256, (t, h, w)).astype(np.uint8)))
            metas.append(json.dumps({"frames": t, "w": w, "h": h}))
        kinds.append(kind)
    return pa.table(
        {"media_ref": refs, "kind": kinds, "payload": payloads, "meta": metas},
        schema=MEDIA_SCHEMA,
    )


# ---------------------------------------------------------------------------
# feature kernels (vectorized per blob; blobs iterate, pixels don't)
# ---------------------------------------------------------------------------

def image_feature(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """Grayscale block-mean downsample to (grid x grid), in [0, 1] —
    decode + resize + featurize, the canonical image preprocessing
    shape. Handles any h, w >= grid via bincount over block labels."""
    gray = img.astype(np.float32).mean(axis=2)
    h, w = gray.shape
    by = np.minimum(np.arange(h) * grid // h, grid - 1)
    bx = np.minimum(np.arange(w) * grid // w, grid - 1)
    lab = (by[:, None] * grid + bx[None, :]).ravel()
    sums = np.bincount(lab, weights=gray.ravel(), minlength=grid * grid)
    cnts = np.bincount(lab, minlength=grid * grid)
    return (sums / np.maximum(cnts, 1) / 255.0).astype(np.float32)


def video_feature(frames: np.ndarray, n_sample: int = 4, grid: int = 2) -> np.ndarray:
    """Frame-sample n_sample evenly spaced luma frames, 2x2 block means
    each -> n_sample*grid*grid dims in [0, 1] — decode + frame-sample +
    featurize, the canonical video preprocessing shape. Shorter clips
    repeat frames (evenly spaced sampling over what exists)."""
    t = len(frames)
    out = np.zeros((n_sample, grid * grid), dtype=np.float32)
    if t:
        pick = (np.arange(n_sample) * t) // n_sample
        for j, fi in enumerate(pick):
            g = frames[fi].astype(np.float32)
            h, w = g.shape
            by = np.minimum(np.arange(h) * grid // h, grid - 1)
            bx = np.minimum(np.arange(w) * grid // w, grid - 1)
            lab = (by[:, None] * grid + bx[None, :]).ravel()
            sums = np.bincount(lab, weights=g.ravel(), minlength=grid * grid)
            cnts = np.bincount(lab, minlength=grid * grid)
            out[j] = sums / np.maximum(cnts, 1) / 255.0
    return out.reshape(-1)


def audio_feature(samples: np.ndarray, bins: int = 16) -> np.ndarray:
    """RMS energy over `bins` equal time slices, normalized to [0, 1]."""
    x = samples.astype(np.float32) / 32768.0
    n = len(x)
    if n == 0:
        return np.zeros(bins, dtype=np.float32)
    lab = np.minimum(np.arange(n) * bins // n, bins - 1)
    sums = np.bincount(lab, weights=x * x, minlength=bins)
    cnts = np.bincount(lab, minlength=bins)
    return np.sqrt(sums / np.maximum(cnts, 1)).astype(np.float32)


class DecodeAndFeaturize:
    """Actor-pool stage: decode media payloads and emit fixed-size
    feature vectors (FEAT_DIM = 16).

    image -> PPM decode + 4x4 block-mean gray patch (real decode);
    audio -> WAV decode + 16-bin RMS energy (real decode);
    video -> Y4M decode + 4-frame sample x 2x2 luma block means (real
    decode for uncompressed YUV4MPEG2). COMPRESSED video payloads are
    the one remaining stub: no codec stack in this container.
    stub_mode="fake" emits a deterministic byte-hash feature for them;
    "strict" raises NotImplementedError at the exact ffmpeg plug-in
    point.
    """

    FEAT_DIM = 16

    def __init__(self, stub_mode: str = "fake"):
        self.stub_mode = stub_mode

    def _video_feature(self, payload: bytes) -> np.ndarray:
        if payload.startswith(b"YUV4MPEG2"):
            return video_feature(decode_y4m(payload)[0])
        if self.stub_mode == "strict":
            raise NotImplementedError(
                "compressed video decode needs a codec library (ffmpeg) "
                "not present in this container; run with stub_mode='fake', "
                "re-encode to Y4M, or plug a real frame sampler in here"
            )
        raw = np.frombuffer(payload[: self.FEAT_DIM], dtype=np.uint8)
        out = np.zeros(self.FEAT_DIM, dtype=np.float32)
        out[: len(raw)] = raw.astype(np.float32) / 255.0
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats = np.zeros((len(payloads), self.FEAT_DIM), dtype=np.float32)
        for i, (k, p) in enumerate(zip(kinds, payloads)):
            if k == "image":
                feats[i] = image_feature(decode_ppm(p))
            elif k == "audio":
                feats[i] = audio_feature(decode_wav(p)[0])
            else:
                feats[i] = self._video_feature(p)
        flat = pa.array(feats.reshape(-1))
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "kind": batch.column("kind"),
                "feature": pa.FixedSizeListArray.from_arrays(flat, self.FEAT_DIM),
            }
        )


def decode_features(media_ds, concurrency: int = 2, batch_size: int = 256,
                    stub_mode: str = "fake"):
    """Media table -> feature vectors. Small batch_size on purpose: wide
    binary rows mean a batch x concurrency must fit in worker heap."""
    return media_ds.map_batches(
        DecodeAndFeaturize,
        fn_constructor_kwargs={"stub_mode": stub_mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_from_doc_spans(docs_ds):
    """Pull media spans out of interleaved docs -> a media work table
    (media_ref + doc back-reference), the hand-off point between the
    text pipeline and the media pipeline."""
    from . import ops

    def f(batch: pa.Table) -> pa.Table:
        ex = ops.explode_spans(batch)
        import pyarrow.compute as pc

        med = ex.filter(pc.equal(ex["kind"], "media"))
        return pa.table(
            {
                "media_ref": med.column("media_ref"),
                "doc_id": med.column("doc_id"),
                "span_idx": med.column("span_idx"),
            }
        )

    return docs_ds.map_batches(f, batch_format="pyarrow", batch_size=None)
