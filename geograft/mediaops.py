"""Multimodal column plumbing: image/audio/video as opaque binary.

The sandbox has no image/audio libraries, so the DECODE kernels are
stubbed (deterministic fake or NotImplementedError behind a flag) —
but all the Ray-side plumbing is real and tested: binary columns with
typed metadata, actor-pool stages with per-actor setup, small batch
sizes for wide rows, and stable output schemas.

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


def synthesize_media(refs: list[str], seed: int = 42) -> pa.Table:
    """Deterministic fake media blobs for pipeline tests: payload bytes
    are a seeded function of the ref, meta carries the decode params."""
    rng = np.random.default_rng(seed)
    kinds, payloads, metas = [], [], []
    for r in refs:
        h = abs(hash((seed, r))) % 3  # noqa: S324 - test-data variety only
        kind = ("image", "audio", "video")[h]
        n = 64 + (abs(hash((seed, r, "n"))) % 192)
        payloads.append(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        kinds.append(kind)
        metas.append(json.dumps({"w": 8, "h": 8} if kind == "image" else {"sr": 16000}))
    return pa.table(
        {"media_ref": refs, "kind": kinds, "payload": payloads, "meta": metas},
        schema=MEDIA_SCHEMA,
    )


class DecodeAndFeaturize:
    """Actor-pool stage: decode media payloads and emit fixed-size
    feature vectors.

    Real deployments load a decoder/model in __init__ (once per actor).
    Here, with no codec libraries in the container, `stub_mode` chooses:
      - "fake": deterministic feature = first 16 payload bytes as f32
        (keeps the full pipeline runnable + assertable end to end);
      - "strict": raise NotImplementedError, marking exactly where a
        real decoder (PIL/torchaudio/ffmpeg) plugs in.
    """

    FEAT_DIM = 16

    def __init__(self, stub_mode: str = "fake"):
        self.stub_mode = stub_mode
        try:  # pragma: no cover - not present in this container
            import PIL.Image  # noqa: F401

            self.has_pil = True
        except ImportError:
            self.has_pil = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.stub_mode == "strict" and not self.has_pil:
            raise NotImplementedError(
                "media decode needs an image/audio library not present in "
                "this container; run with stub_mode='fake' or install PIL"
            )
        payloads = batch.column("payload").to_pylist()
        feats = np.zeros((len(payloads), self.FEAT_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            raw = np.frombuffer(p[: self.FEAT_DIM], dtype=np.uint8)
            feats[i, : len(raw)] = raw.astype(np.float32) / 255.0
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
