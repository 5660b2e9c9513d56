"""Multimodal columns: opaque ``binary`` payloads with typed metadata.

The decode/resize/frame-sample kernels need image/audio libraries that are
not in this container, so the *decode step* is stubbed behind a
deterministic fake (clearly marked), while all the Ray-side plumbing —
schema, actor-pool signature, batch sizing for large binary rows, output
layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),    # "image" | "audio"
    ("meta", pa.string()),          # JSON metadata
])


def docs_as_media(ds):
    """Project documents to the media schema (text bytes as the opaque
    payload) — the plumbing-level stand-in for real image/audio columns."""
    def proj(t: pa.Table) -> pa.Table:
        payload = pa.array([s.encode() for s in t["text"].to_pylist()],
                           pa.binary())
        n = len(t)
        return pa.table({
            "media_id": t["doc_id"].cast(pa.int64()),
            "payload": payload,
            "media_type": pa.array(["image"] * n),
            "meta": pa.array(["{}"] * n),
        })
    return ds.map_batches(proj, batch_format="pyarrow")


class MediaMeta:
    """Metadata extraction over binary payloads (real, no decode needed):
    byte length + content digest. Vectorizable parts vectorized."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "media_id": batch["media_id"].to_numpy(),
            "n_bytes": np.asarray([len(p) for p in batch["payload"]],
                                  dtype=np.int64),
            "sha256": [hashlib.sha256(p).hexdigest()
                       for p in batch["payload"]],
        })


class ImageDecodeStub:
    """Actor-pool decode/feature stage with the real signature.

    STUB: the container has no image libs; ``strict=True`` raises
    NotImplementedError (the honest production behaviour), else a
    deterministic fake "decode" derives a pseudo (h, w, mean_luma) from
    the payload digest so downstream plumbing is testable end-to-end.
    Small batch_size is the correct setting for large binary rows.
    """

    def __init__(self, strict: bool = False, feature_dim: int = 8):
        self.strict = strict
        self.feature_dim = feature_dim

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.strict:
            raise NotImplementedError(
                "image decode requires PIL/cv2 — not available in this "
                "environment; run with strict=False for the deterministic "
                "fake decode")
        rows = []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            d = hashlib.sha256(payload).digest()
            h, w = 1 + d[0] % 64, 1 + d[1] % 64
            feat = np.frombuffer(d[:self.feature_dim * 4][:32], dtype=np.uint8)
            feat = (feat[:self.feature_dim] / 255.0).astype(np.float32)
            rows.append((int(mid), int(h), int(w), feat))
        return pd.DataFrame({
            "media_id": [r[0] for r in rows],
            "height": np.asarray([r[1] for r in rows], dtype=np.int64),
            "width": np.asarray([r[2] for r in rows], dtype=np.int64),
            "features": [r[3] for r in rows],
        })


def frame_sample(media_ds, frame_bytes: int = 64, every: int = 4,
                 batch_size: int = 256):
    """Video-style frame sampling over opaque payloads — one input row
    fans out to one row per SAMPLED frame (every ``every``-th fixed-size
    byte chunk), the flat-map shape a real video pipeline has. The
    chunking itself needs no codec, so this stage is REAL (not a stub):
    payload[i*frame_bytes:(i+1)*frame_bytes] stands in for frame i, and
    a decoded-frame consumer slots in downstream. Output:
    (media_id, frame_idx, n_bytes, frame_md5)."""

    def sample(batch: pd.DataFrame) -> pd.DataFrame:
        mids, idxs, sizes, digs = [], [], [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            nf = (len(payload) + frame_bytes - 1) // frame_bytes
            for fi in range(0, nf, every):
                chunk = payload[fi * frame_bytes:(fi + 1) * frame_bytes]
                mids.append(int(mid))
                idxs.append(fi)
                sizes.append(len(chunk))
                digs.append(hashlib.md5(chunk).hexdigest())
        return pd.DataFrame({
            "media_id": np.asarray(mids, dtype=np.int64),
            "frame_idx": np.asarray(idxs, dtype=np.int64),
            "n_bytes": np.asarray(sizes, dtype=np.int64),
            "frame_md5": digs,
        })

    return media_ds.map_batches(sample, batch_format="pandas",
                                batch_size=batch_size)


class ResizeStub:
    """Resize stage with the real signature (payload + target dims in,
    payload + dims out). STUB like ImageDecodeStub: ``strict=True``
    raises (no image libs in this container); else the deterministic
    fake tags the payload with the target and re-digests, so downstream
    exactly-once / lineage plumbing sees a genuinely transformed
    payload column."""

    def __init__(self, width: int = 32, height: int = 32,
                 strict: bool = False):
        self.w, self.h, self.strict = width, height, strict

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.strict:
            raise NotImplementedError(
                "image resize requires PIL/cv2 — not available in this "
                "environment; run with strict=False for the deterministic "
                "fake resize")
        tag = f"|{self.w}x{self.h}".encode()
        return pd.DataFrame({
            "media_id": batch["media_id"].to_numpy(),
            "out_width": np.full(len(batch), self.w, dtype=np.int64),
            "out_height": np.full(len(batch), self.h, dtype=np.int64),
            "resized_md5": [hashlib.md5(p + tag).hexdigest()
                            for p in batch["payload"]],
        })


def media_pipeline(ds, strict: bool = False, batch_size: int = 256,
                   concurrency=(1, 4)):
    """media → metadata + (stub-)decoded features, actor pools sized for
    binary payloads (small batches so batch × concurrency fits the heap)."""
    media = docs_as_media(ds)
    meta = media.map_batches(MediaMeta, batch_format="pandas",
                             batch_size=batch_size, concurrency=concurrency)
    feats_cls = ImageDecodeStub if not strict else None
    if strict:
        class StrictDecode(ImageDecodeStub):
            def __init__(self):
                super().__init__(strict=True)
        feats_cls = StrictDecode
    feats = media.map_batches(feats_cls, batch_format="pandas",
                              batch_size=batch_size, concurrency=concurrency)
    return meta, feats
