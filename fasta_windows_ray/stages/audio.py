"""Audio payload support: a REAL pure-numpy WAV (RIFF / PCM-16) codec and
a DSP feature-extraction stage — the audio tier of the multimodal column
family (SURVEY.md §2.7 multimodal).

Same format-tiering discipline as ``stages/multimodal.py``: uncompressed
RIFF/WAVE PCM needs no external codec, so decode, per-clip features
(duration, RMS, peak, zero-crossing rate, spectral centroid) and
nearest-neighbor resampling are fully real here; compressed audio
(MP3/OGG/FLAC — no codec in this container) stays behind the strict
raise / deterministic-fake stub, with all Ray-side plumbing identical.

Ray shape: features run as ``map_batches`` over the media schema
(binary ``payload`` column); payloads decode independently, so the stage
is embarrassingly parallel and shuffle-free. Batches stay SMALL
(``batch_size≈256``) because each row may carry megabytes of PCM —
batch × concurrency must fit the worker heap (module guidance shared
with the image stages).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa


def wav_encode(pcm: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 PCM (shape (n,) mono or (n, channels)) as a minimal
    RIFF/WAVE file: 'fmt ' (PCM, 16-bit) + 'data' chunks."""
    pcm = np.asarray(pcm)
    if pcm.dtype != np.int16:
        raise ValueError(f"wav_encode wants int16 PCM, got {pcm.dtype}")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    data = pcm.astype("<i2").tobytes()           # interleaved frames
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM-16 file → (int16 array shape (n, channels),
    sample_rate). Walks the chunk list (skipping LIST/fact/etc., honoring
    the RIFF odd-size pad byte); raises ValueError on anything that is
    not uncompressed 16-bit PCM."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, end = 12, min(len(buf), 8 + struct.unpack("<I", buf[4:8])[0])
    fmt = data = None
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        chunk = buf[pos + 8:pos + 8 + size]
        if len(chunk) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)             # odd sizes are padded
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, ch, sr, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != 1 or bits != 16:
        raise ValueError(f"only PCM-16 supported (tag={tag}, bits={bits})")
    if ch < 1:
        raise ValueError("channels < 1")
    frames = len(data) // (2 * ch)
    pcm = np.frombuffer(data[:frames * 2 * ch], dtype="<i2")
    return pcm.reshape(frames, ch).astype(np.int16), sr


def resample_pcm(pcm: np.ndarray, src_sr: int, dst_sr: int) -> np.ndarray:
    """Nearest-neighbor PCM resample — out[i] = in[i*src_sr//dst_sr]
    (the floor mapping ``resize_nearest`` uses, exactly reproducible)."""
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n = pcm.shape[0]
    out_n = (n * dst_sr) // src_sr
    idx = (np.arange(out_n, dtype=np.int64) * src_sr) // dst_sr
    return pcm[idx]


def pcm_features(pcm: np.ndarray, sr: int) -> dict:
    """Per-clip DSP features over int16 PCM (channel-averaged first):
    duration, RMS, peak, zero-crossing rate (sign changes per second,
    zeros carry the previous sign), spectral centroid in Hz (magnitude-
    weighted mean rFFT bin). Pure numpy; deterministic."""
    x = pcm.astype(np.float64).mean(axis=1) if pcm.ndim == 2 \
        else pcm.astype(np.float64)
    n = len(x)
    if n == 0:
        return {"duration_s": 0.0, "rms": 0.0, "peak": 0, "zcr_hz": 0.0,
                "spectral_centroid_hz": 0.0}
    sign = np.sign(x)
    # zeros inherit the previous nonzero sign so silence has ZCR 0
    nz = sign != 0
    if nz.any():
        idx = np.where(nz, np.arange(n), -1)
        np.maximum.accumulate(idx, out=idx)
        filled = np.where(idx >= 0, sign[np.maximum(idx, 0)], 0.0)
    else:
        filled = sign
    crossings = int(np.count_nonzero(filled[1:] * filled[:-1] < 0))
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
    tot = mag.sum()
    return {
        "duration_s": n / sr,
        "rms": float(np.sqrt(np.mean(x * x))),
        "peak": int(np.abs(pcm).max()),
        "zcr_hz": crossings / (n / sr),
        "spectral_centroid_hz": float((mag * freqs).sum() / tot)
        if tot > 0 else 0.0,
    }


class AudioFeatures:
    """Actor-pool feature stage over the media schema. RIFF payloads take
    the REAL path (wav_decode → pcm_features); other payloads raise in
    ``strict`` mode (no MP3/OGG codec in this container) or emit a
    deterministic tagged digest row so the plumbing stays exercised."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"media_id": batch["media_id"].to_numpy(),
               "sample_rate": np.zeros(len(batch), np.int64),
               "channels": np.zeros(len(batch), np.int64),
               "duration_s": np.zeros(len(batch)),
               "rms": np.zeros(len(batch)),
               "peak": np.zeros(len(batch), np.int64),
               "zcr_hz": np.zeros(len(batch)),
               "spectral_centroid_hz": np.zeros(len(batch)),
               "payload_md5": [""] * len(batch)}
        for i, p in enumerate(batch["payload"]):
            p = bytes(p)
            if p[:4] == b"RIFF":
                pcm, sr = wav_decode(p)
                f = pcm_features(pcm, sr)
                out["sample_rate"][i] = sr
                out["channels"][i] = pcm.shape[1]
                for k in ("duration_s", "rms", "zcr_hz",
                          "spectral_centroid_hz"):
                    out[k][i] = f[k]
                out["peak"][i] = f["peak"]
                out["payload_md5"][i] = hashlib.md5(p).hexdigest()
            elif self.strict:
                raise NotImplementedError(
                    "compressed audio needs an external codec — not in "
                    "this environment; run strict=False for the "
                    "deterministic stub")
            else:
                out["payload_md5"][i] = hashlib.md5(p + b"|audio").hexdigest()
        return pd.DataFrame(out)


def synth_wav_media(ds, id_col: str = "doc_id", base_sr: int = 8000):
    """Deterministic planted WAV corpus: one real PCM-16 mono clip per id,
    integer square-ish waveform pcm[t] = A * (+1 if (t // half) even else
    -1) with A = 1000 + id % 1000, half = 4 + id % 13, n = 2000 + id % 777
    samples — period/amplitude are pure functions of id, so feature tests
    can assert exact ZCR/peak values. Downstream sees only bytes."""

    def gen(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for i in ids:
            i = int(i)
            n, half = 2000 + i % 777, 4 + i % 13
            amp = 1000 + i % 1000
            tt = np.arange(n, dtype=np.int64)
            pcm = np.where((tt // half) % 2 == 0, amp, -amp).astype(np.int16)
            payloads.append(wav_encode(pcm, base_sr))
        n = len(ids)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["audio"] * n),
            "meta": pa.array(["{}"] * n),
        })

    return ds.map_batches(gen, batch_format="pyarrow")


def audio_pipeline(ds, strict: bool = False, batch_size: int = 256,
                   concurrency=(1, 4)):
    """documents → planted WAV corpus → actor-pool feature extraction
    (small batches: binary rows; batch × concurrency sized to the heap)."""
    media = synth_wav_media(ds)
    return media.map_batches(AudioFeatures, batch_format="pandas",
                             fn_constructor_kwargs={"strict": strict},
                             batch_size=batch_size, concurrency=concurrency)
