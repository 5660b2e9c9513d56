"""WAV codec + audio feature gates: byte-exact roundtrip (mono/stereo),
chunk-walking robustness (LIST chunk, odd-size padding), garbage
rejection, exact DSP features on planted square waves, pipeline
determinism through the actor pool."""

import struct

import numpy as np
import pandas as pd
import pytest

from fasta_windows_ray.stages.audio import (
    AudioFeatures, audio_pipeline, pcm_features, resample_pcm,
    synth_wav_media, wav_decode, wav_encode)


def test_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(7)
    mono = rng.integers(-32768, 32767, 5000).astype(np.int16)
    pcm, sr = wav_decode(wav_encode(mono, 16000))
    assert sr == 16000 and pcm.shape == (5000, 1)
    np.testing.assert_array_equal(pcm[:, 0], mono)

    stereo = rng.integers(-32768, 32767, (300, 2)).astype(np.int16)
    pcm2, sr2 = wav_decode(wav_encode(stereo, 44100))
    assert sr2 == 44100 and pcm2.shape == (300, 2)
    np.testing.assert_array_equal(pcm2, stereo)


def test_decode_walks_extra_chunks_and_padding():
    base = wav_encode(np.arange(10, dtype=np.int16), 8000)
    # splice an odd-sized LIST chunk (forces the pad-byte path) between
    # fmt and data
    fmt_end = base.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = bytearray(base[:fmt_end] + extra + base[fmt_end:])
    # fix the RIFF size field
    spliced[4:8] = struct.pack("<I", len(spliced) - 8)
    pcm, sr = wav_decode(bytes(spliced))
    np.testing.assert_array_equal(pcm[:, 0], np.arange(10, dtype=np.int16))


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        wav_decode(b"not audio at all")
    with pytest.raises(ValueError):
        wav_decode(b"RIFF\x10\x00\x00\x00WAVE")        # no fmt/data
    ok = wav_encode(np.zeros(4, np.int16), 8000)
    with pytest.raises(ValueError):
        wav_decode(ok[:20])                             # truncated
    # 8-bit format tag rejected
    bad = bytearray(ok)
    i = bad.index(b"fmt ") + 8
    bad[i:i + 2] = struct.pack("<H", 3)                 # float tag
    with pytest.raises(ValueError):
        wav_decode(bytes(bad))


def test_square_wave_features_exact():
    # period 2*half samples -> one sign flip per half samples
    sr, half, amp, n = 8000, 5, 1200, 4000
    t = np.arange(n)
    pcm = np.where((t // half) % 2 == 0, amp, -amp).astype(np.int16)
    f = pcm_features(pcm, sr)
    assert f["peak"] == amp
    assert f["rms"] == pytest.approx(amp)
    assert f["duration_s"] == pytest.approx(n / sr)
    flips = n // half - 1
    assert f["zcr_hz"] == pytest.approx(flips / (n / sr))
    assert f["spectral_centroid_hz"] > 0


def test_silence_has_zero_features():
    f = pcm_features(np.zeros(1000, np.int16), 8000)
    assert f["rms"] == 0 and f["peak"] == 0
    assert f["zcr_hz"] == 0 and f["spectral_centroid_hz"] == 0


def test_resample_floor_mapping():
    pcm = np.arange(100, dtype=np.int16)
    down = resample_pcm(pcm, 8000, 4000)
    assert down.shape == (50, 1)
    np.testing.assert_array_equal(down[:, 0], pcm[::2])
    up = resample_pcm(pcm, 8000, 16000)
    assert up.shape == (200, 1)
    np.testing.assert_array_equal(up[:, 0], np.repeat(pcm, 2))


def test_pipeline_exact_planted_features(ray_session):
    import ray.data as rd
    ids = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64)})
    feats = audio_pipeline(rd.from_pandas(ids), batch_size=16) \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(feats) == 40
    for _, r in feats.iterrows():
        i = int(r["media_id"])
        n, half = 2000 + i % 777, 4 + i % 13
        amp = 1000 + i % 1000
        assert r["peak"] == amp and r["sample_rate"] == 8000
        assert r["channels"] == 1
        assert r["duration_s"] == pytest.approx(n / 8000)
        assert r["rms"] == pytest.approx(amp)
        flips = (n - 1) // half    # sign changes at every multiple of half
        assert r["zcr_hz"] == pytest.approx(flips / (n / 8000))
    # determinism across runs
    again = audio_pipeline(rd.from_pandas(ids), batch_size=16) \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(feats, again)


def test_strict_raises_on_non_wav():
    batch = pd.DataFrame({"media_id": [1], "payload": [b"MP3junk"]})
    with pytest.raises(NotImplementedError):
        AudioFeatures(strict=True)(batch)
    row = AudioFeatures(strict=False)(batch)
    assert row["sample_rate"].iloc[0] == 0 and row["payload_md5"].iloc[0]
