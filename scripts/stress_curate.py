"""Scale rehearsal of ``curate_full`` end-to-end (round-4 VERDICT #2).

Every stage has isolated evidence; this composes them at 64x-256x the
sf0.1 documents table and records the funnel, throughput, peak worker
RSS and max near-dup cluster size, exercising the ``checkpoint_dir``
catalog path (round-4 VERDICT #3) — the fleet-scale variant where the
filtered corpus is committed to parquet and re-read column-pruned
instead of pinned in the object store.

Corpus model (the 100-TB shape): the base corpus is replicated N x as
vocabulary-salted shards — every non-stopword token gets a per-shard
suffix, stopwords stay intact. Within a shard the salting is a token
bijection, so quality signals (token count, stop ratio, punct ratio,
dup-word fraction) and the near-dup structure are preserved; across
shards nearly every 7-byte shingle differs, so no cross-shard
near-dups exist. Result: corpus size grows N x while the duplicate
RATE and cluster sizes stay O(1) — exactly how a real corpus scales,
unlike naive replication (which makes cluster size grow with N and
pair verification quadratic in N).

Boundedness evidence = max cluster size and peak worker RSS invariant
across 64x / 256x while docs/sec holds.

Usage:
    python scripts/stress_curate.py [replicate] [out_path]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/tmp/curate_rehearsal"


def build_corpus(sf: str, replicate: int, out_dir: str) -> int:
    """Materialize the salted N x corpus to parquet (generation is test
    SETUP, not engine work — excluded from the timed region)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from fasta_windows_ray.stages.text_analysis import STOPWORDS

    base = pq.read_table(f"{sf}/documents.parquet")
    # shard ids live in disjoint 10M ranges; a bigger base corpus would
    # silently collide doc_ids across shards and corrupt the dedup
    # funnel — refuse loudly instead
    assert len(base) < 10_000_000, \
        f"base corpus {len(base)} rows >= 10M: raise the shard offset"
    base_ref = ray.put(base)
    stop = frozenset(STOPWORDS)

    def gen(batch):
        t = ray.get(base_ref)
        ids = t["doc_id"].to_numpy()
        langs, srcs = t["lang"], t["source"]
        texts = t["text"].to_pylist()
        for s in batch["id"].tolist():
            salt = f"q{int(s):02x}"
            salted = [" ".join(w if w in stop else w + salt
                               for w in tx.split())
                      for tx in texts]
            yield pa.table({
                "doc_id": pa.array(ids + int(s) * 10_000_000, pa.int64()),
                "text": pa.array(salted, pa.string()),
                "lang": langs, "source": srcs,
                "n_chars": pa.array([len(x) for x in salted], pa.int64()),
            })

    want = len(base) * replicate
    # reuse a prior build (generation is the slow part at 1024x) — but
    # only when a metadata tag proves it came from the same base dir,
    # row count and salting scheme; any mismatch or read failure
    # rebuilds from scratch
    tag = {"sf": sf, "rows": want, "salt_scheme": "token-suffix-v1"}
    tag_path = os.path.join(out_dir, "_corpus_tag.json")
    if os.path.isdir(out_dir):
        try:
            with open(tag_path) as f:
                ok = json.load(f) == tag
        except Exception:
            ok = False
        if ok:
            try:                 # `_`-prefixed tag is ignored by the
                if rd.read_parquet(out_dir).count() == want:  # reader
                    return want
            except Exception:
                pass
        shutil.rmtree(out_dir, ignore_errors=True)
    (rd.range(replicate, override_num_blocks=replicate)
       .map_batches(gen, batch_format="numpy")
       .write_parquet(out_dir))
    with open(tag_path, "w") as f:
        json.dump(tag, f)
    return want


class RssMonitor:
    """Peak RSS and peak PRIVATE (rss - shared) across ray worker
    processes, sampled every 0.5 s.  Private is the boundedness metric:
    on Linux a worker's RSS includes every plasma object-store page it
    has mapped (shared memory), so RSS grows with object-store traffic
    even when the worker heap is flat."""

    def __init__(self):
        self.peak_kb = 0
        self.peak_private_kb = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        import psutil
        me = os.getpid()
        while not self._stop.is_set():
            for p in psutil.process_iter(["name", "memory_info"]):
                try:
                    if p.pid != me and (p.info["name"] or "").startswith("ray::"):
                        mi = p.info["memory_info"]
                        self.peak_kb = max(self.peak_kb, mi.rss // 1024)
                        self.peak_private_kb = max(
                            self.peak_private_kb,
                            (mi.rss - getattr(mi, "shared", 0)) // 1024)
                except Exception:
                    pass
            self._stop.wait(0.5)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._t.join(timeout=2)


def run_one(corpus_dir: str, n_docs: int, ncpu: int) -> dict:
    import ray.data as rd

    from fasta_windows_ray.pipelines.curation import curate_full

    ckpt = f"{SCRATCH}/ckpt"
    out = f"{SCRATCH}/survivors"
    for d in (ckpt, out):
        shutil.rmtree(d, ignore_errors=True)

    docs = rd.read_parquet(corpus_dir)
    # eval set: 100 docs of the corpus itself -> decontamination must
    # fire on them (and their near-dups), a constant-size effect.
    # Arrow predicate pushdown at the read — not a row-wise filter.
    import pyarrow.dataset as pads
    eval_ds = rd.read_parquet(
        corpus_dir, columns=["doc_id", "text"],
        filter=(pads.field("doc_id") < 100))

    with RssMonitor() as mon:
        t0 = time.perf_counter()
        survivors, funnel = curate_full(docs, eval_ds,
                                        checkpoint_dir=ckpt)
        surv = survivors.materialize()
        n_out = surv.count()
        wall = time.perf_counter() - t0
    with open(f"{SCRATCH}/stats_{n_docs}.txt", "w") as f:
        f.write(surv.stats())

    # boundedness metrics: the dup/contamination FRACTIONS must be
    # invariant across replicates (the vocab-salt model keeps the dup
    # rate O(1) in scale), and peak worker RSS must stay flat
    splits = surv.groupby("split").count().to_pandas()
    surv.write_parquet(out)
    mb = sum(os.path.getsize(os.path.join(dp, f))
             for dp, _, fs in os.walk(corpus_dir) for f in fs) / 1e6
    nf, nu, nc = (funnel["n_filtered"], funnel["n_unique"],
                  funnel["n_clean"])
    return {
        "n_docs_in": n_docs,
        "corpus_mb": round(mb, 1),
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "mb_per_sec": round(mb / wall, 2),
        "funnel": funnel,
        "n_survivors": n_out,
        "near_dup_frac": round((nf - nu) / max(nf, 1), 5),
        "contaminated_frac": round((nu - nc) / max(nu, 1), 5),
        "split_counts": {str(r["split"]): int(r["count()"])
                         for _, r in splits.iterrows()},
        "peak_worker_rss_mb": round(mon.peak_kb / 1024, 1),
        "peak_worker_private_mb": round(mon.peak_private_kb / 1024, 1),
    }


def main() -> dict:
    import ray
    from ray.data import DataContext

    replicates = ([int(sys.argv[1])] if len(sys.argv) > 1 else [64, 256])
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    runs = []
    for rep in replicates:
        corpus = f"{SCRATCH}/corpus_{rep}"
        n = build_corpus(sf, rep, corpus)
        r = run_one(corpus, n, ncpu)
        r["replicate"] = rep
        runs.append(r)
        print(json.dumps(r))
        shutil.rmtree(corpus, ignore_errors=True)

    out = {
        "metric": "curate_full end-to-end scale rehearsal "
                  "(normalize -> C4+ratio+repetition filter -> MinHash "
                  "near-dup keep-best -> decontaminate -> split), "
                  "catalog-checkpoint path (checkpoint_dir=)",
        "num_cpus": ncpu,
        "sf": sf,
        "corpus_model": "vocab-salted shards: dup rate O(1) in scale",
        "runs": runs,
    }
    ray.shutdown()
    return out


if __name__ == "__main__":
    res = main()
    path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_CURATE_r05.json"
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
