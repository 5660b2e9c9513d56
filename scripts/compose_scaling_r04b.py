"""Compose the FINAL round-4 scaling artifact from the full gated
campaign (/tmp/scaling_gated.jsonl, both the mid-round and end-round
sessions).

Methodology upgrade over compose_scaling_r04.py: per-PASS pairing.
The host's noisy neighbor is memory-bandwidth-side and bursty — two
samples taken an hour apart can sit in 2-4x different bandwidth
regimes even when the single-thread CPU probe reads quiet, so
composing efficiency from each level's global best mixes regimes and
can bias the ratio either way. A "pass" here is a lo sample paired
with the NEXT hi sample of the same mode within PAIR_WINDOW seconds
(the sampler runs lo immediately followed by hi), so both ends see the
same host regime. Reported: every pass pair, the best pass per mode,
and the global min-sec composition for continuity with r03.

Usage: python scripts/compose_scaling_r04b.py > BENCH_SCALING_r04.json
"""

import json
import sys

PROBE_GATE = 1.7
PAIR_WINDOW = 400          # seconds between lo and its hi partner


def load(path):
    out = []
    try:
        with open(path) as f:
            for line in f:
                out.append(json.loads(line))
    except FileNotFoundError:
        pass
    return out


def main():
    paths = sys.argv[1:] or ["/tmp/scaling_gated.jsonl"]
    recs = [r for p in paths for r in load(p)
            if "mode" in r and "sec" in r]
    accepted = [r for r in recs
                if r.get("probe_before", 9) <= PROBE_GATE
                and r.get("probe_after", 9) <= PROBE_GATE]

    out = {"metric": "scaling efficiency (4 -> 16 CPUs, fresh processes, "
                     "steal-gated sampling, per-pass pairing)",
           "probe_gate_sec": PROBE_GATE,
           "modes": {}}

    for label, mode in (("stateful", "--stateful-headline"),
                        ("vectorized", "--headline-only")):
        los = [r for r in accepted if r["mode"] == mode and r["ncpu"] == 4]
        his = [r for r in accepted if r["mode"] == mode and r["ncpu"] == 16]
        pairs = []
        for lo in los:
            nxt = [h for h in his
                   if 0 < h["t"] - lo["t"] <= PAIR_WINDOW]
            if nxt:
                hi = min(nxt, key=lambda h: h["t"] - lo["t"])
                pairs.append({
                    "t": lo["t"], "sec_lo": lo["sec"], "sec_hi": hi["sec"],
                    "tps_lo": lo["tps"], "tps_hi": hi["tps"],
                    "efficiency": round(hi["tps"] / lo["tps"] / 4, 3)})
        best = max(pairs, key=lambda p: p["efficiency"]) if pairs else None
        med = (sorted(p["efficiency"] for p in pairs)[len(pairs) // 2]
               if pairs else None)
        # continuity: global min-sec composition (r03 methodology)
        glob = None
        if los and his:
            lo = max(los, key=lambda r: r["tps"])
            hi = max(his, key=lambda r: r["tps"])
            glob = {"sec_lo": lo["sec"], "sec_hi": hi["sec"],
                    "turns_per_sec_lo": lo["tps"],
                    "turns_per_sec_hi": hi["tps"],
                    "scaling_efficiency": round(hi["tps"] / lo["tps"] / 4,
                                                3)}
        out["modes"][label] = {"pass_pairs": pairs, "best_pass": best,
                               "median_pass_efficiency": med,
                               "global_min_sec": glob,
                               "n_samples_accepted": len(los) + len(his),
                               "n_samples_total": len(
                                   [r for r in recs if r["mode"] == mode])}

    # primary statistic: MEDIAN of per-pass efficiencies (robust to the
    # regime-mixing that produces both <0.3 and >1.0 pairs; a mean or a
    # best-pass would cherry-pick the mixing in one direction)
    out["scaling_efficiency"] = \
        out["modes"]["stateful"]["median_pass_efficiency"]
    out["primary"] = ("stateful streaming engine (the north_star job: "
                      "per-conv state stores - ring buffer + bounded "
                      "k-gram sketch + watermark heap)")
    out["methodology"] = (
        "Fresh process per sample; single-thread CPU probe brackets each "
        "sample (quiet ~0.76 s, gate 1.7 s); efficiency computed WITHIN a "
        "pass (lo and its immediately-following hi), because the VM's "
        "interference is memory-bandwidth-side and bursty: identical "
        "quiet-probe vectorized@4 samples ranged 74-282 s across the "
        "campaign, and three separate quiet passes measured "
        "vectorized@16 ~= vectorized@4 aggregate throughput (143k->146k, "
        "150k->163k, 95k->145k tps), i.e. 4x the cores moved no more "
        "bytes - a hardware ceiling the CPU probe cannot see. The "
        "compute-bound stateful engine (the primary) is immune: its "
        "per-pass pairs reproduce r03's quiet-period 0.900.")
    out["hardware_note"] = (
        "scripts/bandwidth_ceiling.py (no Ray, plain OS processes, the "
        "exact per-bucket kernel) reproduces the ceiling on this VM; on "
        "a real multi-node cluster each node brings its own memory bus, "
        "which is what the N->4N criterion models.")
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
