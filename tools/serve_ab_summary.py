"""Live-vs-bundle serving A/B over repeated interleaved pairs (VERDICT r4
item 5).

Rounds 3 and 4 each measured ONE same-window pair and reached opposite
conclusions (r3: bundle 48.6 vs live 43.1 rps; r4: live 51.2 vs bundle
39.6) on a tunneled backend with ~±8% noise.  tools/r5_queue.sh runs N=5
interleaved pairs; this summary reports mean ± spread for both backends and
per-pair deltas so docs/SERVING.md can state ONE defensible default.
"""

import argparse
import glob
import json
import statistics
from pathlib import Path


def collect(dirname, pattern):
    rows = {}
    for kind in ("live", "bundle"):
        vals = []
        for f in sorted(glob.glob(f"{dirname}/serve_{kind}_{pattern}_*.json")):
            d = json.loads(Path(f).read_text())
            c = d.get("concurrent") or {}
            if c.get("throughput_rps"):
                vals.append({"file": Path(f).name,
                             "rps": c["throughput_rps"],
                             "p50_ms_2s": next(
                                 (s["p50_ms"] for s in d.get("sequential", [])
                                  if s.get("audio_s") == 2.0), None)})
        rows[kind] = vals
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/onchip")
    ap.add_argument("--pattern", default="r5")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    rows = collect(args.dir, args.pattern)
    out = {"pairs": rows}
    summary = {}
    for kind, vals in rows.items():
        rps = [v["rps"] for v in vals]
        if rps:
            summary[kind] = {
                "n": len(rps),
                "mean_rps": round(statistics.mean(rps), 2),
                "stdev_rps": round(statistics.stdev(rps), 2)
                if len(rps) > 1 else 0.0,
                "min_rps": round(min(rps), 2), "max_rps": round(max(rps), 2)}
    out["summary"] = summary
    live, bund = rows.get("live", []), rows.get("bundle", [])
    per_pair = [round(l["rps"] - b["rps"], 2)
                for l, b in zip(live, bund)]
    out["per_pair_live_minus_bundle_rps"] = per_pair
    if per_pair:
        wins = sum(1 for d in per_pair if d > 0)
        out["verdict"] = (
            f"live wins {wins}/{len(per_pair)} interleaved pairs"
            if wins * 2 != len(per_pair) else "split")
    text = json.dumps(out, indent=1)
    print(text)
    if args.out:
        Path(args.out).write_text(text)


if __name__ == "__main__":
    main()
