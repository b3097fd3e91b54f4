"""GST scale-anchor A/B summary, spread-bounded (VERDICT r4 item 4).

Collects the 2 configs (gst_scale_penalty 0 = p0 vs 1e-4 = p1) x 2 seeds
(777 / 778) x 4 VCC2020-English-target RESULT rows produced by
tools/r5_queue.sh, all scored with ONE shared recognizer/LM/embedder, and
reports per-target anchor deltas (p1 - p0) per seed plus the across-seed
spread — turning round-4's "within run-to-run spread" claim into a
measurement.  Also reports each run's grad-spike count and gst_in_rms
first/last (the fp32-range argument's inputs) from metrics.jsonl.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _results import parse_result_file  # noqa: E402

TARGETS = ("TEF1", "TEF2", "TEM1", "TEM2")
RUNS = {("p0", 777): "train_gst_ab_p0", ("p1", 777): "train_gst_ab_p1",
        ("p0", 778): "train_gst_ab_p0s778",
        ("p1", 778): "train_gst_ab_p1s778"}


def run_stats(exp_dir):
    path = exp_dir / "metrics.jsonl"
    if not path.exists():
        return {}
    rows = [json.loads(l) for l in path.read_text().splitlines() if l.strip()]
    train = [r for r in rows if r.get("split") == "train"]
    valid = [r for r in rows if r.get("split") == "valid"]
    gn = [r["grad_norm"] for r in train if r.get("grad_norm")]
    med = sorted(gn)[len(gn) // 2] if gn else float("nan")
    rms = [(r["iter"], r["gst_in_rms"]) for r in train
           if r.get("gst_in_rms") is not None]
    return {"grad_spikes": sum(1 for g in gn if g > 2 * med),
            "grad_steps": len(gn), "grad_norm_median": med,
            "gst_in_rms_first": rms[0] if rms else None,
            "gst_in_rms_last": rms[-1] if rms else None,
            "best_valid_X_like": min((r.get("X like", float("inf"))
                                      for r in valid), default=None)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="/tmp/verify_vae2")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    exp = Path(args.workspace) / "egs/vcc20/vae2/exp"

    results, runs = {}, {}
    for (cfg, seed), name in RUNS.items():
        runs[f"{cfg}_s{seed}"] = run_stats(exp / name)
        for t in TARGETS:
            f = (exp / name / "outputs_model.loss.best.ob_eval"
                 / f"RESULT.SEF1_{t}")
            if f.exists():
                results[(cfg, seed, t)] = parse_result_file(f)

    # per-target anchor deltas (p1 - p0), per seed, + across-seed spread
    deltas = {}
    for t in TARGETS:
        row = {}
        for metric in ("MCD", "CER", "WER", "COSSIM", "PLDA"):
            per_seed = {}
            for seed in (777, 778):
                a = results.get(("p0", seed, t))
                b = results.get(("p1", seed, t))
                if a and b and a[metric] is not None and b[metric] is not None:
                    per_seed[str(seed)] = round(b[metric] - a[metric], 4)
            if per_seed:
                vals = list(per_seed.values())
                row[metric] = {"per_seed": per_seed,
                               "mean": round(sum(vals) / len(vals), 4),
                               "spread": round(max(vals) - min(vals), 4)}
        deltas[t] = row

    # the per-config across-seed spread of the RAW metric (run-to-run noise
    # floor the deltas must clear)
    noise = {}
    for metric in ("MCD", "CER", "COSSIM"):
        diffs = []
        for cfg in ("p0", "p1"):
            for t in TARGETS:
                a = results.get((cfg, 777, t))
                b = results.get((cfg, 778, t))
                if a and b and a[metric] is not None and b[metric] is not None:
                    diffs.append(abs(b[metric] - a[metric]))
        if diffs:
            noise[metric] = {"mean_abs_seed_diff": round(
                sum(diffs) / len(diffs), 4),
                "max_abs_seed_diff": round(max(diffs), 4), "n": len(diffs)}

    out = {"rows": {f"{c}_s{s}_{t}": r
                    for (c, s, t), r in sorted(results.items(),
                                               key=lambda kv: str(kv[0]))},
           "anchor_delta_p1_minus_p0": deltas,
           "seed_noise_floor": noise,
           "run_stats": runs,
           "n_rows": len(results), "n_expected": len(RUNS) * len(TARGETS)}
    text = json.dumps(out, indent=1)
    print(text)
    if args.out:
        Path(args.out).write_text(text)


if __name__ == "__main__":
    main()
