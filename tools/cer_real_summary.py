"""Proxy-CER calibration on REAL conversion outputs (VERDICT r4 item 3).

The CTC-proxy recognizer was previously calibrated only on synthetic
Gaussian corruption (tools/cer_calibration.py).  tools/r5_queue.sh converts
and evaluates the p0 seed-777 flagship run at every training checkpoint
(iter.1000..10000, a natural quality ladder) with ONE shared strong
recognizer; this summary rank-correlates the proxy CER against the
independent quality metrics (MCD: lower = better, expect positive Spearman;
COSSIM: higher = better, expect negative) across those >=10 real
conversions.  |rho| >= ~0.6 with the expected signs means the CER column of
RESULT lines ranks real conversion quality, not just synthetic noise.
Reference context: the reference scores with a downloaded pretrained ESPnet
ASR (egs/vcc20/vae1/local/ob_eval/evaluate.sh:133-155), unreachable
zero-egress.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _results import parse_result_file, spearman  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="/tmp/verify_vae2")
    ap.add_argument("--run", default="train_gst_ab_p0")
    ap.add_argument("--pair", default="SEF1_TEF1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    exp = Path(args.workspace) / "egs/vcc20/vae2/exp" / args.run

    ladder = []
    for d in sorted(exp.glob("outputs_iter.*.ob_eval")):
        it = int(d.name.split("iter.")[1].split(".")[0])
        f = d / f"RESULT.{args.pair}"
        if f.exists():
            r = parse_result_file(f)
            if r:
                ladder.append({"iter": it, **r})
    ladder.sort(key=lambda r: r["iter"])

    out = {"run": args.run, "pair": args.pair, "n": len(ladder),
           "ladder": ladder}
    usable = [r for r in ladder
              if all(r[k] is not None for k in ("CER", "MCD", "COSSIM"))]
    if len(usable) >= 3:
        cer = [r["CER"] for r in usable]
        out["spearman"] = {
            "cer_vs_mcd": round(spearman(cer, [r["MCD"] for r in usable]), 3),
            "cer_vs_cossim": round(
                spearman(cer, [r["COSSIM"] for r in usable]), 3),
            "cer_vs_wer": round(
                spearman(cer, [r["WER"] for r in usable]), 3)
            if all(r["WER"] is not None for r in usable) else None,
        }
        out["cer_range"] = [min(cer), max(cer)]
        wers = [r["WER"] for r in usable if r["WER"] is not None]
        out["wer_range"] = [min(wers), max(wers)] if wers else None
    text = json.dumps(out, indent=1)
    print(text)
    if args.out:
        Path(args.out).write_text(text)


if __name__ == "__main__":
    main()
