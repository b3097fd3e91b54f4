"""CER-proxy calibration: noise-degradation sweep (VERDICT r2 weak item 6).

The in-framework CTC proxy makes the reference metric line's CER/WER columns
computable offline (the reference's downloaded LibriSpeech transformer ASR,
egs/vcc20/vae1/local/ob_eval/evaluate.sh:72-155, cannot be fetched in a
zero-egress environment). That makes proxy-CER a *ranking* signal; this tool
anchors it by measuring how the proxy degrades under controlled corruption of
held-out features, the way a real recognizer's CER degrades with SNR:

- split a transcribed dump dir into train/held-out utterances;
- train the proxy (conv or transformer arch) on the train split only;
- corrupt the held-out mels with additive Gaussian noise at increasing
  fractions of the per-corpus feature std (NOISE_SIGMAS: 0, .25, .5,
  1, 1.25, 1.5, 1.75, 2, 3)
  and with frame dropout at increasing rates (p = .1, .2, .4);
- report CER per corruption level.

A useful proxy must be (a) near-0 on clean held-out speech it never saw in
training — i.e. it generalizes rather than memorizes; (b) monotonically
worse with corruption; (c) saturating toward ~100 at extreme noise. The
committed study (README "CER-proxy calibration") shows all three hold.

Usage (CPU ok):
  PYTHONPATH=/root/repo python tools/cer_calibration.py \
      --data_dir <dump dir with feats.scp + text> [--arch conv]
      [--steps 3000] [--holdout 20] [--out /tmp/cer_calibration.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

NOISE_SIGMAS = [0.0, 0.25, 0.5, 1.0, 1.25, 1.5, 1.75, 2.0, 3.0]
DROP_RATES = [0.1, 0.2, 0.4]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True,
                    help="dir with feats.scp + text (e.g. the vcc20 recipe's "
                         "dump/train with the corpus transcription master)")
    ap.add_argument("--arch", default="conv",
                    choices=["conv", "transformer"])
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--holdout", type=int, default=20,
                    help="number of held-out utterances (never trained on)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()

    import os
    os.environ.setdefault("VAE_NPVC_JAX_PLATFORM", args.platform)

    from vae_npvc_tpu.data import kaldi_io
    from vae_npvc_tpu.eval import wer
    from vae_npvc_tpu.eval.asr import train_ctc

    data_dir = Path(args.data_dir)
    scp = kaldi_io.read_scp(data_dir / "feats.scp")
    texts = kaldi_io.load_dict_data(data_dir / "text")
    utts = sorted(u for u in scp if u in texts)
    rng = np.random.default_rng(args.seed)
    n_held = min(args.holdout, len(utts) // 4)
    if n_held < 1:
        raise SystemExit(
            f"need >= 4 transcribed utterances to hold any out "
            f"(got {len(utts)} in {data_dir}) — nothing to calibrate against")
    held = sorted(rng.choice(utts, size=n_held, replace=False))
    held_set = set(held)
    train_utts = [u for u in utts if u not in held_set]

    # write the train-only split dir for train_ctc
    tr = Path("/tmp/cer_calib_train")
    tr.mkdir(parents=True, exist_ok=True)
    with open(tr / "feats.scp", "w") as fs, open(tr / "text", "w") as tf:
        for u in train_utts:
            fs.write(f"{u} {scp[u]}\n")
            tf.write(f"{u} {texts[u]}\n")
    print(f"train {len(train_utts)} utts / held-out {len(held)} utts")

    rec = train_ctc(tr, steps=args.steps, width=args.width, seed=args.seed,
                    log_every=max(args.steps // 4, 1), arch=args.arch)

    held_feats = {u: kaldi_io.load_mat(scp[u]) for u in held}
    feat_std = float(np.std(np.concatenate(
        [m for m in held_feats.values()], axis=0)))
    held_texts = {u: texts[u] for u in held}

    def cer_of(feats):
        d = Path("/tmp/cer_calib_eval")
        d.mkdir(exist_ok=True)
        with kaldi_io.ArkWriter(d / "feats.ark", d / "feats.scp") as w:
            for u, m in feats.items():
                w.write(u, m.astype(np.float32))
        hyps = rec.transcribe_scp(d / "feats.scp", batch_size=8)
        total, _, _ = wer.score(held_texts, hyps, "char")
        return round(total.err_pct, 2)

    rows = []
    crng = np.random.default_rng(args.seed + 1)
    for sigma in NOISE_SIGMAS:
        noisy = {u: m + sigma * feat_std
                 * crng.normal(size=m.shape).astype(np.float32)
                 for u, m in held_feats.items()}
        cer = cer_of(noisy)
        rows.append({"corruption": f"gauss sigma={sigma}x std", "cer": cer})
        print(f"gauss {sigma:>5}x std : CER {cer}")
    for p in DROP_RATES:
        dropped = {u: m * (crng.uniform(size=(m.shape[0], 1)) >= p)
                   for u, m in held_feats.items()}
        cer = cer_of(dropped)
        rows.append({"corruption": f"frame dropout p={p}", "cer": cer})
        print(f"drop  p={p:<9}: CER {cer}")

    clean = rows[0]["cer"]
    gauss = [r["cer"] for r in rows[:len(NOISE_SIGMAS)]]
    monotone = all(b >= a - 1e-9 for a, b in zip(gauss, gauss[1:]))
    summary = {"arch": args.arch, "held_out": len(held),
               "clean_cer": clean, "monotone_gauss": bool(monotone),
               "rows": rows}
    print(json.dumps(summary))
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
