"""Deviation-vs-lookahead curve for APPROXIMATE chunked streaming
conversion (VERDICT r4 item 7).

serve/streaming.py's chunked mode converts mel chunk ``k`` from the prefix
``[0, (k+1)·chunk + lookahead)`` — GroupNorm statistics see that prefix
instead of the full utterance (exact streaming is impossible: reference
semantics make the statistics utterance-global, torch GroupNorm over full T,
reference model/layers.py:129-249).  This tool measures what that
approximation costs: for each (chunk, lookahead) it converts the eval
utterances both ways through the SAME engine and reports

- mel RMS deviation (dB-domain log-mel) + worst frame deviation,
- mel-cepstral distortion between exact and chunked output (the eval
  stack's mel-proxy MCD — DCT-of-log-mel, eval/mcd.py),
- the latency win: frames that must arrive before the FIRST chunk can
  convert (chunk + lookahead) vs the full utterance.

Run on a trained workspace (defaults target the round-5 A/B run):

    python tools/stream_approx_curve.py --workspace /tmp/verify_vae2 \
        --out /tmp/onchip/stream_approx.json
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="/tmp/verify_vae2")
    ap.add_argument("--run", default="train_gst_ab_p0")
    ap.add_argument("--ckpt", default="model.loss.best")
    ap.add_argument("--target", default="TEF1")
    ap.add_argument("--n_utts", type=int, default=6)
    ap.add_argument("--concat", type=int, default=8,
                    help="concatenate N corpus files per measured stream "
                         "(the synthetic eval utterances are <1 s; chunked "
                         "streaming only matters on longer audio)")
    ap.add_argument("--chunks", default="64,128")
    ap.add_argument("--lookaheads", default="0,16,32,64,128,256")
    ap.add_argument("--platform", default=None,
                    help="cpu to force CPU (e.g. while the chip is busy)")
    ap.add_argument("--tiny", action="store_true",
                    help="self-contained toy model smoke (no workspace)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    if args.platform:
        import os
        os.environ["VAE_NPVC_JAX_PLATFORM"] = args.platform

    import numpy as np

    from vae_npvc_tpu.serve.engine import ConversionEngine
    from vae_npvc_tpu.serve.streaming import StreamingSession

    if args.tiny:
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from tests.test_serve import FEAT
        from tests.toy_config import toy_config
        from vae_npvc_tpu.train.trainer import Trainer
        import tempfile
        cfg = toy_config()
        tr = Trainer(cfg)
        rng = np.random.default_rng(0)
        b = (rng.normal(size=(2, 32, 10)).astype(np.float32),
             np.zeros((2,), np.int32))
        tr.init_state(b)
        tr.train_step(b)
        ck = Path(tempfile.mkdtemp()) / "m.ckpt"
        tr.save_checkpoint(ck)
        stats = np.zeros((2, 11), np.float64)
        stats[0, -1] = 1000.0
        stats[0, :-1] = -3.0 * 1000
        stats[1, :-1] = (1.0 + 9.0) * 1000
        eng = ConversionEngine(cfg, ck, stats, feature=FEAT,
                               spk2spk_id={"A": 0, "B": 1}, vocoder="none",
                               bucket_frames=32)
        fs = FEAT["fs"]
        wavs = [(f"toy{i}", (np.random.default_rng(i).normal(
            size=(9000 + 2048 * i,)) * 0.1).astype(np.float32))
            for i in range(2)]
        target = "B"
    else:
        import yaml
        w = Path(args.workspace) / "egs/vcc20/vae2"
        # run "train_<name>" trains from conf/<name>.yaml (run.sh contract)
        conf = w / f"conf/{args.run.removeprefix('train_')}.yaml"
        cfg = yaml.safe_load(conf.read_text())
        exp = w / "exp" / args.run
        dump = w / "dump/train"
        eng = ConversionEngine(cfg, exp / args.ckpt,
                               str(w / "data/train_cmvn.ark"),
                               spk2spk_id=str(dump / "spk2spk_id"),
                               vocoder="none")
        fs = eng.fs
        # eval wavs from the corpus (the same ones run.sh stage 5 converts)
        import wave as wavmod
        eval_wavs = sorted(
            (Path(args.workspace) / "corpus/vcc2020/SEF1").glob("*.wav"))
        if not eval_wavs:
            eval_wavs = sorted(
                (Path(args.workspace) / "corpus").rglob("SEF1/*.wav"))
        pieces = []
        for p in eval_wavs[:args.n_utts * max(1, args.concat)]:
            with wavmod.open(str(p)) as f:
                n = f.getnframes()
                pieces.append((p.stem, np.frombuffer(
                    f.readframes(n), np.int16).astype(np.float32) / 32768.0))
        k = max(1, args.concat)
        wavs = [(pieces[i][0] + f"+{k}",
                 np.concatenate([x for _, x in pieces[i:i + k]]))
                for i in range(0, len(pieces) - k + 1, k)][:args.n_utts]
        target = args.target

    from vae_npvc_tpu.eval.mcd import mcd as mel_proxy_mcd_dtw

    def mel_proxy_mcd(a, b):
        # same frame grid by construction — no DTW, frame-aligned distortion
        return float(mel_proxy_mcd_dtw(a, b, use_dtw=False))

    rows = []
    exact = {}
    for name, x in wavs:
        mel, _ = eng.convert(x, fs, target, return_mel=True)
        exact[name] = mel
    for C in [int(c) for c in args.chunks.split(",")]:
        for L in [int(v) for v in args.lookaheads.split(",")]:
            devs, mcds, worst = [], [], 0.0
            for name, x in wavs:
                s = StreamingSession(eng, target, fs, chunk_frames=C,
                                     lookahead_frames=L)
                s.feed(x)
                (_, mel), = list(s.finish())
                want = exact[name]
                T = min(mel.shape[0], want.shape[0])
                d = mel[:T] - want[:T]
                devs.append(float(np.sqrt(np.mean(d ** 2))))
                worst = max(worst, float(np.abs(d).max()))
                mcds.append(mel_proxy_mcd(mel[:T], want[:T]))
            row = {"chunk": C, "lookahead": L,
                   "first_emit_after_frames": C + L,
                   "mel_rms_dev": round(float(np.mean(devs)), 5),
                   "mel_worst_abs_dev": round(worst, 4),
                   "mcd_vs_exact": round(float(np.mean(mcds)), 4),
                   "n_utts": len(wavs)}
            rows.append(row)
            print(json.dumps(row))
    out = {"rows": rows,
           "exact_rms_scale": round(float(np.mean(
               [np.sqrt(np.mean(m ** 2)) for m in exact.values()])), 4)}
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1))
    eng.close()


if __name__ == "__main__":
    main()
