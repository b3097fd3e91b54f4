"""In-process stage-5..7 evaluation matrix (round 5).

Driving run.sh stage 5-7 once per (run, checkpoint, target) costs ~20 min
per row on the tunneled backend — five separate CLI processes each pay jax
startup + compile-cache load + first-dispatch latency.  This driver runs
the SAME five CLI mains with the SAME flags **in one process** (sys.argv
patched per call), so the fixed costs are paid once; rows are
method-identical to run.sh stage 5-7 and are written to the same output
trees incl. ``${obdir}/RESULT.${pair}`` files, so tools/gst_ab_summary.py
and tools/cer_real_summary.py work unchanged.

Jobs: every (run, target) in --runs x --targets at --ckpt, plus a
--ladder run's iter.N checkpoints on --ladder_target.  Jobs whose RESULT
file already exists are skipped (idempotent; composes with run.sh rows).

    python tools/eval_matrix.py --workspace /tmp/verify_vae2 \
        --runs gst_ab_p0,gst_ab_p1,gst_ab_p0s778,gst_ab_p1s778 \
        --targets TEF1,TEF2,TEM1,TEM2 --ladder gst_ab_p0
"""

import argparse
import contextlib
import io
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# run.sh front-end knobs (egs/vcc20/vae2/run.sh:13-18 + griffin_lim_iters)
FS, FMAX, FMIN, N_MELS, N_FFT, N_SHIFT = 24000, 7600, 80, 80, 1024, 256
GL_ITERS, MCEP_DIM, SHIFTMS = 64, 34, 5
SRC = "SEF1"


def _call(main, argv, label):
    """Run a CLI main with patched sys.argv; return its captured stdout."""
    buf = io.StringIO()
    old = sys.argv
    t0 = time.monotonic()
    try:
        sys.argv = [label] + [str(a) for a in argv]
        with contextlib.redirect_stdout(buf):
            main()
    finally:
        sys.argv = old
    out = buf.getvalue()
    print(f"  [{label} {time.monotonic() - t0:.0f}s] "
          f"{out.strip().splitlines()[-1] if out.strip() else ''}")
    return out


def eval_one(w, run, ckpt, target, shared, decode_knobs):
    """run.sh stage 5-7 for one (run, checkpoint, target); returns the
    RESULT line (also persisted), or None if it already exists."""
    rd = w / "egs/vcc20/vae2"
    exp = rd / "exp" / f"train_{run}"
    outdir = exp / f"outputs_{ckpt}"
    pair = f"{SRC}_{target}"
    obdir = Path(str(outdir) + ".ob_eval")
    result_file = obdir / f"RESULT.{pair}"
    if result_file.exists():
        print(f"[skip] {run}/{ckpt}/{target} (RESULT exists)")
        return None
    obdir.mkdir(parents=True, exist_ok=True)
    # per-row lock: two matrix processes may split the job list (e.g. chip
    # + CPU during a tunnel outage); O_EXCL keeps them off the same row
    lock = obdir / f".lock.{pair}"
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        if time.time() - lock.stat().st_mtime < 1800:
            print(f"[skip] {run}/{ckpt}/{target} (locked by another "
                  "matrix process)")
            return None
        # stale lock (>30 min): the holder died; take over
    print(f"[eval] {run}/{ckpt}/{target}")
    try:
        return _eval_one_locked(w, rd, run, ckpt, target, pair, outdir,
                                obdir, result_file, shared, decode_knobs)
    except Exception:
        # release the row lock so a retry (same process or another) can
        # take the row immediately instead of waiting out the stale window
        lock.unlink(missing_ok=True)
        raise
    finally:
        if result_file.exists():
            lock.unlink(missing_ok=True)


def _eval_one_locked(w, rd, run, ckpt, target, pair, outdir, obdir,
                     result_file, shared, decode_knobs):
    conf = rd / "conf" / f"{run}.yaml"
    exp = rd / "exp" / f"train_{run}"

    # ---- stage 5: trials + decode (bin/decode == run.sh:157-163)
    # Private shadow of dump/eval per process: run.sh regenerates
    # dump/eval/trials for the CURRENT target (the round-3 stale-trials
    # gotcha); two matrix processes (e.g. chip + CPU splitting the job
    # list) would race on that shared file otherwise.
    shadow = rd / f"dump/eval_mx{os.getpid()}"
    shadow.mkdir(exist_ok=True)
    for fname, srcdir in (("feats.scp", "dump/eval"),
                          ("utt2num_frames", "dump/eval"),
                          ("utt2spk", "dump/eval"),
                          ("text", "dump/eval"),
                          ("spk2spk_id", "dump/train")):
        fsrc = rd / srcdir / fname
        if fsrc.exists():
            (shadow / fname).write_bytes(fsrc.read_bytes())
    subprocess.run([sys.executable,
                    str(rd / "../vae1/local/make_trials.py"),
                    str(shadow), "-s", SRC, "-t", target],
                   check=True, cwd=rd)
    from vae_npvc_tpu.bin import decode as decode_cli
    _call(decode_cli.main,
          ["-c", conf, "--checkpoint", exp / ckpt,
           "--decode-dir", shadow,
           "--output-dir", outdir / pair], "decode")

    # ---- stage 6: denorm + Griffin-Lim (run.sh:166-202, voc=GL)
    denorm = Path(str(outdir) + "_denorm") / pair
    from vae_npvc_tpu.bin import apply_cmvn as cmvn_cli
    _call(cmvn_cli.main,
          ["apply", "--reverse", rd / "data/train_cmvn.ark",
           f"scp:{outdir / pair}/feats.scp", denorm], "apply_cmvn")
    from vae_npvc_tpu.bin import convert_fbank as gl_cli
    _call(gl_cli.main,
          ["--fs", FS, "--fmax", FMAX, "--fmin", FMIN, "--n_fft", N_FFT,
           "--n_shift", N_SHIFT, "--n_mels", N_MELS, "--iters", GL_ITERS,
           denorm / "feats.scp", denorm / "wav"], "griffin_lim")

    # ---- stage 7: MCD (wav-domain mcep, run.sh:213-228)
    (obdir / "asr" / pair).mkdir(parents=True, exist_ok=True)
    (obdir / "asv" / pair).mkdir(parents=True, exist_ok=True)
    from vae_npvc_tpu.eval.mcd import mcd_from_wavdirs
    f0_conf = rd / "conf" / f"{target}.f0"
    t0 = time.monotonic()
    try:
        mean, _ = mcd_from_wavdirs(
            str(denorm / "wav"), str(w / "corpus/vcc2020_eval" / target),
            f0_conf=str(f0_conf) if f0_conf.exists() else None,
            mcep_dim=MCEP_DIM, shiftms=SHIFTMS)
        mcd = f"{mean:.3f}"
    except ValueError:
        mcd = "n/a"
    print(f"  [mcd {time.monotonic() - t0:.0f}s] MCD: {mcd}")

    # ---- stage 7: CER/WER via the shared recognizer (run.sh:245-305)
    from vae_npvc_tpu.bin import eval_asr as asr_cli
    out = _call(asr_cli.main,
                ["--train_dir", rd / "dump/train",
                 "--eval_scp", outdir / pair / "feats.scp",
                 "--ref_text", rd / "data/eval/text",
                 "--output_dir", obdir / "asr" / pair,
                 "--steps", shared["asr_steps"],
                 "--arch", shared["asr_arch"],
                 "--recognizer_ckpt", shared["asr_ckpt"],
                 "--lm_ckpt", shared["lm_ckpt"], *decode_knobs], "eval_asr")
    m = re.search(r"CER: ([0-9.]+)\s+WER: ([0-9.]+)", out)
    cer, wer = (m.group(1), m.group(2)) if m else ("n/a", "n/a")

    # ---- stage 7: PLDA/COSSIM via the shared embedder (run.sh:318-331)
    from vae_npvc_tpu.bin import eval_similarity as sim_cli
    out = _call(sim_cli.main,
                ["-c", conf, "--train_dir", rd / "dump/train",
                 "--converted_scp", outdir / pair / "feats.scp",
                 "--trials", shadow / "trials",
                 "--enroll_dir", rd / "dump/train",
                 "--steps", shared["sim_steps"],
                 "--embedder_ckpt", shared["emb_ckpt"],
                 "--output_dir", obdir / "asv" / pair], "eval_similarity")
    mp = re.search(r"PLDA: ([-0-9.]+)\s+COSSIM: ([-0-9.]+)", out)
    plda, cossim = (mp.group(1), mp.group(2)) if mp else ("n/a", "n/a")

    line = (f"RESULT {pair}  MCD: {mcd}  CER: {cer}  WER: {wer}  "
            f"PLDA: {plda}  COSSIM: {cossim}")
    result_file.write_text(line + "\n")
    print(line)
    return line


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="/tmp/verify_vae2")
    ap.add_argument("--runs", default="gst_ab_p0,gst_ab_p1,"
                                      "gst_ab_p0s778,gst_ab_p1s778")
    ap.add_argument("--targets", default="TEF1,TEF2,TEM1,TEM2")
    ap.add_argument("--ckpt", default="model.loss.best")
    ap.add_argument("--ladder", default="",
                    help="run whose iter.* checkpoints also get evaluated")
    ap.add_argument("--ladder_target", default="TEF1")
    ap.add_argument("--ladder_iters",
                    default="1000,2000,3000,4000,5000,6000,7000,8000,"
                            "9000,10000")
    ap.add_argument("--shared_dir", default=None,
                    help="dir with ctc_strong/char_lm/spk_embedder.msgpack "
                         "(default <workspace>/.../exp/shared_eval)")
    ap.add_argument("--asr_arch", default="transformer")
    ap.add_argument("--asr_steps", default="12000")
    ap.add_argument("--sim_steps", default="1000")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    w = Path(args.workspace)
    sh = Path(args.shared_dir or w / "egs/vcc20/vae2/exp/shared_eval")
    shared = {"asr_ckpt": sh / "ctc_strong.msgpack",
              "lm_ckpt": sh / "char_lm.msgpack",
              "emb_ckpt": sh / "spk_embedder.msgpack",
              "asr_arch": args.asr_arch, "asr_steps": args.asr_steps,
              "sim_steps": args.sim_steps}
    # decode knobs from the reference-shaped yaml (run.sh:277-296)
    dconf = w / "egs/vcc20/vae2/conf/ob_eval/decode_asr.yaml"
    knob = {}
    if dconf.exists():
        for ln in dconf.read_text().splitlines():
            mm = re.match(r"^([a-z-]+):\s*([^#\s]+)", ln)
            if mm:
                knob[mm.group(1)] = mm.group(2)
    decode_knobs = ["--beam_size", knob.get("beam-size", "10"),
                    "--lm_weight", knob.get("lm-weight", "0.6"),
                    "--lm_type", knob.get("lm-type", "ngram"),
                    "--lm_order", knob.get("lm-order", "3"),
                    "--penalty", knob.get("penalty", "0.0")]

    def _reclaim():
        # each job builds fresh model/jit objects; drop the jit caches so a
        # 26-job matrix cannot accumulate device buffers (disk compile
        # cache keeps re-jits cheap)
        import gc

        import jax
        jax.clear_caches()
        gc.collect()

    lines, failed = [], []
    jobs = [(run, args.ckpt, t)
            for run in args.runs.split(",") if run
            for t in args.targets.split(",")]
    if args.ladder:
        jobs += [(args.ladder, f"iter.{n}", args.ladder_target)
                 for n in args.ladder_iters.split(",")]
    for run, ckpt, t in jobs:
        try:
            ln = eval_one(w, run, ckpt, t, shared, decode_knobs)
        except Exception as e:  # noqa: BLE001 — one bad row (missing
            # checkpoint, transient device failure) must not kill the matrix
            print(f"[fail] {run}/{ckpt}/{t}: {type(e).__name__}: {e}")
            failed.append(f"{run}/{ckpt}/{t}")
            continue
        if ln:
            lines.append({"run": run, "ckpt": ckpt, "target": t,
                          "line": ln})
            _reclaim()
    if failed:
        print(f"eval_matrix: {len(failed)} FAILED rows: {failed}")
    if args.out:
        Path(args.out).write_text(json.dumps(lines, indent=1))
    print(f"eval_matrix: {len(lines)} rows evaluated")
    if failed:
        sys.exit(1)      # nonzero so a retrying caller re-runs the matrix
        # (completed rows are skipped via their RESULT files)


if __name__ == "__main__":
    main()
