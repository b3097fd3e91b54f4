"""End-to-end toy slice: data dir → train CLI → decode CLI → converted arks.

The reference has no tests at all (SURVEY.md §4); its de-facto smoke test is the
full VCC2020 recipe (egs/vcc20/vae1/test.sh). This is the CPU-runnable analog:
a synthetic Kaldi data dir, a few training iterations through the real CLI code
path, then conversion over a trials file.
"""

import argparse
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.smoke  # fast tier: pytest -m smoke

from vae_npvc_tpu.data import kaldi_io

TINY_CONFIG = {
    "trainer_type": "vae_npvc.trainer.basic",
    "dataset_type": "vae_npvc.dataset.utt2mel_spk",
    "max_iter": 12,
    "iters_per_checkpoint": 10,
    "iters_per_log": 5,
    "seed": 7,
    "num_jobs": 2,
    "prefetch_factor": 2,
    "batch_size": 4,
    "crop_length": 32,
    "optim_type": "Adam",
    "learning_rate": 1e-3,
    "max_grad_norm": 10,
    "lr_scheduler": "StepLR",
    "lr_param": {"step_size": 10, "gamma": 0.5},
    "model_type": "vae_npvc.model.vqvae",
    "y_dim": 8, "y_num": 3, "z_dim": 8, "z_num": 16,
    "use_ema": True, "beta": 0.01, "mu": 0.9, "jitter_p": 0.1,
    "encoder": {"in_channels": [10], "out_channels": [12], "kernel_size": 3,
                "downsample_scales": [1], "z_channels": 8, "dilation": False,
                "stack_kernel_size": 3, "stack_layers": 1, "stacks": [1],
                "use_weight_norm": True},
    "decoder": {"in_channels": [8], "out_channels": [12], "cond_channels": 8,
                "skip_channels": 8, "final_channels": 10, "kernel_size": 3,
                "upsample_scales": [1], "dilation": False,
                "stack_kernel_size": 3, "stacks": [1],
                "use_weight_norm": True},
}


def make_data_dir(root: Path, name, n_utts, n_spk, dim=10, seed=0):
    rng = np.random.default_rng(seed)
    d = root / name
    d.mkdir(parents=True)
    with kaldi_io.ArkWriter(d / "feats_src.ark", d / "feats.scp") as w, \
            open(d / "utt2num_frames", "w") as unf, \
            open(d / "utt2spk_id", "w") as u2s, \
            open(d / "utt2spk", "w") as u2sname:
        for i in range(n_utts):
            T = int(rng.integers(20, 60))
            spk = i % n_spk
            mat = rng.normal(size=(T, dim)).astype(np.float32) + spk
            utt = f"utt{i:03d}"
            w.write(utt, mat)
            unf.write(f"{utt} {T}\n")
            u2s.write(f"{utt} {spk}\n")
            u2sname.write(f"{utt} spk{spk}\n")
    return d


@pytest.fixture(scope="module")
def toy_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("toy")
    train_dir = make_data_dir(root, "train", 16, 3)
    valid_dir = make_data_dir(root, "valid", 4, 3, seed=1)
    return root, train_dir, valid_dir


def test_train_then_decode(toy_env):
    import yaml

    from vae_npvc_tpu.bin.train import train as train_cli
    from vae_npvc_tpu.bin.decode import decode as decode_cli

    root, train_dir, valid_dir = toy_env
    conf = root / "conf.yaml"
    conf.write_text(yaml.safe_dump(TINY_CONFIG))
    out_dir = root / "exp"

    train_cli(argparse.Namespace(
        config=str(conf), output_dir=str(out_dir), checkpoint=None,
        train_dir=str(train_dir), valid_dir=str(valid_dir), gpu=None))

    ckpts = sorted(out_dir.glob("iter.*"))
    assert ckpts, "no checkpoint written"
    assert (out_dir / "model.loss.best").exists()
    assert (out_dir / "train.log").exists()
    log = (out_dir / "train.log").read_text()
    assert "X like" in log and "Iter" in log

    # machine-readable metrics mirror: one JSON object per log/valid window
    import json as _json
    lines = [_json.loads(ln) for ln in
             (out_dir / "metrics.jsonl").read_text().splitlines()]
    assert any(m["split"] == "train" and "X like" in m
               and "frames_per_sec" in m for m in lines)
    assert any(m["split"] == "valid" and "best_iter" in m for m in lines)
    assert all(m["iter"] > 0 for m in lines)

    # --- decode over a trials file
    decode_dir = root / "decode_in"
    decode_dir.mkdir()
    feats = kaldi_io.load_dict_data(valid_dir / "feats.scp")
    utts = list(feats)[:3]
    with open(decode_dir / "trials", "w") as f:
        for u in utts:
            f.write(f"{u} spkA\n")
    (decode_dir / "feats.scp").write_text(
        "".join(f"{u} {feats[u]}\n" for u in utts))
    (decode_dir / "spk2spk_id").write_text("spkA 1\n")

    dec_out = root / "decode_out"
    decode_cli(argparse.Namespace(
        config=str(conf), output_dir=str(dec_out),
        checkpoint=str(out_dir / "model.loss.best"),
        decode_dir=str(decode_dir), gpu=None))

    out_scp = kaldi_io.load_dict_data(dec_out / "feats.scp")
    assert set(out_scp) == set(utts)
    for u in utts:
        mat = kaldi_io.load_mat(out_scp[u])
        src_rows = kaldi_io.matrix_header(feats[u])[0]
        assert mat.shape == (src_rows, 10)
        assert np.all(np.isfinite(mat))


def test_resume_restores_iteration(toy_env):
    import yaml

    from vae_npvc_tpu.bin.train import train as train_cli

    root, train_dir, valid_dir = toy_env
    conf = root / "conf_resume.yaml"
    cfg = dict(TINY_CONFIG, max_iter=15)
    conf.write_text(yaml.safe_dump(cfg))
    out_dir = root / "exp_resume"

    train_cli(argparse.Namespace(
        config=str(conf), output_dir=str(out_dir), checkpoint=None,
        train_dir=str(train_dir), valid_dir=None, gpu=None))
    assert (out_dir / "iter.10").exists()

    # resume from iter.10 — reference loses the internal counter (SURVEY §3.1);
    # we restore it, so training continues to max_iter and saves nothing < 10
    cfg2 = dict(cfg, max_iter=20)
    conf2 = root / "conf_resume2.yaml"
    conf2.write_text(yaml.safe_dump(cfg2))
    train_cli(argparse.Namespace(
        config=str(conf2), output_dir=str(out_dir),
        checkpoint=str(out_dir / "iter.10"),
        train_dir=str(train_dir), valid_dir=None, gpu=None))
    assert (out_dir / "iter.20").exists()

    # metrics.jsonl must not carry duplicate/conflicting windows from the
    # pre-resume run: rows with iter > the resume point are truncated
    import json as _json
    iters = [_json.loads(ln)["iter"] for ln in
             (out_dir / "metrics.jsonl").read_text().splitlines()
             if _json.loads(ln)["split"] == "train"]
    assert iters == sorted(iters) and len(set(iters)) == len(iters)


def test_resume_keeps_best_across_restart(toy_env):
    """A preemption resume must not crown a later, worse validation iterate
    as model.loss.best: best-so-far persists in exp/best.json (the reference
    restarts its in-memory best on every launch, bin/train.py:110-113)."""
    import json

    import yaml

    from vae_npvc_tpu.bin.train import train as train_cli

    root, train_dir, valid_dir = toy_env
    cfg = dict(TINY_CONFIG, max_iter=10)
    conf = root / "conf_best.yaml"
    conf.write_text(yaml.safe_dump(cfg))
    out_dir = root / "exp_best"

    train_cli(argparse.Namespace(
        config=str(conf), output_dir=str(out_dir), checkpoint=None,
        train_dir=str(train_dir), valid_dir=str(valid_dir), gpu=None))
    best = json.loads((out_dir / "best.json").read_text())
    assert best["iteration"] == 10
    assert best["check_loss_kind"] == "X like"

    # forge an unbeatably-good recorded best at iter.10, then resume: the
    # run's later validations (iter.20) must NOT displace it
    best["loss"]["X like"] = -1e9
    (out_dir / "best.json").write_text(json.dumps(best))
    cfg2 = dict(cfg, max_iter=20)
    conf2 = root / "conf_best2.yaml"
    conf2.write_text(yaml.safe_dump(cfg2))
    train_cli(argparse.Namespace(
        config=str(conf2), output_dir=str(out_dir), checkpoint="auto",
        train_dir=str(train_dir), valid_dir=str(valid_dir), gpu=None))

    log = (out_dir / "train.log").read_text()
    assert "Best-so-far restored: iteration 10" in log
    assert "Best model: iteration 10" in log
    assert (out_dir / "model.loss.best").read_bytes() == \
        (out_dir / "iter.10").read_bytes()
    # the forged record survives (nothing beat it), still pointing at 10
    assert json.loads((out_dir / "best.json").read_text())["iteration"] == 10


def test_make_spk_id_and_subset(toy_env, tmp_path):
    from vae_npvc_tpu.bin.make_spk_id import make_spk_id
    from vae_npvc_tpu.bin.subset_data_into_tr_cv import subset

    root, train_dir, valid_dir = toy_env
    # spk2utt required by make_spk_id
    spk2utt = {}
    for utt, spk in kaldi_io.load_dict_data(train_dir / "utt2spk").items():
        spk2utt.setdefault(spk, []).append(utt)
    with open(train_dir / "spk2utt", "w") as f:
        for spk, utts in spk2utt.items():
            f.write(f"{spk} {' '.join(utts)}\n")
    (train_dir / "spk2spk_id").unlink(missing_ok=True)
    mapping = make_spk_id(train_dir)
    assert len(mapping) == 3
    ids = kaldi_io.load_dict_data(train_dir / "utt2spk_id")
    assert len(ids) == 16
    assert all(v.isdigit() for v in ids.values())

    tr, cv = tmp_path / "tr", tmp_path / "cv"
    subset(train_dir, tr, cv, 10, 4, seed=3)
    assert len(kaldi_io.load_dict_data(tr / "feats.scp")) == 10
    assert len(kaldi_io.load_dict_data(cv / "feats.scp")) == 4
    overlap = (set(kaldi_io.load_dict_data(tr / "feats.scp"))
               & set(kaldi_io.load_dict_data(cv / "feats.scp")))
    assert not overlap


def test_nonfinite_update_guard(toy_env):
    """A batch that produces non-finite grads must not poison the state."""
    import jax

    from vae_npvc_tpu.train.trainer import Trainer

    root, train_dir, valid_dir = toy_env
    cfg = dict(TINY_CONFIG)
    tr = Trainer(cfg)
    rng = np.random.default_rng(0)
    good = (rng.normal(size=(4, 32, 10)).astype(np.float32),
            np.zeros((4,), np.int32))
    tr.init_state(good)
    tr.train_step(good)
    before = jax.device_get(tr.state.params)

    bad_feats = good[0].copy()
    bad_feats[0, 0, 0] = np.nan
    d = tr.train_step((bad_feats, good[1]))
    assert float(d["skipped_nonfinite"]) == 1.0
    after = jax.device_get(tr.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)
    # and training continues normally afterwards
    d = tr.train_step(good)
    assert float(d.get("skipped_nonfinite", 0.0)) == 0.0
    assert np.isfinite(float(d["Total"]))
