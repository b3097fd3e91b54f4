"""Trainer.train_steps (K-steps-per-dispatch lax.scan) equivalence tests.

The scan body is ``_train_step`` itself, so K chained steps in one dispatch
must match K sequential ``train_step`` calls exactly — same rng derivation
(fold by ``state.step``), same EMA mutation, same optimizer trajectory.
Mirrors the vocoder trainer's dispatch-equivalence coverage (test_pwg.py).
"""

import numpy as np
import pytest

from tests.toy_config import toy_config
from vae_npvc_tpu.train.trainer import Trainer


def _batches(n, b=8, t=16, d=10, seed=0):
    rng = np.random.default_rng(seed)
    return [(rng.normal(size=(b, t, d)).astype(np.float32),
             rng.integers(0, 3, size=(b,)).astype(np.int32))
            for n_ in range(n)]


def _leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


class TestTrainStepsEquivalence:
    def test_scan_matches_sequential(self):
        K = 4
        batches = _batches(K)

        seq = Trainer(toy_config())
        seq.init_state(batches[0])
        seq_details = [seq.train_step(b) for b in batches]

        scan = Trainer(toy_config())
        scan.init_state(batches[0])
        detail = scan.train_steps(batches)

        assert scan.iteration == seq.iteration == K
        assert int(scan.state.step) == K

        # per-step losses match the sequential path (same ops; bitwise
        # equality is not promised across distinct XLA programs, so the
        # tolerance matches the vocoder scan-equivalence test's)
        for k in ("Total", "grad_norm"):
            got = np.asarray(detail[k])
            want = np.asarray([float(d[k]) for d in seq_details])
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7,
                                       err_msg=k)

        # final params / EMA state / optimizer state match
        for a, b in zip(_leaves(seq.state.params), _leaves(scan.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        for a, b in zip(_leaves(seq.state.ema), _leaves(scan.state.ema)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        for a, b in zip(_leaves(seq.state.opt_state),
                        _leaves(scan.state.opt_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_chunked_matches_sequential(self):
        """K=3 then K=2 chunks (different scan shapes) == 5 sequential."""
        batches = _batches(5, seed=1)

        seq = Trainer(toy_config())
        seq.init_state(batches[0])
        for b in batches:
            seq.train_step(b)

        scan = Trainer(toy_config())
        scan.init_state(batches[0])
        scan.train_steps(batches[:3])
        scan.train_steps(batches[3:])

        assert scan.iteration == 5
        for a, b in zip(_leaves(seq.state.params), _leaves(scan.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_accepts_device_and_stacked_inputs(self):
        import jax

        batches = _batches(3, seed=2)
        t1 = Trainer(toy_config())
        t1.init_state(batches[0])
        d_host = t1.train_steps(batches)

        # pre-sharded device batches (the prefetch_to_device form)
        t2 = Trainer(toy_config())
        t2.init_state(batches[0])
        dev = [t2.shard_batch(b) for b in batches]
        d_dev = t2.train_steps(dev)

        # pre-stacked (K, B, ...) tuple
        t3 = Trainer(toy_config())
        t3.init_state(batches[0])
        stacked = t3.shard_batches(batches)
        assert isinstance(stacked[0], jax.Array)
        assert stacked[0].shape[0] == 3
        d_stk = t3.train_steps(stacked)

        for d in (d_dev, d_stk):
            np.testing.assert_allclose(np.asarray(d["Total"]),
                                       np.asarray(d_host["Total"]),
                                       rtol=0, atol=0)

    def test_sharded_on_virtual_mesh(self):
        """Batch divisible by the 8-device mesh: scan runs sharded."""
        import jax
        from jax.sharding import Mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        batches = _batches(3, b=16, seed=3)

        seq = Trainer(toy_config(), mesh=mesh)
        seq.init_state(batches[0])
        for b in batches:
            seq.train_step(b)

        scan = Trainer(toy_config(), mesh=mesh)
        scan.init_state(batches[0])
        stacked = scan.shard_batches(batches)
        # data axis sharded, leading K axis not
        assert "data" in str(stacked[0].sharding.spec)
        scan.train_steps(stacked)

        for a, b in zip(_leaves(seq.state.params), _leaves(scan.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


class TestTrainCliStepsPerCall:
    def test_cli_runs_with_steps_per_call(self, tmp_path):
        """bin/train with steps_per_call=4: same checkpoints/iterations."""
        import yaml

        from vae_npvc_tpu.bin.train import train
        from vae_npvc_tpu.data.kaldi_io import ArkWriter

        rng = np.random.default_rng(0)
        data = tmp_path / "data"
        data.mkdir()
        with ArkWriter(str(data / "feats.ark"),
                       str(data / "feats.scp")) as w:
            for i in range(6):
                w.write(f"utt{i}", rng.normal(size=(24, 10)).astype(np.float32))
        with open(data / "utt2num_frames", "w") as f:
            for i in range(6):
                f.write(f"utt{i} 24\n")
        with open(data / "utt2spk_id", "w") as f:
            for i in range(6):
                f.write(f"utt{i} {i % 3}\n")

        cfg = dict(toy_config(), batch_size=2, crop_length=16,
                   max_iter=10, iters_per_checkpoint=5, iters_per_log=5,
                   steps_per_call=4, num_jobs=0)
        cfg_path = tmp_path / "conf.yaml"
        yaml.safe_dump(cfg, open(cfg_path, "w"))

        class Args:
            config = str(cfg_path)
            output_dir = str(tmp_path / "exp")
            checkpoint = None
            train_dir = str(data)
            valid_dir = None
            profile_dir = None

        train(Args())
        out = tmp_path / "exp"
        # chunking must land exactly on the checkpoint boundaries
        assert (out / "iter.5").exists()
        assert (out / "iter.10").exists()
        assert (out / "model.loss.best").exists()
        log = (out / "train.log").read_text()
        assert "Iter 5:" in log and "Iter 10:" in log
