"""Distributed-path tests on the virtual 8-device CPU mesh.

The TPU-native analog of fake-backend tests (the reference has no distributed
code or tests at all, SURVEY.md §2.4/§4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from vae_npvc_tpu.parallel import halo as halo_mod
from vae_npvc_tpu.parallel.mesh import (batch_sharding, data_mesh, make_mesh,
                                        replicated)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

TINY = {
    "model_type": "vae_npvc.model.vqvae",
    "seed": 7,
    "y_dim": 8, "y_num": 3, "z_dim": 8, "z_num": 16,
    "use_ema": True, "beta": 0.01, "mu": 0.9, "jitter_p": 0.0,
    "optim_type": "Adam", "learning_rate": 1e-3, "max_grad_norm": 10,
    "use_pallas_vq": False, "use_native_loader": False,
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


class TestMeshHelpers:
    def test_make_mesh_axes(self):
        mesh = make_mesh(n_data=4, n_model=2)
        assert dict(mesh.shape) == {"data": 4, "model": 2}
        mesh1 = data_mesh()
        assert dict(mesh1.shape) == {"data": 8}
        assert batch_sharding(mesh1).spec == P("data")
        assert replicated(mesh1).spec == P()


class TestExplicitShardMapStep:
    def test_matches_gspmd_step(self):
        from vae_npvc_tpu.parallel.shard import make_shard_map_step
        from vae_npvc_tpu.train.trainer import Trainer

        rng = np.random.default_rng(0)
        batch = (rng.normal(size=(8, 16, 10)).astype(np.float32),
                 np.arange(8, dtype=np.int32) % 3)

        # GSPMD trainer (implicit collectives)
        t1 = Trainer(TINY)
        t1.init_state(batch)
        # warm the EMA init with one step so both paths start initted
        t1.train_step(batch)
        state0 = jax.device_get(t1.state)

        # explicit shard_map trainer sharing the same state
        t2 = Trainer(TINY)
        t2.init_state(batch)
        t2.state = jax.device_put(state0, t2.repl)
        step = make_shard_map_step(t2)
        feats, spks = t2.shard_batch(batch)
        new_state, detail = step(t2.state, feats, spks, t2.base_rng)

        # GSPMD second step from the same state
        t1.state = jax.device_put(state0, t1.repl)
        d1 = t1.train_step(batch)

        p1 = jax.device_get(t1.state.params)
        p2 = jax.device_get(new_state.params)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
        e1 = jax.device_get(t1.state.ema["ema"]["quantizer"].emb)
        e2 = jax.device_get(new_state.ema["ema"]["quantizer"].emb)
        np.testing.assert_allclose(e1, e2, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(float(d1["X like"]),
                                   float(detail["X like"]), rtol=1e-5)


    def test_matches_gspmd_step_normalized_vq(self):
        """Normalized plain-VQ configs renorm the codebook at the top of
        every step (reference dynamics); the explicit shard_map step must
        apply the same renorm or params diverge from step one."""
        from vae_npvc_tpu.parallel.shard import make_shard_map_step
        from vae_npvc_tpu.train.trainer import Trainer

        cfg = dict(TINY, use_ema=False)
        cfg["quantizer"] = {"normalize": True}
        rng = np.random.default_rng(1)
        batch = (rng.normal(size=(8, 16, 10)).astype(np.float32),
                 np.arange(8, dtype=np.int32) % 3)

        t1 = Trainer(cfg)
        assert t1._renorm is not None, "config must exercise the renorm path"
        t1.init_state(batch)
        t1.train_step(batch)
        state0 = jax.device_get(t1.state)

        t2 = Trainer(cfg)
        t2.init_state(batch)
        t2.state = jax.device_put(state0, t2.repl)
        step = make_shard_map_step(t2)
        feats, spks = t2.shard_batch(batch)
        new_state, detail = step(t2.state, feats, spks, t2.base_rng)

        t1.state = jax.device_put(state0, t1.repl)
        d1 = t1.train_step(batch)
        for a, b in zip(
                jax.tree_util.tree_leaves(jax.device_get(t1.state.params)),
                jax.tree_util.tree_leaves(jax.device_get(new_state.params))):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(float(d1["X like"]),
                                   float(detail["X like"]), rtol=1e-5)


class TestTensorParallel:
    def test_param_spec_rule(self):
        from vae_npvc_tpu.parallel.tp import param_spec

        # conv kernel (k, in, out): trailing-most maximal divisible dim
        assert param_spec((3, 512, 512), 2, 1024) == P(None, None, "model")
        assert param_spec((3, 512, 1024), 2, 1024) == P(None, None, "model")
        # small params stay replicated
        assert param_spec((8,), 2, 1024) == P()
        # indivisible dims stay replicated
        assert param_spec((3, 5, 7), 2, 0) == P()
        # n_model=1 → no sharding
        assert param_spec((3, 512, 512), 1, 0) == P()

    def test_tp_step_matches_dp_step(self):
        """A 4×2 (data×model) mesh with sharded params must reproduce the
        data-parallel-only trainer's numerics exactly (same math, different
        layout — XLA inserts the model-axis collectives)."""
        from vae_npvc_tpu.train.trainer import Trainer

        rng = np.random.default_rng(0)
        batch = (rng.normal(size=(8, 16, 10)).astype(np.float32),
                 np.arange(8, dtype=np.int32) % 3)

        t_dp = Trainer(TINY)
        t_dp.init_state(batch)

        cfg_tp = {**TINY, "tp_min_param_size": 64}
        t_tp = Trainer(cfg_tp, mesh=make_mesh(n_data=4, n_model=2))
        t_tp.init_state(batch)

        # at least one parameter must actually be model-axis sharded
        specs = [s.spec for s in jax.tree_util.tree_leaves(
            t_tp._state_shardings(t_tp.state),
            is_leaf=lambda x: hasattr(x, "spec"))]
        assert any("model" in tuple(s) for s in specs), specs

        for _ in range(3):
            d_dp = t_dp.train_step(batch)
            d_tp = t_tp.train_step(batch)
        np.testing.assert_allclose(float(d_dp["Total"]),
                                   float(d_tp["Total"]), rtol=2e-5)
        for a, b in zip(
                jax.tree_util.tree_leaves(jax.device_get(t_dp.state.params)),
                jax.tree_util.tree_leaves(jax.device_get(t_tp.state.params))):
            np.testing.assert_allclose(a, b, rtol=3e-5, atol=3e-6)

    def test_tp_step_matches_dp_hierarchical(self):
        """The shape-generic TP rule also holds for the hierarchical
        families (vqvae2 with GST top): same numerics as DP."""
        from tests.test_model_vqvae2 import make_cfg
        from vae_npvc_tpu.train.trainer import Trainer

        cfg = {**make_cfg(use_gst=True, use_ema=False),
               "optim_type": "Adam", "learning_rate": 1e-3,
               "max_grad_norm": 10, "seed": 7}
        rng = np.random.default_rng(0)
        batch = (rng.normal(size=(8, 16, 10)).astype(np.float32),
                 np.arange(8, dtype=np.int32) % 4)

        t_dp = Trainer(cfg)
        t_dp.init_state(batch)
        t_tp = Trainer({**cfg, "tp_min_param_size": 64},
                       mesh=make_mesh(n_data=4, n_model=2))
        t_tp.init_state(batch)
        for _ in range(2):
            d_dp = t_dp.train_step(batch)
            d_tp = t_tp.train_step(batch)
        np.testing.assert_allclose(float(d_dp["Total"]),
                                   float(d_tp["Total"]), rtol=2e-5)

    def test_tp_checkpoint_roundtrip(self):
        """Sharded-state save/load keeps values and layout."""
        import tempfile
        from pathlib import Path

        from vae_npvc_tpu.train.trainer import Trainer

        rng = np.random.default_rng(1)
        batch = (rng.normal(size=(8, 16, 10)).astype(np.float32),
                 np.arange(8, dtype=np.int32) % 3)
        cfg = {**TINY, "tp_min_param_size": 64}
        t = Trainer(cfg, mesh=make_mesh(n_data=4, n_model=2))
        t.init_state(batch)
        t.train_step(batch)
        want = jax.device_get(t.state.params)

        with tempfile.TemporaryDirectory() as d:
            path = str(Path(d) / "iter.1")
            t.save_checkpoint(path)
            t2 = Trainer(cfg, mesh=make_mesh(n_data=4, n_model=2))
            it = t2.load_checkpoint(path, example_batch=batch)
        assert it == 1
        for a, b in zip(jax.tree_util.tree_leaves(want),
                        jax.tree_util.tree_leaves(
                            jax.device_get(t2.state.params))):
            np.testing.assert_allclose(a, b, rtol=0, atol=0)
        d2 = t2.train_step(batch)
        assert np.isfinite(float(d2["Total"]))


class TestHalo:
    def test_sharded_conv_matches_unsharded(self):
        from jax import shard_map

        mesh = data_mesh()
        rng = np.random.default_rng(1)
        B, T, D, C, k, dil = 2, 64, 6, 8, 3, 2
        x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, D, C)).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

        ref = jax.lax.conv_general_dilated(
            x, w, (1,), [((k - 1) // 2 * dil,) * 2], rhs_dilation=(dil,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32) + b

        halo = halo_mod.receptive_halo(k, [dil])

        def local(x):
            return halo_mod.sharded_conv1d(x, w, b, halo, "data",
                                           dilation=dil)

        # shard time axis over 8 devices (T=64 → 8 frames/shard)
        out = shard_map(local, mesh=mesh, in_specs=P(None, "data", None),
                        out_specs=P(None, "data", None),
                        check_vma=False)(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_psum_group_norm_matches_global(self):
        from jax import shard_map

        from vae_npvc_tpu.nn.blocks import group_norm

        mesh = data_mesh()
        rng = np.random.default_rng(2)
        B, T, C, G = 2, 64, 8, 2
        x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

        ref = group_norm(x, scale, bias, G)

        def local(x):
            return halo_mod.psum_group_norm(x, scale, bias, G, "data")

        out = shard_map(local, mesh=mesh, in_specs=P(None, "data", None),
                        out_specs=P(None, "data", None),
                        check_vma=False)(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestSequenceParallelInfer:
    def test_matches_single_device(self):
        import jax.numpy as jnp

        from vae_npvc_tpu.models import build_model
        from vae_npvc_tpu.parallel.seq_infer import sequence_parallel_infer

        cfg = dict(TINY)
        cfg["encoder"] = dict(TINY["encoder"], dilation=True, stacks=[2])
        cfg["decoder"] = dict(TINY["decoder"], dilation=True, stacks=[2])
        model = build_model(cfg)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(1, 128, 10)).astype(np.float32))
        y = jnp.zeros((1,), jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "vq": jax.random.PRNGKey(1)}, x, y,
                               train=True)
        ref = model.apply(variables, x, y, method="infer")

        mesh = data_mesh()
        out = sequence_parallel_infer(cfg, variables, x, y, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_ids_match_too(self):
        import jax.numpy as jnp
        from jax import shard_map

        from vae_npvc_tpu.models import build_model

        cfg = dict(TINY)
        model = build_model(cfg)
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(1, 64, 10)).astype(np.float32))
        y = jnp.zeros((1,), jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "vq": jax.random.PRNGKey(1)}, x, y,
                               train=True)
        ids_ref = model.apply(variables, x, method="encode")

        seq_model = build_model({**cfg, "seq_axis": "data"})
        mesh = data_mesh()
        fn = shard_map(
            lambda xs: seq_model.apply(variables, xs, method="encode"),
            mesh=mesh, in_specs=P(None, "data"),
            out_specs=P(None, "data"), check_vma=False)
        ids = fn(x)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
