"""Round-2 → round-3 weight-norm-axis checkpoint migration.

Commit 03818d8 moved ``g`` to the input-channel axis for layers standing in
for the reference's transposed convs (GLU ``conv_in``, decoder ``up_N``) to
match torch's ``weight_norm`` gradient geometry. Old native checkpoints
stored ``g`` per output channel for those layers; loading one must
re-decompose (g, v) along the new axis with an identical effective kernel
(utils/migrate.py), not crash or silently mis-scale.
"""

import numpy as np

from flax import serialization

from tests.toy_config import toy_config
from vae_npvc_tpu.train.trainer import Trainer
from vae_npvc_tpu.utils.migrate import (WN_AXIS_FORMAT, maybe_migrate_model,
                                        migrate_weight_norm)


def _downgrade(tree):
    """Re-decompose every in-axis WN layer back to the round-2 layout."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict) and "g" in v and "v" in v:
            vv = np.asarray(v["v"])
            gg = np.asarray(v["g"], np.float64)
            if vv.ndim == 3 and gg.shape == (vv.shape[1],) \
                    and vv.shape[1] != vv.shape[2]:
                vv64 = np.asarray(vv, np.float64)
                norm_in = np.sqrt(np.sum(vv64 * vv64, axis=(0, 2)))
                w = vv64 * (gg / norm_in)[None, :, None]
                g_old = np.sqrt(np.sum(w * w, axis=(0, 1)))
                out[k] = dict(v, g=g_old.astype(np.float32),
                              v=w.astype(np.float32))
                continue
            out[k] = v
        elif isinstance(v, dict):
            out[k] = _downgrade(v)
        else:
            out[k] = v
    return out


def _n_in_axis(tree):
    n = 0
    for k, v in tree.items():
        if isinstance(v, dict) and "g" in v and "v" in v:
            vv = np.asarray(v["v"])
            if vv.ndim == 3 and np.asarray(v["g"]).shape == (vv.shape[1],) \
                    and vv.shape[1] != vv.shape[2]:
                n += 1
        elif isinstance(v, dict):
            n += _n_in_axis(v)
    return n


def test_old_format_checkpoint_loads_and_matches(tmp_path):
    import jax

    config = toy_config()
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, 16, 10)).astype(np.float32)
    spks = np.array([0, 1], np.int32)

    tr = Trainer(config)
    tr.init_state((feats, spks))
    for _ in range(2):
        tr.train_step((feats, spks))
    ckpt = tmp_path / "iter.2"
    tr.save_checkpoint(str(ckpt))

    payload = serialization.msgpack_restore(ckpt.read_bytes())
    assert payload["wn_axis_format"] == WN_AXIS_FORMAT
    assert _n_in_axis(payload["model"]) >= 2   # decoder up_0 + GLU conv_in

    state = jax.device_get(tr.state)
    variables = {"params": state.params, **state.ema}
    ref_out = np.asarray(tr.model.apply(variables, feats, spks,
                                        train=False)[0])

    # forge a round-2 checkpoint: per-output g everywhere, no format stamp
    old = dict(payload)
    old["model"] = _downgrade(payload["model"])
    del old["wn_axis_format"]
    old_ckpt = tmp_path / "iter.2.old"
    old_ckpt.write_bytes(serialization.msgpack_serialize(old))

    tr2 = Trainer(config)
    tr2.init_state((feats, spks))
    it = tr2.load_checkpoint(str(old_ckpt))
    assert it == 2
    state2 = jax.device_get(tr2.state)
    variables2 = {"params": state2.params, **state2.ema}
    got = np.asarray(tr2.model.apply(variables2, feats, spks,
                                     train=False)[0])
    np.testing.assert_allclose(got, ref_out, rtol=1e-5, atol=1e-5)

    # migrated (g, v) differ from the stored old-format values but produce
    # the same effective kernel; Adam moments must have been re-initialized
    moments = jax.tree_util.tree_leaves(state2.opt_state)
    assert all(np.all(np.asarray(m) == 0) for m in moments
               if hasattr(m, "shape") and np.asarray(m).dtype.kind == "f")

    # a stamped checkpoint round-trips without any migration
    tr3 = Trainer(config)
    tr3.init_state((feats, spks))
    tr3.load_checkpoint(str(ckpt))
    state3 = jax.device_get(tr3.state)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_square_layer_uses_name_heuristic():
    """in==out layers can't be told apart by shape: the known in-axis names
    (conv_in, up_N) migrate, anything else is left alone."""
    rng = np.random.default_rng(1)
    v = rng.normal(size=(3, 6, 6)).astype(np.float32)
    g = rng.uniform(1.0, 2.0, size=(6,)).astype(np.float32)
    stored = {"conv_in": {"g": g, "v": v},
              "other": {"g": g.copy(), "v": v.copy()}}
    template = {"conv_in": {"g": np.zeros(6), "v": v},
                "other": {"g": np.zeros(6), "v": v}}
    count = [0]
    out = migrate_weight_norm(stored, template, _count=count)
    assert count[0] == 1
    # conv_in: effective kernel preserved across the re-decomposition
    norm_out = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=(0, 1)))
    w_old = v * (g / norm_out)[None, None, :]
    norm_in = np.sqrt(np.sum(
        np.asarray(out["conv_in"]["v"], np.float64) ** 2, axis=(0, 2)))
    w_new = out["conv_in"]["v"] * (
        out["conv_in"]["g"] / norm_in)[None, :, None]
    np.testing.assert_allclose(w_new, w_old, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(out["other"]["g"], g)
    np.testing.assert_array_equal(out["other"]["v"], v)


def test_old_format_checkpoint_loads_through_converter(tmp_path):
    """A round-2-format checkpoint (per-output g, no wn_axis_format stamp)
    must load through the inference Converter with migration applied —
    the deployment path for checkpoints trained before commit 03818d8.
    (Replaces a fixture-dependent variant: the committed round-2 smoke exp
    was removed in e043e3d, which had left this silently skipping.)"""
    import jax

    from vae_npvc_tpu.infer.convert import Converter

    config = toy_config()
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, 32, 10)).astype(np.float32)
    spks = np.array([0, 1], np.int32)

    tr = Trainer(config)
    tr.init_state((feats, spks))
    for _ in range(2):
        tr.train_step((feats, spks))
    new_ckpt = tmp_path / "model.loss.best"
    tr.save_checkpoint(str(new_ckpt))

    # forge the round-2 layout
    payload = serialization.msgpack_restore(new_ckpt.read_bytes())
    old = dict(payload)
    old["model"] = _downgrade(payload["model"])
    del old["wn_axis_format"]
    old_ckpt = tmp_path / "model.loss.best.old"
    old_ckpt.write_bytes(serialization.msgpack_serialize(old))

    cv = Converter(config)
    cv.load_checkpoint(str(old_ckpt))
    _, changed = maybe_migrate_model(
        old, serialization.to_state_dict(
            jax.device_get(cv.variables["params"])))
    assert changed   # the forged layout really exercised the migration

    # and inference through the migrated params matches the native load
    cv_new = Converter(config)
    cv_new.load_checkpoint(str(new_ckpt))
    lens = np.array([32, 32], np.int32)
    out_old = cv._infer_with_fallback(feats, spks, lens)
    out_new = cv_new._infer_with_fallback(feats, spks, lens)
    np.testing.assert_allclose(np.asarray(out_old), np.asarray(out_new),
                               rtol=1e-5, atol=1e-5)
