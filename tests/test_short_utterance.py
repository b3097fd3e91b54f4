"""Very short utterances through deep downsampling hierarchies.

A 57-frame utterance through vqvae2's x4·x16 encoder chain reaches the last
strided conv with fewer frames than its kernel: torch would crash
(Conv1d input smaller than kernel); XLA silently emits a 0-length tensor,
whose time-mean (the GST query) is NaN — observed as all-NaN conversions of
the flagship vqvae2 on sub-0.7 s eval utterances. The framework behavior is
now: per-level real lengths clamp to >=1 (Encoder.out_lengths), masked
GroupNorm guards its 0-count denominator, the conversion/BNF paths pad short
inputs up to Encoder.min_input_frames, and a direct unpadded call raises a
clear ValueError instead of returning NaN.
"""

import numpy as np
import pytest

from vae_npvc_tpu.models.vqvae import Encoder


def _enc(chs, ds_list):
    n = len(ds_list)
    return {"in_channels": [chs] * n, "out_channels": [16] * n,
            "kernel_size": 3, "downsample_scales": ds_list, "z_channels": 8,
            "dilation": False, "stack_kernel_size": 3, "stack_layers": 1,
            "stacks": [1] * n, "use_weight_norm": True}


def _dec(in_ch, cond, final):
    return {"in_channels": [in_ch], "out_channels": [16],
            "cond_channels": cond, "skip_channels": 8,
            "final_channels": final, "kernel_size": 3, "upsample_scales": [1],
            "dilation": False, "stack_kernel_size": 3, "stacks": [1],
            "use_weight_norm": True}


def _hier_config():
    """Tiny 3-level vqvae2 with the flagship's downsample layout
    (x1 / x2·x2 / x4·x4 relative = min 64 input frames), GST at the top —
    small widths so CPU tests stay fast (mirrors tests/test_model_vqvae2.py
    shapes)."""
    return {
        "model_type": "vae_npvc.model.vqvae2",
        "compute_dtype": "float32",
        "levels": 3, "y_dim": 8, "y_num": 4, "beta": 0.01,
        "use_gst": True, "use_ema": False, "jitter_p": 0.0,
        "encoder.0": _enc(10, [1]),
        "encoder.1": _enc(16, [2, 2]),
        "encoder.2": _enc(16, [4, 4]),
        "decoder.0": _dec(8 * 3, 8, 10),
        "decoder.1": _dec(8, 16, 8),
        "decoder.2": _dec(8, 8, 8),
        "quantizer.0": {"z_dim": 8, "z_num": 16, "normalize": True,
                        "mu": 0.9},
        "quantizer.1": {"z_dim": 8, "z_num": 16, "normalize": True,
                        "mu": 0.9},
        "quantizer.2": {"ref_embed_dim": 8, "gst_tokens": 4,
                        "gst_token_dim": 8, "gst_heads": 2},
    }


def test_min_input_frames_matches_brute_force():
    archs = [{"downsample_scales": [1]},
             {"downsample_scales": [2, 2]},
             {"downsample_scales": [4, 4]}]

    def levels_nonempty(T):
        for arch in archs:
            for ds in arch["downsample_scales"]:
                if ds != 1:
                    p = ds // 2 + ds % 2
                    T = (T + 2 * p - 2 * ds) // ds + 1
                    if T < 1:
                        return False
        return True

    m = Encoder.min_input_frames(archs)
    assert levels_nonempty(m)
    assert not levels_nonempty(m - 1)
    assert m == 64  # the flagship vqvae2 layout

    assert Encoder.min_input_frames([{"downsample_scales": [1]}]) == 1


def test_out_lengths_clamped_to_one():
    arch = {"downsample_scales": [4, 4]}
    got = np.asarray(Encoder.out_lengths(arch, np.asarray([57, 3, 256])))
    assert (got >= 1).all()
    assert got[2] == 16  # unaffected where nonzero: 256 -> 64 -> 16


def test_short_utterance_converter_is_finite(tmp_path):
    """Bucketed conversion of a 57-frame utterance (below the hierarchy's
    64-frame minimum) must be finite, and padded == longer-padded exactly."""
    import yaml

    from vae_npvc_tpu.data import kaldi_io
    from vae_npvc_tpu.infer.convert import Converter

    config = _hier_config()
    rng = np.random.default_rng(0)

    d = tmp_path / "dec"
    d.mkdir()
    with kaldi_io.ArkWriter(d / "feats.ark", d / "feats.scp") as w:
        w.write("short", rng.normal(size=(57, 10)).astype(np.float32))
        w.write("long", rng.normal(size=(200, 10)).astype(np.float32))
    (d / "trials").write_text("short 1\nlong 1\n")

    cv = Converter(config)
    assert cv.min_frames == 64
    # random-init params via the init path (no checkpoint needed)
    import jax
    x = np.zeros((1, 64, 10), np.float32)
    variables = cv.model.init(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
        x, np.zeros((1,), np.int32), train=True)
    cv.variables = variables

    out = tmp_path / "out"
    n = cv.decode(d, out, compress=False)
    assert n == 2
    scp = kaldi_io.read_scp(out / "feats.scp")
    short = kaldi_io.load_mat(scp["short"])
    assert short.shape[0] == 57
    assert np.isfinite(short).all()
    assert np.isfinite(kaldi_io.load_mat(scp["long"])).all()


@pytest.mark.parametrize("family", ["vqvae2a", "vqvae2b"])
def test_short_utterance_other_hier_families(family, tmp_path):
    """The 2a/2b families share Encoder.out_lengths and the bucketed
    conversion path: a sub-minimum utterance must convert finitely too."""
    import jax

    from tests.test_model_vqvae2ab import cfg_2a, cfg_2b
    from vae_npvc_tpu.data import kaldi_io
    from vae_npvc_tpu.infer.convert import Converter

    config = cfg_2a() if family == "vqvae2a" else cfg_2b()
    # deepen to the flagship-style x4,x4 top level so min_frames > 1
    config[f"encoder.{config['levels'] - 1}"]["downsample_scales"] = [4, 4]
    for k in ("in_channels", "out_channels", "stacks"):
        v = config[f"encoder.{config['levels'] - 1}"][k]
        config[f"encoder.{config['levels'] - 1}"][k] = v * 2

    d = tmp_path / "dec"
    d.mkdir()
    rng = np.random.default_rng(0)
    with kaldi_io.ArkWriter(d / "feats.ark", d / "feats.scp") as w:
        w.write("short", rng.normal(size=(9, 10)).astype(np.float32))
    (d / "trials").write_text("short 1\n")

    cv = Converter(config)
    assert cv.min_frames > 9
    x = np.zeros((1, cv.min_frames, 10), np.float32)
    cv.variables = cv.model.init(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
        x, np.zeros((1,), np.int32), train=True)
    out = tmp_path / "out"
    assert cv.decode(d, out, compress=False) == 1
    mat = kaldi_io.load_mat(kaldi_io.read_scp(out / "feats.scp")["short"])
    assert mat.shape[0] == 9 and np.isfinite(mat).all()


def test_gst_attention_finite_under_jit_at_extreme_query_scale():
    """The GST query is the unnormalized encoder mean; on the trained
    flagship vqvae2 it reaches ~1e16 (the un-normed res-skip chains grow
    scale multiplicatively and nothing in the loss anchors it). XLA's
    dot→softmax→dot fusion cancelled the softmax max-subtraction into
    exp(x)/Σexp(x) = inf/inf = NaN — jit-only, eager finite. The attention
    now subtracts the row max behind an optimization barrier."""
    import jax
    import jax.numpy as jnp

    from vae_npvc_tpu.nn.gst import StyleTokenLayer

    layer = StyleTokenLayer(ref_embed_dim=16, gst_tokens=4, gst_token_dim=16,
                            gst_heads=2)
    rng = np.random.default_rng(0)
    sane = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32))
    huge = sane * 2.3e16
    variables = layer.init(jax.random.PRNGKey(0), sane)

    jit_apply = jax.jit(layer.apply)
    out_huge = np.asarray(jit_apply(variables, huge))
    assert np.isfinite(out_huge).all()
    # parity with eager at both scales
    np.testing.assert_allclose(out_huge,
                               np.asarray(layer.apply(variables, huge)),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jit_apply(variables, sane)),
                               np.asarray(layer.apply(variables, sane)),
                               rtol=1e-6, atol=1e-6)


def test_unpadded_too_short_raises_clearly():
    import jax

    from vae_npvc_tpu.models import build_model

    config = _hier_config()
    model = build_model(config)
    x = np.zeros((1, 57, 10), np.float32)
    with pytest.raises(ValueError, match="too short"):
        model.init({"params": jax.random.PRNGKey(0),
                    "vq": jax.random.PRNGKey(1)},
                   x, np.zeros((1,), np.int32), train=True)
