"""Model registry.

The reference dispatches models by dotted path strings in the experiment YAML
(``model_type: vae_npvc.model.vqvae`` resolved via importlib, reference:
vae_npvc/bin/train.py:33-34, trainer/basic.py:24-26). We keep those exact
config strings working but resolve them through an explicit registry instead of
dynamic import.
"""

from __future__ import annotations

_REGISTRY = {}


def register(*names):
    def deco(cls):
        for n in names:
            _REGISTRY[n] = cls
        return cls
    return deco


def get_model_cls(model_type: str):
    """Resolve a model_type string (reference dotted path or short name)."""
    key = model_type.split(":")[0]
    if key in _REGISTRY:
        return _REGISTRY[key]
    short = key.rsplit(".", 1)[-1]
    if short in _REGISTRY:
        return _REGISTRY[short]
    raise KeyError(
        f"unknown model_type {model_type!r}; known: {sorted(_REGISTRY)}")


def build_model(config, dtype=None):
    """Build a flax model from a flat experiment config dict."""
    import jax.numpy as jnp
    cls = get_model_cls(config.get("model_type", "vae_npvc.model.vqvae"))
    kw = {}
    if dtype is not None:
        kw["dtype"] = dtype
    elif config.get("compute_dtype"):
        kw["dtype"] = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
                       "float32": jnp.float32, "fp32": jnp.float32}[
                           config["compute_dtype"]]
    return cls(arch=config, **kw)


def codebook_renorm_fn(config):
    """Per-step codebook renormalization matching reference *training dynamics*.

    The reference's normalized plain VQ renormalizes its codebook param
    **in place** at the top of every forward (reference:
    vae_npvc/model/layers_vq.py:28-33 ``embed_norm`` called at :96-97), so the
    stored param always has unit-norm rows at gradient time. Our lookup-time
    normalization computes the same *forward* function, but lets the stored
    rows drift off unit norm, which scales the weight-norm-style projected
    gradient by 1/||row|| — a slow training-dynamics divergence from the
    reference (measured in tools/lockstep_parity.py).

    Returns a ``params -> params`` function that snaps each normalized
    plain-VQ codebook to unit rows (the functional analog of the in-place
    mutation: renorm first, take gradients at the renormed point, apply the
    update to the renormed value), or ``None`` when the model has no such
    codebook (EMA path, GST levels, normalize=False).
    """
    import jax.numpy as jnp

    short = (config.get("model_type", "vae_npvc.model.vqvae")
             .split(":")[0].rsplit(".", 1)[-1])
    names = []
    if short == "vqvae":
        if not config.get("use_ema", False) and config.get("embed_norm", True):
            names.append("quantizer_embedding")
    elif short in ("vqvae2", "vqvae2a", "vqvae2b"):
        if not config.get("use_ema", False):
            if dict(config.get("quantizer", {})).get("normalize", False):
                names.append("quantizer_embedding")  # vqvae2a shared quantizer
            for i in range(config.get("levels", 3)):
                if dict(config.get(f"quantizer.{i}", {})).get("normalize",
                                                              False):
                    names.append(f"quantizer_embedding_{i}")
    if not names:
        return None

    def renorm(params):
        params = dict(params)
        for n in names:
            if n in params:  # GST top level has no codebook param
                emb = params[n]
                norm = jnp.maximum(
                    jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
                params[n] = emb / norm
        return params

    return renorm


from . import vqvae as _vqvae  # noqa: E402

register("vae_npvc.model.vqvae", "vqvae")(_vqvae.Model)

from . import vae as _vae  # noqa: E402

register("vae_npvc.model.vae", "vae")(_vae.Model)

from . import token_tts as _token_tts  # noqa: E402

register("vae_npvc.model.token_tts", "token_tts")(_token_tts.Model)

try:  # hierarchical families registered as they land
    from . import vqvae2 as _vqvae2  # noqa: E402
    register("vae_npvc.model.vqvae2", "vqvae2")(_vqvae2.Model)
except ImportError:
    pass
try:
    from . import vqvae2a as _vqvae2a  # noqa: E402
    register("vae_npvc.model.vqvae2a", "vqvae2a")(_vqvae2a.Model)
except ImportError:
    pass
try:
    from . import vqvae2b as _vqvae2b  # noqa: E402
    register("vae_npvc.model.vqvae2b", "vqvae2b")(_vqvae2b.Model)
except ImportError:
    pass
