"""Checkpoint-format migrations applied at load time.

Round-2 native checkpoints stored every weight-norm magnitude ``g`` per
OUTPUT channel. The training-dynamics parity study (PARITY_DYNAMICS.md)
showed torch's ``weight_norm`` normalizes a ``ConvTranspose1d`` over the
*input*-channel axis (dim 0 of its weight), so since then the layers that
stand in for the reference's transposed convs — GLU ``conv_in`` (reference
vae_npvc/model/layers.py:199) and decoder ``up_N`` layers
(vqvae.py:245-265) — parameterize ``g`` per INPUT channel (``wn_dim='in'``,
nn/blocks.py). Loading an old checkpoint into the new layout would either
fail on the shape mismatch or, when in==out channels, silently scale the
wrong axis.

:func:`migrate_weight_norm` re-decomposes such layers at load: rebuild the
effective kernel under the OLD parameterization (``w = v·g/||v||_out``),
then split it along the NEW axis (``v' = w, g' = ||w||_in``) — the forward
function is unchanged, and the result is exactly what torch's
``weight_norm`` would produce if re-applied at that point. New checkpoints
carry ``wn_axis_format = 2`` so the walk is skipped entirely.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger("vae_npvc_tpu.migrate")

WN_AXIS_FORMAT = 2

# layer names constructed with wn_dim='in' (nn/blocks.py GLU conv_in,
# models/vqvae.py decoder up layers incl. WNConvTranspose1d): used to
# resolve the square in==out case where shapes alone cannot tell the axis
_IN_AXIS_NAMES = ("conv_in",)
_IN_AXIS_PREFIXES = ("up_",)


def _is_in_axis_name(name: str) -> bool:
    return name in _IN_AXIS_NAMES or any(
        name.startswith(p) for p in _IN_AXIS_PREFIXES)


def _redecompose(g_out, v):
    """(g per out-ch, v) → (g per in-ch, v') with identical effective w."""
    g_out = np.asarray(g_out, np.float64)
    v = np.asarray(v, np.float64)                      # (K, in, out)
    norm_out = np.sqrt(np.sum(v * v, axis=(0, 1)))     # (out,)
    w = v * (g_out / np.maximum(norm_out, 1e-12))[None, None, :]
    g_in = np.sqrt(np.sum(w * w, axis=(0, 2)))         # (in,)
    return g_in.astype(np.float32), w.astype(np.float32)


def migrate_weight_norm(payload_model, template, path="", _count=None):
    """Return ``payload_model`` with old-axis WN layers re-decomposed.

    ``template`` is the freshly-initialized param tree (dicts mirroring the
    checkpoint); a layer is migrated when it stores ``g``/``v`` and either

    - the stored ``g`` is per-output while the template wants per-input
      (unambiguous shape mismatch), or
    - in==out channels make the shapes identical but the layer name is a
      known ``wn_dim='in'`` construction site (``conv_in``, ``up_N``).

    Callers gate on ``payload.get('wn_axis_format', 1) < WN_AXIS_FORMAT``.

    Known edge: an UNstamped checkpoint that is already in the new layout
    (saved between 03818d8 and the stamp's introduction) with a *square*
    in-axis layer would be wrongly re-decomposed — old and new layouts are
    indistinguishable there (no invariant relates trained g to v). No
    shipped config has a square ``conv_in`` (always C→2C) or ``up_N``
    (every recipe changes width there); verified over all egs YAMLs.
    """
    if not isinstance(payload_model, dict) or not isinstance(template, dict):
        return payload_model
    out = {}
    for key, stored in payload_model.items():
        tmpl = template.get(key) if isinstance(template, dict) else None
        if (isinstance(stored, dict) and "g" in stored and "v" in stored
                and isinstance(tmpl, dict) and "g" in tmpl):
            sv = np.asarray(stored["v"])
            sg = np.asarray(stored["g"])
            tg_shape = np.shape(tmpl["g"])
            if sv.ndim == 3 and sg.shape == (sv.shape[2],):
                mismatch = (tg_shape == (sv.shape[1],)
                            and sg.shape != tg_shape)
                square = (sv.shape[1] == sv.shape[2]
                          and _is_in_axis_name(key))
                if mismatch or square:
                    g_new, v_new = _redecompose(sg, sv)
                    stored = dict(stored)
                    stored["g"], stored["v"] = g_new, v_new
                    if _count is not None:
                        _count[0] += 1
                    logger.info(
                        f"migrated weight-norm axis out→in: {path}{key} "
                        f"(g {sg.shape} → {g_new.shape})")
                    out[key] = stored
                    continue
        if isinstance(stored, dict):
            out[key] = migrate_weight_norm(stored, tmpl or {},
                                           path=f"{path}{key}/",
                                           _count=_count)
        else:
            out[key] = stored
    return out


def maybe_migrate_model(payload, template):
    """Apply :func:`migrate_weight_norm` to ``payload['model']`` if the
    checkpoint predates the axis-format stamp.

    Returns ``(model_tree, changed)`` — ``changed`` is True when any layer
    was re-decomposed, in which case stored optimizer moments for those
    params no longer apply (their ``g`` has a different shape/meaning) and
    the caller should re-init optimizer state rather than restore it.
    """
    model = payload.get("model", {})
    if payload.get("wn_axis_format", 1) >= WN_AXIS_FORMAT:
        return model, False
    count = [0]
    migrated = migrate_weight_norm(model, template, _count=count)
    return migrated, count[0] > 0
