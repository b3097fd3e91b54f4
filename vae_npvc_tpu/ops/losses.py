"""Loss functions: unit-variance Gaussian NLL and the Gaussian-VAE toolkit.

Re-implementation of the reference's loss math (vae_npvc/model/layers.py:252-296)
in jnp, channels-last layout (B, T, D).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

EPSILON = 1e-6
LOG_2PI = math.log(2.0 * math.pi)


def log_loss(xhat, x, reduction="frame_mean"):
    """Unit-variance Gaussian NLL, 0.5*(log 2pi + (x - mu)^2).

    The reference's ``'X like'`` reconstruction metric (layers.py:283-296).
    Inputs are (B, T, D); reductions match the reference modes.
    """
    B, T, D = x.shape
    loss = 0.5 * (LOG_2PI + (x - xhat) ** 2)
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "batch_mean":
        return jnp.sum(loss) / B
    if reduction == "frame_mean":
        return jnp.sum(loss) / (B * T)
    if reduction == "none":
        return loss
    raise ValueError(f"unknown reduction {reduction!r}")


def gaussian_sample(rng, mu, logvar):
    """Reparameterized sample (layers.py:252-256)."""
    return mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape, mu.dtype)


def gaussian_kld(mu1, lv1, mu2, lv2, axis=-1):
    """KL(N1 || N2) summed over ``axis`` (layers.py:259-264)."""
    v1, v2 = jnp.exp(lv1), jnp.exp(lv2)
    elem = 0.5 * ((lv2 - lv1) + (v1 + (mu1 - mu2) ** 2) / (v2 + EPSILON) - 1.0)
    return jnp.sum(elem, axis=axis)


def gaussian_log_density(x, mu, logvar, axis=-1):
    """Diagonal-Gaussian log density summed over ``axis`` (layers.py:267-271)."""
    var = jnp.exp(logvar)
    return jnp.sum(-0.5 * (LOG_2PI + logvar + (x - mu) ** 2 / (var + EPSILON)),
                   axis=axis)


def kl_loss(mu, lv):
    """KL to standard normal, summed (layers.py:274-276)."""
    return 0.5 * jnp.sum(jnp.exp(lv) + mu ** 2 - lv - 1.0)


def skl_loss(mu1, lv1, mu2, lv2):
    """Symmetric Gaussian KL, summed.

    Reference bug fixed (layers.py:278-281 divides the squared mean gap by
    ``1/v1 + 1/v2`` — i.e. multiplies it by the harmonic mean of the
    variances — so mean separation *vanishes* exactly when variances are
    small; the correct symmetric KL multiplies by ``1/v1 + 1/v2``). Unused
    by shipped configs (part of the Gaussian-VAE toolkit the reference also
    never calls), so no parity flag is needed."""
    v1, v2 = jnp.exp(lv1), jnp.exp(lv2)
    return 0.5 * jnp.sum(v2 / v1 + v1 / v2 - 2.0
                         + (mu1 - mu2) ** 2 * (1.0 / v1 + 1.0 / v2))
