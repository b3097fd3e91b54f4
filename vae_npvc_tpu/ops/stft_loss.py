"""Multi-resolution STFT loss for neural vocoder training.

The reference's waveform synthesis depends on an *external* pretrained
Parallel WaveGAN (reference: egs/vcc20/vae1/run.sh:192-239 shells out to
``parallel-wavegan-decode``); the in-framework vocoder (models/pwg.py) is
trained with the same objective that package uses: spectral-convergence +
log-STFT-magnitude L1, averaged over several analysis resolutions
(Yamamoto et al., "Parallel WaveGAN", ICASSP 2020). The default resolution
triplets are the published ones.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..data.features import stft_magnitude

# (fft_size, hop, win_length) — the published multi-resolution set
DEFAULT_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def single_stft_loss(x, y, n_fft, n_shift, win_length):
    """(sc, mag) losses between waveforms x (pred) and y (target), (B, N)."""
    mx = stft_magnitude(x, n_fft, n_shift, win_length)
    my = stft_magnitude(y, n_fft, n_shift, win_length)
    # spectral convergence: ||My - Mx||_F / ||My||_F, mean over batch
    num = jnp.sqrt(jnp.sum((my - mx) ** 2, axis=(1, 2)))
    den = jnp.sqrt(jnp.sum(my ** 2, axis=(1, 2))) + 1e-8
    sc = jnp.mean(num / den)
    # log STFT magnitude L1 (clip floor per the published implementation)
    lx = jnp.log(jnp.clip(mx, 1e-7))
    ly = jnp.log(jnp.clip(my, 1e-7))
    mag = jnp.mean(jnp.abs(ly - lx))
    return sc, mag


def multi_stft_loss(x, y, resolutions=DEFAULT_RESOLUTIONS):
    """Averaged (sc, mag) over the resolution set; both args (B, N) fp32."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    sc_total = 0.0
    mag_total = 0.0
    for n_fft, n_shift, win in resolutions:
        sc, mag = single_stft_loss(x, y, n_fft, n_shift, win)
        sc_total = sc_total + sc
        mag_total = mag_total + mag
    n = float(len(resolutions))
    return sc_total / n, mag_total / n
