"""vae_npvc_tpu — a TPU-native (JAX/XLA/Pallas) non-parallel voice conversion framework.

A from-scratch rebuild of the capabilities of Sinica-SLAM/vae_npvc (PyTorch/Kaldi)
as an idiomatic JAX stack:

- ``data``      Kaldi-compatible ark/scp I/O, mel/STFT/CMVN feature ops, batching
- ``ops``       vector-quantization core (VQ / EMA-VQ), losses, jitter (+ Pallas kernels)
- ``nn``        flax building blocks (conv res-stacks, GLU deconv res-skip, conditions, GST)
- ``models``    vqvae / vqvae2 / vqvae2a / vqvae2b model families
- ``train``     functional train state, optax optimizers, jit'd train loops
- ``parallel``  device mesh + sharding (data-parallel first, axes reserved for tp/sp)
- ``infer``     conversion (any-to-many), BNF extraction, Griffin-Lim vocoder
- ``bin``       CLI entry points mirroring the reference's flags and file contracts
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("VAE_NPVC_JAX_PLATFORM"):
    # Escape hatch for environments where a site hook pre-imports jax and
    # freezes JAX_PLATFORMS before user env vars can take effect: importing
    # this package applies the requested platform through jax.config (valid
    # until backends are instantiated).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms",
                           _os.environ["VAE_NPVC_JAX_PLATFORM"])
    except RuntimeError:
        pass
