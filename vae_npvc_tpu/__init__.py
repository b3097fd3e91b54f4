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
