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

if _os.environ.get("VAE_NPVC_NUM_CPU_DEVICES"):
    # Same escape hatch for the virtual CPU device count
    # (--xla_force_host_platform_device_count is frozen with XLA_FLAGS by
    # the pre-import): lets CLI runs exercise an 8-device SPMD mesh on one
    # host, e.g. the combined-corpus pretrain smoke (egs/pretrain).
    import jax as _jax2

    try:
        _jax2.config.update("jax_num_cpu_devices",
                            int(_os.environ["VAE_NPVC_NUM_CPU_DEVICES"]))
    except RuntimeError:
        pass

if _os.environ.get("VAE_NPVC_COMPILATION_CACHE", "1") not in ("0", "false"):
    # Persistent XLA compilation cache: a preemption-resumed training CLI (or
    # any restarted job) reloads its compiled executables instead of paying
    # the full first-compile again (~20-40 s per jitted fn on the TPU
    # backend, minutes for the big conv models on CPU; a toy CPU train CLI
    # restart measured 41.5 s -> 17.6 s). Set VAE_NPVC_COMPILATION_CACHE=0
    # to disable, or point it at a directory. Known-cosmetic: XLA's CPU AOT
    # loader logs a false-positive machine-feature warning per cache reload
    # (compiler preference flags are compared against detected host
    # features); the executables load and run correctly.
    import jax as _jax2

    _cache = _os.environ.get("VAE_NPVC_COMPILATION_CACHE", "")
    if _cache in ("", "1", "true"):
        _cache = _os.path.join(_os.environ.get("TMPDIR", "/tmp"),
                               "vae_npvc_jax_cache")
    try:
        # never override a cache dir someone already chose (e.g. the test
        # suite's warm /tmp/jax_test_cache, set in tests/conftest.py)
        if _jax2.config.jax_compilation_cache_dir is None:
            _jax2.config.update("jax_compilation_cache_dir", _cache)
            _jax2.config.update("jax_persistent_cache_min_compile_time_secs",
                                1.0)
    except RuntimeError:
        pass
