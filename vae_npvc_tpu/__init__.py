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

def _cache_fingerprint(cpuinfo: str | None = None,
                       versions: str | None = None) -> str:
    """Host fingerprint keying the default XLA compilation-cache dir.

    XLA:CPU cache entries embed AOT machine code compiled for THIS host's CPU
    features; loading an entry produced on a different machine can mean
    SIGILL (cpu_aot_loader.cc refuses with a machine-feature error).  The
    default cache dir therefore embeds a hash of the CPU identity (model
    name + feature flags from /proc/cpuinfo) and the jax/jaxlib versions, so
    a cache directory that outlives its host (VM wipe/migration, shared
    /tmp) is simply never reused — each (host, jax) pair gets its own dir.

    Note on the residual cpu_aot_loader.cc log line: reloading entries that
    THIS host wrote minutes earlier still logs "Machine type used for
    XLA:CPU compilation doesn't match ..." (verified round 5 with a freshly
    fingerprinted dir).  The only "features" it flags are
    ``+prefer-no-scatter`` / ``+prefer-no-gather`` — LLVM x86 *tuning
    preferences* the compiler records in the target feature string, which by
    construction never appear in a host's CPU-feature list, so the loader's
    strict subset check trips on every reload on every machine.  It is an
    upstream false positive (no SIGILL risk — tuning flags select codegen
    strategy, not instructions); jaxlib 0.9 exposes no option to relax the
    check or strip the flags.  Real cross-machine ISA mismatches — the case
    the message exists for — cannot occur under the fingerprinted dir.
    """
    import hashlib

    if cpuinfo is None:
        try:
            with open("/proc/cpuinfo") as f:
                txt = f.read()
        except OSError:
            import platform as _platform
            txt = _platform.processor() or _platform.machine()
        # model name + feature flags of the CPUs — the properties XLA's AOT
        # loader validates; dedup across cores
        keep = ("model name", "flags", "Features", "CPU implementer",
                "CPU part")
        cpuinfo = "\n".join(sorted({
            ln for ln in txt.splitlines() if ln.startswith(keep)}))
    if versions is None:
        import jax as _j
        import jaxlib as _jl
        versions = f"{_j.__version__}/{getattr(_jl, '__version__', '?')}"
    return hashlib.sha256(
        (cpuinfo + "|" + versions).encode()).hexdigest()[:12]


def _default_cache_dir(fingerprint: str | None = None) -> str:
    if fingerprint is None:
        fingerprint = _cache_fingerprint()
    return _os.path.join(_os.environ.get("TMPDIR", "/tmp"),
                         f"vae_npvc_jax_cache-{fingerprint}")


if _os.environ.get("VAE_NPVC_COMPILATION_CACHE", "1") not in ("0", "false"):
    # Persistent XLA compilation cache: a preemption-resumed training CLI (or
    # any restarted job) reloads its compiled executables instead of paying
    # the full first-compile again (~20-40 s per jitted fn on the TPU
    # backend, minutes for the big conv models on CPU; a toy CPU train CLI
    # restart measured 41.5 s -> 17.6 s). Set VAE_NPVC_COMPILATION_CACHE=0
    # to disable, or point it at a directory (explicit dirs are used
    # verbatim; the default dir is host-fingerprinted, see
    # _cache_fingerprint).
    import jax as _jax2

    _cache = _os.environ.get("VAE_NPVC_COMPILATION_CACHE", "")
    if _cache in ("", "1", "true"):
        _cache = _default_cache_dir()
    try:
        # never override a cache dir someone already chose (e.g. the test
        # suite's warm /tmp/jax_test_cache, set in tests/conftest.py)
        if _jax2.config.jax_compilation_cache_dir is None:
            _jax2.config.update("jax_compilation_cache_dir", _cache)
            _jax2.config.update("jax_persistent_cache_min_compile_time_secs",
                                1.0)
    except RuntimeError:
        pass
