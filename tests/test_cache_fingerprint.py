"""Host-fingerprinted XLA compilation-cache dir (round-5 hygiene fix).

XLA:CPU persistent-cache entries embed AOT machine code for the compiling
host's CPU; reloading them on a different machine makes cpu_aot_loader.cc
error ("could lead to execution errors such as SIGILL").  The default cache
dir is therefore keyed by a hash of CPU identity + jax/jaxlib versions
(vae_npvc_tpu._cache_fingerprint), so a cache populated on another host (or
under another jax) lands in a different directory and is never reused.
"""

import os
import re

import pytest

import vae_npvc_tpu as pkg

pytestmark = pytest.mark.smoke  # fast tier: pytest -m smoke

CPU_A = "model name\t: Intel A\nflags\t\t: fpu sse sse2"
CPU_B = "model name\t: AMD B\nflags\t\t: fpu sse sse2 avx512f"


def test_fingerprint_deterministic_and_cpu_keyed():
    a1 = pkg._cache_fingerprint(cpuinfo=CPU_A, versions="0.9/0.9")
    a2 = pkg._cache_fingerprint(cpuinfo=CPU_A, versions="0.9/0.9")
    b = pkg._cache_fingerprint(cpuinfo=CPU_B, versions="0.9/0.9")
    assert a1 == a2
    assert a1 != b


def test_fingerprint_jax_version_keyed():
    a = pkg._cache_fingerprint(cpuinfo=CPU_A, versions="0.9/0.9")
    b = pkg._cache_fingerprint(cpuinfo=CPU_A, versions="0.10/0.10")
    assert a != b


def test_real_host_fingerprint_is_stable_hex():
    fp = pkg._cache_fingerprint()
    assert re.fullmatch(r"[0-9a-f]{12}", fp)
    assert fp == pkg._cache_fingerprint()


def test_foreign_cache_dir_is_not_reused(tmp_path, monkeypatch):
    """A cache dir populated under a different host fingerprint must not be
    the dir this host resolves to."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    foreign_fp = pkg._cache_fingerprint(cpuinfo=CPU_B, versions="0.1/0.1")
    foreign_dir = pkg._default_cache_dir(fingerprint=foreign_fp)
    os.makedirs(foreign_dir)
    with open(os.path.join(foreign_dir, "entry"), "w") as f:
        f.write("aot-blob-from-another-machine")

    local_dir = pkg._default_cache_dir()
    assert local_dir != foreign_dir
    assert not os.path.exists(os.path.join(local_dir, "entry"))
    # and the local dir embeds the real host fingerprint
    assert pkg._cache_fingerprint() in os.path.basename(local_dir)


def test_explicit_cache_dir_respected():
    """An explicit VAE_NPVC_COMPILATION_CACHE=<dir> is a user choice; only
    the DEFAULT dir is fingerprinted (contract documented in __init__)."""
    # the resolution logic only fingerprints the "", "1", "true" values —
    # assert the helper itself never rewrites an explicit path by checking
    # the default-dir naming scheme is the only fingerprinted form
    d = pkg._default_cache_dir(fingerprint="abc123abc123")
    assert d.endswith("vae_npvc_jax_cache-abc123abc123")
