"""Environment self-check: is this host ready to train/serve?

``vae-npvc-doctor`` probes the pieces a deployment depends on and prints one
line per check (``ok`` / ``warn`` / ``FAIL``), exiting non-zero iff a required
check failed. The accelerator probe runs in a daemon thread with a deadline:
on backends where a wedged device transport makes every op (even
``jax.default_backend()``) hang forever, the doctor reports ``device probe
timed out`` instead of hanging with it, and skips the remaining
device-touching checks (they would block on the same backend lock) — the
exact triage this tool exists for. No reference counterpart (operational tooling; the reference assumes a
working local CUDA install).

Checks:
  imports        jax/flax/optax/numpy versions import and report
  platform       requested vs active platform (VAE_NPVC_JAX_PLATFORM)
  devices        device list + a tiny matmul fetched to host (the only
                 reliable execution fence on tunneled backends) with latency
  cpu-fallback   the same matmul pinned to CPU (the inference fallback path)
  compile-cache  persistent XLA compilation cache dir (writable? populated?)
  model (opt.)   --config: build the model, count params, one infer call
  bundle (opt.)  --bundle: load a serving bundle, one infer through the
                 smallest exported bucket
  server (opt.)  --url: probe a RUNNING vae-npvc-serve endpoint
                 (/health + /speakers) — deployment-side triage

Usage:
  vae-npvc-doctor [--config conf/train.yaml] [--bundle exp/bundle]
                  [--timeout 120] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time


def _run_with_deadline(fn, timeout):
    """Run ``fn()`` on a daemon thread; return (finished, value, exc).

    Daemon (not a ThreadPoolExecutor): a wedged device op blocks its thread
    forever, and executor threads are joined at interpreter shutdown — the
    doctor process must stay free to exit past a stuck probe.
    """
    box = {}

    def run():
        try:
            box["value"] = fn()
        except BaseException as e:  # noqa: BLE001 — reported to the caller
            box["exc"] = e

    t = threading.Thread(target=run, daemon=True, name="doctor-probe")
    t.start()
    t.join(timeout)
    if t.is_alive():
        _leaked_threads.append(t)
    return (not t.is_alive(), box.get("value"), box.get("exc"))


# probe threads stuck inside a wedged native device op: Python finalization
# aborts on them (measured SIGABRT on the tunneled backend), so the CLI entry
# hard-exits when any are still alive
_leaked_threads: list = []

# set by _check_devices on timeout: later device-touching checks would block
# on the same backend-init lock the stuck probe holds and each burn a full
# --timeout with a misleading "CPU fallback broken" cascade — skip them so
# triage points at the transport
_wedged: dict = {}


def _check_imports():
    import flax
    import jax
    import numpy as np
    import optax

    return "ok", (f"jax {jax.__version__}, flax {flax.__version__}, "
                  f"optax {optax.__version__}, numpy {np.__version__}, "
                  f"python {sys.version.split()[0]}")


def _device_probe():
    """Tiny matmul, fetched back to the host. Runs inside a worker thread."""
    import jax
    import jax.numpy as jnp

    t0 = time.monotonic()
    devs = jax.devices()
    x = jnp.ones((128, 128), jnp.bfloat16)
    v = float(jax.device_get((x @ x).astype(jnp.float32))[0, 0])
    if v != 128.0:
        raise AssertionError(f"matmul returned {v}, expected 128.0")
    return devs, time.monotonic() - t0


def _check_devices(timeout):
    finished, value, exc = _run_with_deadline(_device_probe, timeout)
    if not finished:
        _wedged["devices"] = True
        return "FAIL", (f"device probe timed out after {timeout:.0f}s "
                        "(wedged accelerator transport? every device op "
                        "may hang — restart the tunnel/runtime)")
    if exc is not None:
        return "FAIL", f"device probe raised {type(exc).__name__}: {exc}"
    devs, dt = value
    kinds = {}
    for d in devs:
        kinds[d.platform] = kinds.get(d.platform, 0) + 1
    desc = ", ".join(f"{n}x {k}" for k, n in sorted(kinds.items()))
    return "ok", f"{desc}; matmul round-trip {dt:.2f}s"


def _check_platform():
    import jax

    want = os.environ.get("VAE_NPVC_JAX_PLATFORM", "")
    have = jax.config.jax_platforms or "(auto)"
    # exact membership in the comma-separated platform list — a substring
    # test would accept e.g. want="cpu" against "xpcpux" or partial entries
    if want and want not in str(have).split(","):
        return "warn", (f"VAE_NPVC_JAX_PLATFORM={want} but jax_platforms="
                        f"{have} (set before the first jax import?)")
    return "ok", f"jax_platforms={have}"


def _check_cpu_fallback(timeout):
    def probe():
        import jax
        import jax.numpy as jnp

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            x = jnp.ones((64, 64), jnp.float32)
            return float(jax.device_get(x @ x)[0, 0])

    finished, v, exc = _run_with_deadline(probe, timeout)
    if not finished:
        return "FAIL", f"CPU probe timed out after {timeout:.0f}s"
    if exc is not None:
        return "FAIL", f"CPU fallback path broken: {type(exc).__name__}: {exc}"
    return ("ok", "CPU fallback matmul ok") if v == 64.0 else \
        ("FAIL", f"CPU matmul returned {v}")


def _check_cache():
    import jax

    d = jax.config.jax_compilation_cache_dir
    if not d:
        return "warn", ("persistent compilation cache disabled "
                        "(VAE_NPVC_COMPILATION_CACHE=0?) — every restart "
                        "pays full recompiles")
    try:
        os.makedirs(d, exist_ok=True)
        probe = os.path.join(d, ".doctor_probe")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
    except OSError as e:
        return "FAIL", f"cache dir {d} not writable: {e}"
    n = sum(1 for name in os.listdir(d) if not name.startswith("."))
    return "ok", f"{d} writable, {n} cached executable(s)"


def _check_model(config_path, timeout):
    def probe():
        import numpy as np
        import yaml

        import jax
        import jax.numpy as jnp

        from ..infer.convert import Converter

        config = yaml.safe_load(open(config_path))
        conv = Converter(config)        # reuses feat-dim / min-frame logic
        T = max(64, conv.min_frames)
        x = jnp.zeros((1, T, conv._feat_dim_guess()), jnp.float32)
        y = jnp.zeros((1,), jnp.int32)
        variables = conv.model.init(
            {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
            x, y, train=True)
        out = conv.model.apply(variables, x, y,
                               jnp.full((1,), T, jnp.int32), method="infer")
        n_params = sum(int(np.prod(p.shape)) for p in
                       jax.tree.leaves(variables["params"]))
        return n_params, tuple(np.asarray(out).shape)

    finished, value, exc = _run_with_deadline(probe, timeout)
    if not finished:
        return "FAIL", f"model build+infer timed out after {timeout:.0f}s"
    if exc is not None:
        return "FAIL", f"model build failed: {type(exc).__name__}: {exc}"
    n_params, shape = value
    mm = (f"{n_params / 1e6:.2f}M" if n_params >= 1e5
          else f"{n_params:,}")
    return "ok", f"{mm} params, infer out {shape}"


def _check_url(url, timeout):
    """Probe a running vae-npvc-serve endpoint: /health + /speakers."""
    def probe():
        import json as _json
        import urllib.request

        base = url.rstrip("/")
        with urllib.request.urlopen(base + "/health",
                                    timeout=min(timeout, 30)) as r:
            health = _json.loads(r.read().decode())
        with urllib.request.urlopen(base + "/speakers",
                                    timeout=min(timeout, 30)) as r:
            speakers = _json.loads(r.read().decode())
        return health, len(speakers)

    finished, value, exc = _run_with_deadline(probe, timeout)
    if not finished:
        return "FAIL", f"server probe timed out after {timeout:.0f}s"
    if exc is not None:
        return "FAIL", f"server unreachable: {type(exc).__name__}: {exc}"
    health, n_spk = value
    if health.get("status") != "ok":
        return "FAIL", f"/health not ok: {health}"
    return "ok", (f"/health ok (iter {health.get('iteration', '?')}, "
                  f"vocoder {health.get('vocoder', '?')}), "
                  f"{n_spk} target speaker(s)")


def _check_bundle(path, timeout):
    def probe():
        import numpy as np

        from ..infer.export_serving import ServingBundle

        b = ServingBundle(path)            # device_put of params happens here
        T = b.buckets[0]
        L = max(1, min(T, int(b.meta.get("min_frames", 1))))
        feats = np.zeros((1, T, b.feat_dim), np.float32)
        out = b.infer(feats, np.zeros((1,), np.int32),
                      np.full((1,), L, np.int32))
        return tuple(out.shape), len(b.buckets), b.meta.get("quantize")

    finished, value, exc = _run_with_deadline(probe, timeout)
    if not finished:
        return "FAIL", f"bundle load+infer timed out after {timeout:.0f}s"
    if exc is not None:
        return "FAIL", f"bundle check failed: {type(exc).__name__}: {exc}"
    shape, n_buckets, quant = value
    q = f", {quant} params" if quant else ""
    return "ok", f"infer out {shape}, {n_buckets} bucket(s){q}"


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="vae_npvc_tpu environment self-check")
    ap.add_argument("--config", default=None,
                    help="optional experiment YAML: build the model and run "
                         "one tiny infer call")
    ap.add_argument("--bundle", default=None,
                    help="optional serving-bundle dir: load it and run one "
                         "infer through the smallest exported bucket")
    ap.add_argument("--url", default=None,
                    help="optional running vae-npvc-serve base URL "
                         "(e.g. http://host:8080): probe /health + "
                         "/speakers")
    ap.add_argument("--timeout", type=float, default=120.0,
                    help="deadline (s) for each device-touching check")
    ap.add_argument("--json", action="store_true",
                    help="machine-readable one-line-JSON output")
    args = ap.parse_args(argv)
    _wedged.clear()

    # (name, fn, touches_device): device-touching checks are skipped after
    # the devices probe times out — they would block on the backend lock the
    # stuck probe thread holds and burn --timeout each (advisor r3)
    checks = [("imports", _check_imports, False),
              ("platform", _check_platform, False),
              ("devices", lambda: _check_devices(args.timeout), False),
              ("cpu-fallback",
               lambda: _check_cpu_fallback(args.timeout), True),
              ("compile-cache", _check_cache, False)]
    if args.config:
        checks.append(("model",
                       lambda: _check_model(args.config, args.timeout), True))
    if args.bundle:
        checks.append(("bundle",
                       lambda: _check_bundle(args.bundle, args.timeout),
                       True))
    if args.url:
        # pure HTTP — probes the SERVER process, not this host's device
        checks.append(("server",
                       lambda: _check_url(args.url, args.timeout), False))

    results = {}
    failed = False
    for name, fn, touches_device in checks:
        try:
            if touches_device and _wedged.get("devices"):
                status, detail = "skip", ("device transport wedged (devices "
                                          "probe timed out) — not probing")
            else:
                status, detail = fn()
        except Exception as e:  # noqa: BLE001 — a check must never crash
            status, detail = "FAIL", f"{type(e).__name__}: {e}"
        results[name] = {"status": status, "detail": detail}
        failed |= status == "FAIL"
        if not args.json:
            print(f"{name:14s} {status:4s} {detail}", flush=True)
    if args.json:
        print(json.dumps({"ok": not failed, "checks": results}))
    elif failed:
        print("doctor: FAILED (see above)", flush=True)
    return 1 if failed else 0


def cli(argv=None):
    """Console entry: ``main`` + a hard exit past wedged probe threads."""
    rc = main(argv)
    if any(t.is_alive() for t in _leaked_threads):
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(rc)  # skip finalization: a thread is stuck in native code
    return rc


if __name__ == "__main__":
    sys.exit(cli())
