"""Benchmark: flagship VQ-VAE training throughput in mel frames/sec/chip.

Workload = the reference's VCC2020 flat EMA-VQ-VAE training step at its shipped
batch shape (128 × 256 frames × 80 mels, egs/vcc20/vae1/conf/
train_pytorch_vqvae.yaml:13-14) on whatever accelerator JAX exposes.

Baseline: the reference publishes no numbers (BASELINE.md), so the comparison
point is a self-measured run of an equivalent PyTorch training step on this
host's CPU (the only hardware the reference can run on here), cached in
.bench_baseline.json. ``vs_baseline`` = our frames/s / reference frames/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

CACHE = Path(__file__).parent / ".bench_baseline.json"
B, T, D = 128, 256, 80


def measure_ours(steps=20, scan_k=8):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from vae_npvc_tpu.train.trainer import Trainer

    config = _flagship_config()
    trainer = Trainer(config)
    rng = np.random.default_rng(0)
    batch = (rng.normal(size=(B, T, D)).astype(np.float32),
             rng.integers(0, 117, size=(B,)).astype(np.int32))
    trainer.init_state(batch)

    # the state is donated and chained, so forcing the last call's loss
    # forces the whole sequence (fence idiom lives in tools/_measure.py)
    from tools._measure import time_steps

    # per-step dispatch (the r1/r2-comparable measurement)
    feats = jax.device_put(jnp.asarray(batch[0]), trainer.batch_sharding)
    spks = jax.device_put(jnp.asarray(batch[1]), trainer.batch_sharding)
    sec, _ = time_steps(lambda: trainer.train_step((feats, spks)),
                        lambda d: float(d["Total"]), steps)

    if scan_k > 1:
        # the shipped production path: steps_per_call scan dispatch
        # (egs/vcc20/vae1/conf/train_vqvae.yaml) — per-call round-trips
        # amortized over K steps; report whichever shipped mode is faster
        try:
            stacked = trainer.shard_batches([batch] * scan_k)
            sec_call, _ = time_steps(
                lambda: trainer.train_steps(stacked),
                lambda d: float(np.asarray(d["Total"])[-1]),
                max(steps // scan_k, 3))
            sec = min(sec, sec_call / scan_k)
        except Exception as e:  # pragma: no cover - per-backend safety net
            import sys
            print(f"# scan path failed ({e}); keeping per-step",
                  file=sys.stderr, flush=True)
        # device_resident: true (also shipped in the vcc20 configs): the
        # corpus lives in HBM, crops are sampled in-scan — removes the
        # per-call 10MB batch upload, the dominant cost on a tunneled
        # backend
        try:
            class _Synth:
                crop_length = T

                def padded_arrays(self):
                    r = np.random.default_rng(1)
                    return (r.normal(size=(256, T, D)).astype(np.float32),
                            np.full((256,), T, np.int32),
                            r.integers(0, 117, size=(256,)).astype(np.int32))

            trainer.stage_dataset(_Synth(), B)
            sec_dev, _ = time_steps(
                lambda: trainer.train_steps_device(scan_k),
                lambda d: float(np.asarray(d["Total"])[-1]),
                max(steps // scan_k, 3))
            sec = min(sec, sec_dev / scan_k)
        except Exception as e:  # pragma: no cover - per-backend safety net
            import sys
            print(f"# device-resident path failed ({e}); keeping best so "
                  f"far", file=sys.stderr, flush=True)
    n_chips = len(jax.devices())
    global_fps = B * T / sec
    return global_fps / n_chips, global_fps


def measure_reference_cpu(steps=2, b=16):
    """Equivalent torch-CPU train step, built from the reference's YAML spec.

    Independent implementation of the same architecture/optimizer workload (we
    do not import reference code); used only as the runnable baseline.
    """
    import torch
    import torch.nn as nn

    width, stacks, z_dim, z_num = 512, 10, 128, 512

    class Res(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.f = nn.Sequential(nn.LeakyReLU(0.2), nn.Conv1d(c, c, 3, padding=1),
                                   nn.GroupNorm(1, c))
            self.skip = nn.Conv1d(c, c, 1)

        def forward(self, x):
            return self.f(x) + self.skip(x)

    class GluRes(nn.Module):
        def __init__(self, c, cond, skip):
            super().__init__()
            self.conv = nn.Conv1d(c, 2 * c, 3, padding=1)
            self.cond = nn.Conv1d(cond, 2 * c, 1)
            self.norm = nn.GroupNorm(2, 2 * c)
            self.rs = nn.Conv1d(c, c + skip, 1)
            self.c = c

        def forward(self, x, cvec):
            h = self.norm(self.conv(x) + self.cond(cvec))
            h = torch.tanh(h[:, :self.c]) * torch.sigmoid(h[:, self.c:])
            rs = self.rs(h)
            return x + rs[:, :self.c], rs[:, self.c:]

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc_in = nn.Conv1d(D, width, 3, padding=1)
            self.enc = nn.ModuleList([Res(width) for _ in range(stacks)])
            self.enc_out = nn.Conv1d(width, z_dim, 1)
            self.embed = nn.Embedding(117, z_dim)
            self.register_buffer("codebook", torch.randn(z_num, z_dim))
            self.dec_in = nn.Conv1d(z_dim, width, 3, padding=1)
            self.dec = nn.ModuleList(
                [GluRes(width, z_dim, z_dim) for _ in range(stacks)])
            self.head = nn.Sequential(nn.ReLU(), nn.Conv1d(z_dim, z_dim, 1),
                                      nn.ReLU(), nn.Conv1d(z_dim, D, 1))

        def forward(self, x, y):
            z = self.enc_in(x)
            for m in self.enc:
                z = m(z)
            z = self.enc_out(z)
            zf = z.permute(0, 2, 1).reshape(-1, z_dim)
            d = (zf * zf).sum(1, keepdim=True) \
                + (self.codebook * self.codebook).sum(1) - 2 * zf @ self.codebook.T
            idx = d.argmin(1)
            zq = self.codebook[idx].reshape(x.shape[0], -1, z_dim)
            zq = z + (zq.permute(0, 2, 1) - z).detach()
            commit = ((zq.detach() - z) ** 2).mean()
            cvec = self.embed(y).unsqueeze(-1).expand(-1, -1, x.shape[2])
            h = self.dec_in(zq)
            skip_sum = 0.0
            for m in self.dec:
                h, s = m(h, cvec)
                skip_sum = skip_sum + s
            xhat = self.head(skip_sum * (1.0 / (stacks + 1)) ** 0.5)
            loss = 0.5 * ((x - xhat) ** 2).sum() / (x.shape[0] * x.shape[2])
            return loss + 0.01 * commit

    torch.manual_seed(0)
    net = Net()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3, betas=(0.5, 0.999))
    x = torch.randn(b, D, T)
    y = torch.randint(0, 117, (b,))
    # warmup
    loss = net(x, y)
    loss.backward()
    opt.step()
    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        loss = net(x, y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(net.parameters(), 10.0)
        opt.step()
    dt = time.perf_counter() - t0
    return steps * b * T / dt


def _accelerator_answers(deadline_s=150):
    """Probe the accelerator in a SUBPROCESS with a hard deadline.

    The tunneled TPU transport can wedge (observed r3: 6+ h; r5: hours of
    1-5-min-latency half-up states) — a device op in THIS process would then
    hang past any driver timeout with no JSON line printed at all.  A probe
    child can be killed safely; if it cannot answer within the deadline,
    bench falls back to a CPU measurement labeled as such (the vs_baseline
    comparison stays apples-to-apples: both sides on this host's CPU).
    """
    import os
    import subprocess
    import sys

    if os.environ.get("VAE_NPVC_JAX_PLATFORM") == "cpu":
        return True     # explicit CPU run — nothing to probe
    probe = Path(__file__).parent / "tools" / "tpu_probe.py"
    try:
        r = subprocess.run([sys.executable, str(probe)],
                           timeout=deadline_s, capture_output=True)
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def main():
    import os
    import sys

    if not _accelerator_answers():
        if os.environ.get("VAE_NPVC_BENCH_FALLBACK") == "1":
            pass        # already the CPU-fallback child; measure as-is
        else:
            # re-exec with the CPU platform pinned BEFORE jax initializes
            env = dict(os.environ, VAE_NPVC_JAX_PLATFORM="cpu",
                       VAE_NPVC_BENCH_FALLBACK="1")
            os.execve(sys.executable, [sys.executable, __file__], env)
    # fingerprint the baseline workload so the cache is invalidated if the
    # benchmark constants or the baseline step definition change
    workload = {"B": B, "T": T, "D": D, "baseline_steps": 2, "baseline_b": 16,
                "baseline_rev": 1}
    baseline = None
    if CACHE.exists():
        cached = json.loads(CACHE.read_text())
        if cached.get("workload") == workload:
            baseline = cached["frames_per_sec"]
    if baseline is None:
        baseline = measure_reference_cpu()
        CACHE.write_text(json.dumps({"frames_per_sec": baseline,
                                     "hardware": "host CPU (torch)",
                                     "workload": workload}))
    fallback = os.environ.get("VAE_NPVC_BENCH_FALLBACK") == "1"
    # CPU fallback: one step is ~4 orders slower than the chip — keep the
    # run inside the driver's timeout (compile dominates regardless)
    value, global_fps = (measure_ours(steps=2, scan_k=1) if fallback
                         else measure_ours())
    import jax
    out = {
        "metric": "train_throughput_mel_frames_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "frames/s/chip",
        # whole-accelerator throughput vs the whole-host CPU baseline
        # (identical on this 1-chip host; stays apples-to-apples on N chips)
        "vs_baseline": round(global_fps / baseline, 2),
        "platform": jax.default_backend(),
    }
    if os.environ.get("VAE_NPVC_BENCH_FALLBACK") == "1":
        out["note"] = ("accelerator did not answer a deadline-guarded "
                       "probe; measured on host CPU instead")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
