"""Child process for the 2-process multi-host CPU test (test_multihost.py).

Each process owns 2 virtual CPU devices; together they form a 4-device global
``data`` mesh over a localhost coordinator — the DCN-analog bring-up path of
``parallel.mesh.initialize_multihost``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

coordinator, pid = sys.argv[1], int(sys.argv[2])

from vae_npvc_tpu.parallel.mesh import initialize_multihost  # noqa: E402

process_id, n_proc = initialize_multihost(
    coordinator_address=coordinator, num_processes=2, process_id=pid)
assert process_id == pid, (process_id, pid)
assert n_proc == 2, n_proc
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import (Mesh, NamedSharding,  # noqa: E402
                          PartitionSpec as P)

mesh = Mesh(np.asarray(jax.devices()), ("data",))

# global batch sharded over both processes: each host contributes its local
# rows via make_array_from_process_local_data
global_shape = (8, 3)
local = np.arange(8 * 3, dtype=np.float32).reshape(global_shape)[
    pid * 4:(pid + 1) * 4]
sharding = NamedSharding(mesh, P("data"))
garr = jax.make_array_from_process_local_data(sharding, local, global_shape)


@jax.jit
def global_mean_step(x):
    # a psum-shaped global reduction: XLA inserts the cross-host collective
    return jnp.mean(x) * jnp.ones((), jnp.float32)


got = float(global_mean_step(garr))
want = float(np.arange(8 * 3, dtype=np.float32).mean())
assert abs(got - want) < 1e-5, (got, want)

# explicit collective over the global mesh (the shard_map/psum path)
from jax import shard_map  # noqa: E402

summed = jax.jit(shard_map(
    lambda x: jax.lax.psum(jnp.sum(x), "data"),
    mesh=mesh, in_specs=P("data"), out_specs=P()))(garr)
assert abs(float(summed) - float(np.arange(24).sum())) < 1e-4

print(f"MULTIHOST_OK pid={pid} global_mean={got}")

# --- full Trainer integration over the 2-host mesh ----------------------
# Each host feeds its local half of a fixed global batch; train_step runs
# GSPMD over the 4-device global mesh (grad psum + EMA cluster-stat psum
# cross HOSTS, not just chips). Losses must be identical on both hosts and
# must match the single-process oracle computed by the parent test.
from tests.toy_config import toy_config  # noqa: E402
from vae_npvc_tpu.train.trainer import Trainer  # noqa: E402

config = toy_config()
trainer = Trainer(config, mesh=mesh)
rng = np.random.default_rng(123)
feats = rng.normal(size=(8, 16, 10)).astype(np.float32)
spks = (np.arange(8) % config["y_num"]).astype(np.int32)

trainer.init_state((feats[:1], spks[:1]))
local = slice(pid * 4, (pid + 1) * 4)
for _ in range(3):
    detail = trainer.train_step((feats[local], spks[local]))
total = float(detail["Total"])
print(f"TRAINER_OK pid={pid} total={total:.10f}")

# --- K-steps-per-dispatch scan over the 2-host mesh ----------------------
# shard_batches' multi-host branch assembles each of the K local batches
# globally, then stacks them device-side; the scan must keep training the
# same trajectory on both hosts.
dk = trainer.train_steps([(feats[local], spks[local]),
                          (feats[local], spks[local])])
ktot = ",".join(f"{float(x):.10f}" for x in np.asarray(dk["Total"]))
print(f"SCAN_OK pid={pid} n={np.asarray(dk['Total']).shape[0]} total={ktot}")

# --- unequal per-host validation streams (deadlock regression) ----------
# Host 0 yields batches of 4 then 3 rows; host 1 yields a single 4-row
# batch: the hosts disagree on both batch count and tail size, so every
# collective/branch decision inside Trainer.valid must come from the
# allgathered sizes (Trainer._assemble_multihost), never local shapes.
# Valid crop (12) is deliberately SHORTER than the init-time train crop
# (16): an exhausted host's zero-row drain batch carries the train-spec
# trailing dims, which must be cropped to the agreed valid dims, not
# crash the assembly mid-drain.
vfeats = rng.normal(size=(11, 12, 10)).astype(np.float32)  # rng shared: both
vspks = (np.arange(11) % config["y_num"]).astype(np.int32)  # hosts see all 11
if pid == 0:
    stream = [(vfeats[0:4], vspks[0:4]), (vfeats[8:11], vspks[8:11])]
else:
    stream = [(vfeats[4:8], vspks[4:8])]
vd = trainer.valid(stream)
vtot = ",".join(f"{x:.10f}" for x in vd["Total"])
print(f"VALID_OK pid={pid} n={len(vd['Total'])} total={vtot}")

# --- GAN trainer: multi-host valid drain (regression: GanTrainer.init_state
# must record the batch spec or the exhausted host's _empty_local_batch
# raises mid-drain and deadlocks the peers) -------------------------------
from vae_npvc_tpu.train.gan import GanTrainer  # noqa: E402

gan_cfg = dict(config, pre_iter=10,
               discriminator={"channels": [8], "kernel_size": 5,
                              "strides": [2]})
gan = GanTrainer(gan_cfg, mesh=mesh)
gan.init_state((feats[:1], spks[:1]))
gvd = gan.valid([(vfeats[0:4], vspks[0:4])] if pid == 0
                else [(vfeats[4:8], vspks[4:8]), (vfeats[8:11], vspks[8:11])])
gtot = ",".join(f"{x:.10f}" for x in gvd["Total"])
print(f"GAN_VALID_OK pid={pid} n={len(gvd['Total'])} total={gtot}")
