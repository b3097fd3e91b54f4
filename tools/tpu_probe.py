"""Tiny TPU-tunnel liveness probe.

A 128x128 bf16 matmul fetched back to the host (device->host transfer is the
only reliable fence on the tunneled axon backend — ``block_until_ready`` does
not wait for execution there, see CLAUDE.md).  Exits 0 iff the chip answered.

Run under ``timeout`` (the tunnel can wedge such that every device op hangs,
including ``jax.default_backend()``).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

t0 = time.time()
x = jnp.ones((128, 128), jnp.bfloat16)
v = jax.device_get((x @ x).astype(jnp.float32))[0, 0]
assert v == 128.0, v
print(f"OK backend={jax.default_backend()} dt={time.time() - t0:.1f}s",
      flush=True)
