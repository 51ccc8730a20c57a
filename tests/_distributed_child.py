"""Child process for the 2-process distributed test (not a pytest module).

Usage: python tests/_distributed_child.py <process_id> <port> [local_devices]

Boots the multi-process JAX runtime via flexq_tpu.parallel.distributed,
builds the deterministic tiny quantized model (same numpy seed in every
process), runs the TP forward over a mesh that SPANS the two processes —
the per-layer psums and the vocab all_gather must cross the process
boundary (gloo on CPU; the analogue of the reference's inter-node NCCL) —
and checks the replicated logits against the process-local single-device
forward.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the TPU tunnel

pid, port = int(sys.argv[1]), int(sys.argv[2])

from flexq_tpu.parallel.distributed import initialize, process_mesh  # noqa: E402

initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402

import __graft_entry__  # noqa: E402
from flexq_tpu.models.quantized import forward_serve  # noqa: E402
from flexq_tpu.parallel import forward_serve_tp, shard_params  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2 * jax.local_device_count()

import jax.numpy as jnp  # noqa: E402

cfg, policy, qparams = __graft_entry__._tiny_quantized(
    hidden=256, layers=1, heads=2, kv_heads=2, vocab=128, dtype=jnp.float32
)
mesh = process_mesh(tp=jax.device_count(), dp=1)
sharded = shard_params(qparams, mesh)
ids = np.asarray([[3, 1, 4, 1, 5, 9]], np.int32)

want, _ = forward_serve(qparams, cfg, policy, ids)  # process-local reference
got, _ = forward_serve_tp(sharded, cfg, policy, ids, mesh)
# out spec is fully replicated -> addressable on every process
np.testing.assert_allclose(
    np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
)
print(f"DISTRIBUTED_OK process={pid}", flush=True)
