"""Child process for the 2-process sharded-weight-loading test.

Usage: python tests/_sharded_load_child.py <process_id> <port> <packed_dir>

Each process boots the multi-process runtime, then loads ONLY its own TP
rank's shard files via ``load_packed_sharded`` (the reference's per-rank
``LlamaDecoderLayerWeight::loadModel`` pattern — no process ever reads the
other rank's weights) and runs the TP forward across the process boundary.
Logits are checked against a process-local full load + single-device
forward.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the TPU tunnel

pid, port, packed_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from flexq_tpu.parallel.distributed import initialize, process_mesh  # noqa: E402

initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402

from flexq_tpu.export import load_packed, load_packed_sharded  # noqa: E402
from flexq_tpu.models.quantized import forward_serve  # noqa: E402
from flexq_tpu.parallel import forward_serve_tp  # noqa: E402

assert jax.process_count() == 2

mesh = process_mesh(tp=jax.device_count(), dp=1)
cfg, policy, params = load_packed_sharded(packed_dir, mesh)

# this process's model-axis rank owns exactly its local devices' shards
local_ranks = {
    ti
    for di in range(mesh.devices.shape[0])
    for ti in range(mesh.devices.shape[1])
    if mesh.devices[di, ti].process_index == jax.process_index()
}
assert local_ranks == {pid}, (local_ranks, pid)

ids = np.asarray([[2, 7, 1, 8, 2, 8]], np.int32)
got, _ = forward_serve_tp(params, cfg, policy, ids, mesh)

# reference: full reassembled tree through the single-device path
_, _, full = load_packed(packed_dir)
want, _ = forward_serve(full, cfg, policy, ids)
err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
denom = np.abs(np.asarray(want, np.float32)).max()
assert err.max() / denom < 0.05, err.max()
print(f"SHARDED_LOAD_OK process={pid}", flush=True)
