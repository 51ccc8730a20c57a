"""Multi-host bootstrap + process-aware mesh construction.

TPU-native replacement for the reference's MPI + NCCL multi-process setup
(e2e src/fastertransformer/utils/nccl_utils.cc:308-411 builds a 2D
(tensor, pipeline) NCCL comm grid over MPI ranks; examples run under
mpirun, e2e examples/cpp/llama/llama_example.cc:39). Here:

  * `initialize()` wraps `jax.distributed.initialize` — the coordinator
    service plays MPI's bootstrap role (rank/world discovery, barriers) and
    is auto-detected on real clusters (TPU pods, SLURM, GKE) or passed
    explicitly. On CPU it enables gloo collectives so multi-process serving
    is testable on a single box (the capability FasterTransformer never had,
    SURVEY.md §4.3).
  * `process_mesh()` builds a Mesh whose TENSOR axis prefers devices within
    one process/host (ICI — the per-layer psums are latency-critical) and
    whose DATA axis crosses processes (DCN — one all-reduce-free batch
    split), the standard hybrid ICI×DCN layout (scaling-book recipe). This
    is the analogue of the reference pinning tensor_para to intra-node
    ranks and pipeline_para across nodes.

Launch (one command per host/process):

    COORD=host0:8476
    python serve.py --coordinator $COORD --num-processes 2 --process-id 0 &
    python serve.py --coordinator $COORD --num-processes 2 --process-id 1

On TPU pods `jax.distributed.initialize()` needs no arguments (metadata
discovery); `process_mesh(tp, dp)` then lays TP over each host's local
chips' ICI automatically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
    cpu_collectives: str = "gloo",
) -> None:
    """Bootstrap the multi-process JAX runtime (the MPI_Init analogue).

    All arguments are optional on managed clusters (TPU pods / SLURM /
    GKE) where `jax.distributed` auto-discovers them; pass them explicitly
    for manual launches. On the CPU platform, enables ``cpu_collectives``
    (gloo by default) so cross-process psum/all_gather legalize — without
    it XLA:CPU has no cross-process collective implementation.
    """
    import jax

    # Must be set before backend init; harmless if the platform is not CPU.
    try:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    except Exception:  # older jaxlib without the option: TPU-only runtime
        pass
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def process_mesh(tp: int, dp: int = 1, devices=None):
    """(data, model) Mesh over all processes, TP packed within a host.

    Axis placement: the `model` (tensor) axis is laid over devices of ONE
    process first — its two psums per layer must ride ICI; the `data` axis
    takes the across-process (DCN) dimension, where one gradient/batch
    boundary crossing per step is cheap. If tp exceeds the local device
    count, the model axis spills across processes (legal, but every layer
    then pays DCN latency — the reference equivalently forbids
    tensor_para > gpus_per_node).

    Single-process: plain reshape (identical to tp.make_mesh).
    """
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    nproc = max(getattr(d, "process_index", 0) for d in devices) + 1
    total = len(devices)
    if nproc == 1:
        # single process may use a SUBSET of local devices (tp=2 of 8)
        assert tp * dp <= total, f"need {tp * dp} devices, have {total}"
        arr = np.asarray(devices[: tp * dp]).reshape(dp, tp)
        return Mesh(arr, axis_names=("data", "model"))
    assert tp * dp == total, f"tp*dp={tp*dp} != total devices {total}"

    local = total // nproc
    if tp <= local:
        assert local % tp == 0, f"tp={tp} must divide local devices {local}"
        dp_in, tp_in = local // tp, tp
        dp_dcn, tp_dcn = nproc, 1
    else:
        assert tp % local == 0, f"tp={tp} must be a multiple of local {local}"
        dp_in, tp_in = 1, local
        tp_dcn = tp // local
        assert nproc % tp_dcn == 0, (nproc, tp_dcn)
        dp_dcn = nproc // tp_dcn
    assert dp_in * dp_dcn == dp, (
        f"dp={dp} incompatible with {nproc} processes x {local} local devices "
        f"at tp={tp} (need dp={dp_in * dp_dcn})"
    )
    from jax.experimental import mesh_utils

    arr = mesh_utils.create_hybrid_device_mesh(
        (dp_in, tp_in), (dp_dcn, tp_dcn), devices=devices,
        process_is_granule=True,
    )
    return Mesh(arr, axis_names=("data", "model"))
