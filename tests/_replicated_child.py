"""Child for the 2-process replicated-serving test (not a pytest module).

Usage: python tests/_replicated_child.py <process_id> <coord_port> <cmd_port>

Process 0 = leader (accepts requests, ships the command log); process 1 =
follower (mirrors commands, enters the same jitted TP steps). The mesh is
tp=2 SPANNING the two processes, so every scheduler step's psums cross the
process boundary — this is the reference's mpirun -n 2 serving topology.
The leader compares its results against a process-local single-device
scheduler run of the same requests.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid, coord_port, cmd_port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

from flexq_tpu.parallel.distributed import initialize, process_mesh  # noqa: E402

initialize(
    coordinator_address=f"127.0.0.1:{coord_port}", num_processes=2,
    process_id=pid,
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import __graft_entry__  # noqa: E402
from flexq_tpu.serve.replicated import ReplicatedScheduler  # noqa: E402
from flexq_tpu.serve.scheduler import BatchScheduler  # noqa: E402

cfg, policy, qparams = __graft_entry__._tiny_quantized(
    hidden=256, layers=1, heads=2, kv_heads=2, vocab=128, dtype=jnp.float32
)
mesh = process_mesh(tp=2, dp=1)


def make_sched():
    # fused multi-step ticks replicate too: both processes run the same
    # deterministic K-step device program per tick frame
    return BatchScheduler(
        qparams, cfg, policy, num_slots=2, max_seq_len=256,
        kv_dtype=jnp.float32, mesh=mesh, fused_tick=3,
    )


if pid == 0:
    rep = ReplicatedScheduler(
        make_sched(), leader=True, port=cmd_port, num_followers=1,
        host="127.0.0.1",
    )
    r1 = rep.add_request([3, 14, 15, 9], max_new_tokens=5, eos_id=-1)
    r2 = rep.add_request([7, 7], max_new_tokens=4, eos_id=-1)
    got = rep.run()
    # beam-search request across the process-spanning mesh (KV row reorder
    # + joint top-k replicate too), plus a replicated mid-flight cancel
    rb = rep.add_request([1, 2, 3], max_new_tokens=4, eos_id=-1, beam_width=2)
    rc = rep.add_request([9, 9], max_new_tokens=64, eos_id=-1)
    rep.step()
    # pending cancel (slots are beam-occupied): dropped with prior tokens
    got[rc] = rep.cancel(rc)
    got.update(rep.run())
    rep.shutdown()
    # reference: single-device (process-local) scheduler, same command log
    ref = BatchScheduler(qparams, cfg, policy, num_slots=2, max_seq_len=256,
                         kv_dtype=jnp.float32, fused_tick=3)
    e1 = ref.add_request([3, 14, 15, 9], max_new_tokens=5, eos_id=-1)
    e2 = ref.add_request([7, 7], max_new_tokens=4, eos_id=-1)
    want = ref.run()
    eb = ref.add_request([1, 2, 3], max_new_tokens=4, eos_id=-1, beam_width=2)
    ec = ref.add_request([9, 9], max_new_tokens=64, eos_id=-1)
    ref.step()
    want[ec] = ref.cancel(ec)
    want.update(ref.run())
    assert got[r1] == want[e1], (got, want)
    assert got[r2] == want[e2], (got, want)
    assert got[rb] == want[eb], (got, want)
    assert got[rc] == want[ec], (got, want)
    print("REPLICATED_OK leader", flush=True)
else:
    rep = ReplicatedScheduler(
        make_sched(), leader=False, leader_addr=("127.0.0.1", cmd_port),
    )
    rep.serve_forever()
    print("REPLICATED_OK follower", flush=True)
