"""Multi-process (multi-host) serving: leader/follower command replication.

In the reference, every MPI rank runs the same Llama<T>::forward loop and
rank 0 owns I/O — requests reach all ranks because mpirun launches them with
identical inputs and NCCL keeps them in lockstep (llama_example.cc:39,
Llama.cc:970-1240, triton multi-instance likewise). Under JAX multi-process,
a computation over a mesh that spans processes must be entered by EVERY
process with the same program. The BatchScheduler is deterministic given an
identical sequence of (add_request, step) commands — sampling keys are
seeded, host bookkeeping is pure function of the command log — so
multi-host serving reduces to replicating that command log:

  * The LEADER wraps a BatchScheduler; add_request() buffers the request,
    and each step() first ships the buffered commands + a step marker to
    every follower over TCP, then applies and steps locally.
  * Each FOLLOWER applies the same commands to its own BatchScheduler
    replica and calls step() — entering the same jitted TP computations, so
    the cross-process psums/all_gathers line up. Results surface on the
    leader (logits are replicated across the mesh, so each process samples
    identically from its local copy).

Wire format: length-prefixed JSON frames (no pickle: followers should not
execute arbitrary objects from the wire).

Usage (one process per host; mesh from parallel/distributed.py):

    # leader (process 0)
    sched = ReplicatedScheduler(BatchScheduler(..., mesh=mesh),
                                leader=True, port=9123, num_followers=N-1)
    # followers (processes 1..N-1)
    ReplicatedScheduler(BatchScheduler(..., mesh=mesh), leader=False,
                        leader_addr=("host0", 9123)).serve_forever()

The leader exposes the BatchScheduler surface (add_request/step/run/
has_work), so SchedulerService/HTTP work unchanged on top of it.
"""

from __future__ import annotations

import json
import socket
import struct
from typing import Dict, List, Optional, Tuple

from flexq_tpu.serve.sampling import SamplingParams


def _send_frame(sock: socket.socket, obj) -> None:
    data = json.dumps(obj).encode()
    sock.sendall(struct.pack(">I", len(data)) + data)


def _recv_frame(sock: socket.socket):
    hdr = b""
    while len(hdr) < 4:
        chunk = sock.recv(4 - len(hdr))
        if not chunk:
            raise ConnectionError("leader closed")
        hdr += chunk
    (n,) = struct.unpack(">I", hdr)
    data = b""
    while len(data) < n:
        chunk = sock.recv(n - len(data))
        if not chunk:
            raise ConnectionError("leader closed")
        data += chunk
    return json.loads(data)


def _sampling_to_json(s: SamplingParams) -> Dict:
    import dataclasses

    return dataclasses.asdict(s)


def _sampling_from_json(d: Dict) -> SamplingParams:
    return SamplingParams(**d)


class ReplicatedScheduler:
    """Command-log replication around a BatchScheduler (see module doc)."""

    def __init__(
        self,
        scheduler,
        leader: bool,
        port: int = 0,
        num_followers: int = 0,
        leader_addr: Optional[Tuple[str, int]] = None,
        host: str = "0.0.0.0",
    ):
        self.scheduler = scheduler
        self.leader = leader
        self._pending_cmds: List[Dict] = []
        self._followers: List[socket.socket] = []
        self._sock: Optional[socket.socket] = None
        if leader:
            if num_followers > 0:
                srv = socket.socket()
                srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
                srv.bind((host, port))
                srv.listen(num_followers)
                self.port = srv.getsockname()[1]
                self._srv = srv
                for _ in range(num_followers):
                    conn, _ = srv.accept()
                    conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                    self._followers.append(conn)
            else:
                self.port = None
        else:
            assert leader_addr is not None, "followers need leader_addr"
            import time

            deadline = time.monotonic() + 300
            while True:  # the leader may still be binding its port
                try:
                    s = socket.create_connection(leader_addr, timeout=300)
                    break
                except OSError:
                    if time.monotonic() > deadline:
                        raise
                    time.sleep(0.2)
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self._sock = s

    # ---- leader surface (BatchScheduler-compatible) ---------------------
    def add_request(self, prompt, sampling: SamplingParams = SamplingParams(),
                    max_new_tokens: int = 64, eos_id: int = 2,
                    logprobs: bool = False, beam_width: int = 1,
                    n_best: int = 1, length_penalty: float = 1.0) -> int:
        assert self.leader, "only the leader accepts requests"
        self._pending_cmds.append({
            "op": "add",
            "prompt": [int(t) for t in prompt],
            "sampling": _sampling_to_json(sampling),
            "max_new_tokens": int(max_new_tokens),
            "eos_id": int(eos_id),
            "logprobs": bool(logprobs),
            "beam_width": int(beam_width),
            "n_best": int(n_best),
            "length_penalty": float(length_penalty),
        })
        # the local add assigns the req_id; followers assign the same id
        # because their _req_counter sees the same sequence
        return self._apply_add(self.scheduler, self._pending_cmds[-1])

    @staticmethod
    def _apply_add(scheduler, cmd) -> int:
        return scheduler.add_request(
            cmd["prompt"],
            sampling=_sampling_from_json(cmd["sampling"]),
            max_new_tokens=cmd["max_new_tokens"],
            eos_id=cmd["eos_id"],
            logprobs=cmd["logprobs"],
            beam_width=cmd["beam_width"],
            n_best=cmd["n_best"],
            length_penalty=cmd["length_penalty"],
        )

    def cancel(self, req_id: int) -> Optional[List[int]]:
        """Replicated cancel: buffered into the command log (a leader-only
        cancel would fork follower host state and corrupt the lockstep)."""
        assert self.leader
        self._pending_cmds.append({"op": "cancel", "req_id": int(req_id)})
        return self.scheduler.cancel(req_id)

    @property
    def has_work(self) -> bool:
        return self.scheduler.has_work

    @property
    def num_slots(self) -> int:
        return self.scheduler.num_slots

    @property
    def slots(self):
        return self.scheduler.slots

    @property
    def pending(self):
        return self.scheduler.pending

    @property
    def done_logprobs(self):
        return self.scheduler.done_logprobs

    @property
    def done_nbest(self):
        return self.scheduler.done_nbest

    @property
    def beam_groups(self):
        return self.scheduler.beam_groups

    @property
    def paged(self) -> bool:
        return getattr(self.scheduler, "paged", False)

    def shed_beam(self) -> bool:
        """Pool-exhaustion escape hatch. NOT logged as a command: replicas
        are deterministic, so a follower replaying the same tick hits the
        same MemoryError and sheds the same group locally (serve_forever's
        handler) — logging it too would shed twice on followers."""
        assert self.leader
        return self.scheduler.shed_beam()

    def step(self) -> Dict[int, List[int]]:
        assert self.leader
        frame = {"op": "tick", "cmds": self._pending_cmds}
        for f in self._followers:
            _send_frame(f, frame)
        self._pending_cmds = []
        return self.scheduler.step()

    def run(self) -> Dict[int, List[int]]:
        out: Dict[int, List[int]] = {}
        while self.has_work:
            out.update(self.step())
        return out

    def shutdown(self) -> None:
        if self.leader:
            for f in self._followers:
                try:
                    _send_frame(f, {"op": "shutdown"})
                    f.close()
                except OSError:
                    pass

    # ---- follower loop ---------------------------------------------------
    def serve_forever(self) -> None:
        """Mirror the leader's command log until shutdown. Each tick applies
        the adds, then enters the SAME jitted step the leader runs — the
        mesh collectives rendezvous across processes."""
        assert not self.leader
        while True:
            frame = _recv_frame(self._sock)
            if frame["op"] == "shutdown":
                return
            assert frame["op"] == "tick", frame
            for cmd in frame["cmds"]:
                if cmd["op"] == "cancel":
                    self.scheduler.cancel(cmd["req_id"])
                else:
                    self._apply_add(self.scheduler, cmd)
            try:
                self.scheduler.step()
            except MemoryError:
                # deterministic mirror of the leader worker's shed: the
                # same state raised the same error there
                self.scheduler.shed_beam()
