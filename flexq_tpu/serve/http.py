"""HTTP serving front-end over the continuous-batching scheduler.

The serving-surface parity piece for the reference's Triton backend
(e2e triton_backend/llama/LlamaTritonModel.cc — multi-instance request
serving in front of the same model graph). TPU-native shape: a thin
stdlib-only JSON API in front of BatchScheduler; requests from many
connections are admitted into the scheduler's slots and decoded together
(continuous batching), each response returning when its request finishes.

API:
  GET  /health            -> {"ok": true, "slots": N, "pending": M}
  GET  /metrics           -> request/token counters, tok/s, slot occupancy
  POST /generate          body: {"prompt_ids": [int...],
                                 "max_new_tokens": int = 64,
                                 "temperature"/"top_k"/"top_p"/
                                 "repetition_penalty": sampling overrides,
                                 "eos_id": int = 2,
                                 "logprobs": bool = false}
                          -> {"request_id": int, "tokens": [int...],
                              "logprobs": [float...], "cum_logprob": float
                              (when requested — FT output_log_probs parity)}

Run:  python -m flexq_tpu.serve.http --port 8000 ... (see main()); tests
drive it in-process via serve_background().
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

from flexq_tpu.serve.sampling import SamplingParams


class SchedulerService:
    """Thread-safe wrapper: one worker thread drives scheduler.step();
    callers block on per-request events."""

    def __init__(self, scheduler, poll_idle_s: float = 0.002):
        self.scheduler = scheduler
        self._lock = threading.Lock()
        self._events: Dict[int, threading.Event] = {}
        self._results: Dict[int, List[int]] = {}
        self._poll_idle_s = poll_idle_s
        self._stop = False
        self._t0 = time.monotonic()
        self._requests_done = 0
        self._tokens_out = 0
        self._steps = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self):
        while not self._stop:
            with self._lock:
                had_work = self.scheduler.has_work
                if had_work:
                    finished = self.scheduler.step()
                    self._steps += 1
                    lps = getattr(self.scheduler, "done_logprobs", {})
                    for rid, toks in finished.items():
                        self._results[rid] = (toks, lps.pop(rid, None))
                        self._requests_done += 1
                        self._tokens_out += len(toks)
                        ev = self._events.get(rid)
                        if ev is not None:
                            ev.set()
            if not had_work:
                time.sleep(self._poll_idle_s)

    def submit(self, prompt, sampling: SamplingParams, max_new: int, eos_id: int,
               logprobs: bool = False) -> int:
        with self._lock:
            rid = self.scheduler.add_request(
                prompt, sampling=sampling, max_new_tokens=max_new, eos_id=eos_id,
                logprobs=logprobs,
            )
            self._events[rid] = threading.Event()
        return rid

    def wait(self, rid: int, timeout: Optional[float] = None) -> List[int]:
        toks, _ = self.wait_full(rid, timeout)
        return toks

    def wait_full(self, rid: int, timeout: Optional[float] = None):
        """Returns (tokens, logprobs-or-None)."""
        ev = self._events[rid]
        if not ev.wait(timeout):
            raise TimeoutError(f"request {rid} not finished")
        with self._lock:
            self._events.pop(rid, None)
            return self._results.pop(rid)

    def stats(self) -> Dict[str, int]:
        with self._lock:
            return {
                "slots": self.scheduler.num_slots,
                "active": sum(
                    1 for s in self.scheduler.slots if s.req_id is not None
                ),
                "pending": len(self.scheduler.pending),
            }

    def metrics(self) -> Dict[str, float]:
        up = max(time.monotonic() - self._t0, 1e-9)
        with self._lock:
            m = {
                "uptime_s": round(up, 3),
                "requests_completed": self._requests_done,
                "tokens_generated": self._tokens_out,
                "decode_steps": self._steps,
                "tokens_per_s_lifetime": round(self._tokens_out / up, 3),
                **{f"slots_{k}": v for k, v in (
                    ("total", self.scheduler.num_slots),
                    ("active", sum(1 for s in self.scheduler.slots if s.req_id is not None)),
                )},
                "pending": len(self.scheduler.pending),
            }
            if getattr(self.scheduler, "paged", False):
                m["pages_free"] = self.scheduler.pool.free_pages
                m["pages_total"] = self.scheduler.pool.num_pages
            reg = getattr(self.scheduler, "registry", None)
            if reg is not None:
                m["prefix_pages_hit"] = reg.hits
                m["prefix_pages_missed"] = reg.misses
                m["prefix_pages_retained"] = reg.reclaimable
            return m

    def shutdown(self):
        self._stop = True
        self._worker.join(timeout=5)


def _make_handler(service: SchedulerService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"ok": True, **service.stats()})
            elif self.path == "/metrics":
                self._send(200, service.metrics())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                prompt = [int(t) for t in req["prompt_ids"]]
                sampling = SamplingParams(
                    temperature=float(req.get("temperature", 1.0)),
                    top_k=int(req.get("top_k", 0)),
                    top_p=float(req.get("top_p", 1.0)),
                    repetition_penalty=float(req.get("repetition_penalty", 1.0)),
                    greedy=bool(req.get("greedy", True)),
                )
                want_lp = bool(req.get("logprobs", False))
                rid = service.submit(
                    prompt,
                    sampling,
                    int(req.get("max_new_tokens", 64)),
                    int(req.get("eos_id", 2)),
                    logprobs=want_lp,
                )
                tokens, lps = service.wait_full(
                    rid, timeout=float(req.get("timeout", 600))
                )
                resp = {"request_id": rid, "tokens": tokens}
                if lps is not None:
                    resp["logprobs"] = lps
                    resp["cum_logprob"] = sum(lps)
                self._send(200, resp)
            except (KeyError, ValueError, TypeError) as e:
                self._send(400, {"error": str(e)})
            except TimeoutError as e:
                self._send(504, {"error": str(e)})

    return Handler


def serve_background(scheduler, host: str = "127.0.0.1", port: int = 0):
    """Start the HTTP server on a daemon thread.
    Returns (server, service, actual_port)."""
    service = SchedulerService(scheduler)
    server = ThreadingHTTPServer((host, port), _make_handler(service))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, service, server.server_address[1]


def main():
    import argparse

    import jax.numpy as jnp

    from flexq_tpu.config import ModelConfig, QuantPolicy
    from flexq_tpu.export.exporter import load_packed
    from flexq_tpu.serve.scheduler import BatchScheduler

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True, help="packed checkpoint dir")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    ap.add_argument("--kv-dtype", default="bfloat16", choices=["bfloat16", "int8"])
    ap.add_argument("--paged", action="store_true", help="paged KV pool")
    ap.add_argument("--page-size", type=int, default=128)
    ap.add_argument("--prefill-chunk", type=int, default=None)
    ap.add_argument(
        "--prefix-cache", action="store_true",
        help="reuse identical prompt-prefix pages across requests (paged only)",
    )
    args = ap.parse_args()

    cfg, policy, params = load_packed(args.checkpoint)
    sched = BatchScheduler(
        params,
        cfg,
        policy,
        num_slots=args.slots,
        max_seq_len=args.max_seq_len,
        kv_dtype=jnp.int8 if args.kv_dtype == "int8" else jnp.bfloat16,
        paged=args.paged or args.prefix_cache,
        page_size=args.page_size,
        prefill_chunk=args.prefill_chunk,
        prefix_cache=args.prefix_cache,
    )
    server, service, port = serve_background(sched, args.host, args.port)
    print(f"serving on {args.host}:{port} ({args.slots} slots)", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        service.shutdown()
        server.shutdown()


if __name__ == "__main__":
    main()
