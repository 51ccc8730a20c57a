"""TPU serving-throughput benchmark through the continuous-batching
scheduler: Poisson arrivals at several offered loads, paged KV + prefix
cache, measuring tok/s, TTFT p50/p99, and steady-state ms/token — for both
the per-token tick (fused=0) and the fused multi-step tick.

This measures what an HTTP user experiences (BatchScheduler.step() is
exactly what serve/http.py drives); the reference has no equivalent
continuous-batching surface (its FT harness decodes a static batch,
Llama.cc:970-1240).

Run:  nohup python scripts/bench_serving.py > /tmp/serving.log 2>&1 &

Env:
  FLEXQ_BENCH_WBITS   4 (default; W4A8 flagship) | 6 (llama_flex W6)
  FLEXQ_SERVE_FUSED   comma list of fused_tick values   (default "0,8")
  FLEXQ_SERVE_LOADS   offered req/s list                (default "1.0,2.0,3.0")
  FLEXQ_SERVE_DUR     seconds of arrivals per load      (default 60)
  FLEXQ_SERVE_SLOTS   scheduler slots                   (default 8)
  FLEXQ_SERVE_GEN     generated tokens per request      (default 256)
  FLEXQ_SERVE_PROMPT  prompt tokens per request         (default 128)
  FLEXQ_SERVE_MAXLEN  cache length                      (default 2048)
  FLEXQ_SERVE_CHUNK   chunked-prefill chunk (0 = page)  (default 0)
  FLEXQ_SERVE_HTTP    1 = drive the real HTTP server (SSE TTFT)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from flexq_tpu.config import QuantPolicy
from flexq_tpu.serve.scheduler import BatchScheduler

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_e2e7b import synth_llama7b_quantized  # noqa: E402

PROMPT_LEN = int(os.environ.get("FLEXQ_SERVE_PROMPT", "128"))
MAX_LEN = int(os.environ.get("FLEXQ_SERVE_MAXLEN", "2048"))


def _policy():
    wbits = os.environ.get("FLEXQ_BENCH_WBITS", "4")
    if wbits == "4":
        return QuantPolicy.uniform("llama", wbits=4, abits=8), "W4A8"
    return QuantPolicy.llama_flex(), "W6(flex)"


def make_sched(cfg, qparams, policy, fused_tick: int, slots: int):
    return BatchScheduler(
        qparams, cfg, policy,
        num_slots=slots, max_seq_len=MAX_LEN, kv_dtype=jnp.int8,
        paged=True, page_size=128, prefix_cache=True,
        prefill_chunk=int(os.environ.get("FLEXQ_SERVE_CHUNK", "0")) or None,
        num_pages=int(os.environ.get("FLEXQ_SERVE_PAGES", "0")) or None,
        max_prefilling=int(os.environ.get("FLEXQ_SERVE_MAXPREFILL", "0")) or None,
        fused_tick=fused_tick,
    )


def run_load(sched, arrivals, prompts, gen: int):
    """Drive the scheduler against a fixed arrival schedule (seconds from
    start). Returns aggregate throughput + TTFT/completion latencies."""
    state = {}
    next_arrival = 0
    t0 = time.perf_counter()
    pending_first = set()
    total_tokens = 0
    while next_arrival < len(arrivals) or sched.has_work:
        now = time.perf_counter() - t0
        while next_arrival < len(arrivals) and arrivals[next_arrival] <= now:
            rid = sched.add_request(
                prompts[next_arrival], max_new_tokens=gen, eos_id=-1
            )
            state[rid] = {"arrival": arrivals[next_arrival]}
            pending_first.add(rid)
            next_arrival += 1
        if not sched.has_work:
            # idle gap before the next arrival
            time.sleep(min(0.002, max(0.0, arrivals[next_arrival] - now)))
            continue
        done = sched.step()
        now = time.perf_counter() - t0
        if int(now) % 30 == 0 and abs(now - int(now)) < 0.02:
            print(f"    load t={now:.0f}s done={len([s for s in state.values() if 'done' in s])}",
                  flush=True)
        if pending_first:
            for s in sched.slots:
                if s.req_id in pending_first and (s.generated or s.prior):
                    state[s.req_id]["first"] = now
                    pending_first.discard(s.req_id)
        for rid, toks in done.items():
            st = state[rid]
            st.setdefault("first", now)  # finished within its first tick
            pending_first.discard(rid)
            st["done"] = now
            st["ntok"] = len(toks)
            total_tokens += len(toks)
    elapsed = time.perf_counter() - t0
    ttft = np.asarray([s["first"] - s["arrival"] for s in state.values()])
    lat = np.asarray([s["done"] - s["arrival"] for s in state.values()])
    return {
        "requests": len(state),
        "elapsed_s": round(elapsed, 2),
        "tok_s": round(total_tokens / elapsed, 1),
        "ttft_p50_ms": round(float(np.percentile(ttft, 50)) * 1e3, 1),
        "ttft_p99_ms": round(float(np.percentile(ttft, 99)) * 1e3, 1),
        "latency_p50_s": round(float(np.percentile(lat, 50)), 2),
        "latency_p99_s": round(float(np.percentile(lat, 99)), 2),
    }


def run_saturated(sched, prompts, gen: int, batch: int):
    """Steady-state ms/token with `batch` slots continuously busy — the
    comparison point against the Engine fused loop's ms/step."""
    rids = [
        sched.add_request(prompts[i], max_new_tokens=gen, eos_id=-1)
        for i in range(batch)
    ]
    # admit + prefill outside the timed region (prefill is measured by TTFT
    # in run_load; this isolates decode-tick cost)
    done = {}
    while not all(
        s.req_id in rids and (s.generated or s.prior) for s in sched.slots[:batch]
    ):
        done.update(sched.step())
        if not sched.has_work:
            break
    t0 = time.perf_counter()
    ticks = 0
    while sched.has_work:
        done.update(sched.step())
        ticks += 1
        if ticks % 16 == 0:  # axon stall forensics: show liveness
            print(f"    sat tick {ticks} @ {time.perf_counter()-t0:.1f}s",
                  flush=True)
    dt = time.perf_counter() - t0
    toks = sum(len(done[r]) for r in rids if r in done)
    return {
        "batch": batch,
        "ms_per_token_per_slot": round(dt / (toks / batch) * 1e3, 3),
        "tok_s": round(toks / dt, 1),
    }


def run_http_load(port, arrivals, prompts, gen: int):
    """Drive the REAL HTTP server (serve/http.py) with Poisson arrivals:
    one thread per request POSTs /v1/completions with stream=true; TTFT is
    the first SSE data chunk's wall time. Measures what a network client
    sees (scheduler + service thread + HTTP + SSE framing)."""
    import threading
    import urllib.request

    results = []
    lock = threading.Lock()
    t0 = time.perf_counter()

    def one(arrival, prompt):
        delay = arrival - (time.perf_counter() - t0)
        if delay > 0:
            time.sleep(delay)
        start = time.perf_counter() - t0
        body = json.dumps({
            "prompt": [prompt], "max_tokens": gen, "eos_id": -1,
            "stream": True,
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions", data=body,
            headers={"Content-Type": "application/json"},
        )
        first = done = None
        ntok = 0
        with urllib.request.urlopen(req, timeout=600) as r:
            for line in r:
                if line.startswith(b"data:"):
                    now = time.perf_counter() - t0
                    if b"[DONE]" in line:
                        done = now
                        break
                    if first is None:
                        first = now
                    ntok += 1
        with lock:
            results.append((start, first, done, ntok))

    threads = [
        threading.Thread(target=one, args=(a, prompts[i]), daemon=True)
        for i, a in enumerate(arrivals)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    elapsed = time.perf_counter() - t0
    ttft = np.asarray([f - s for s, f, d, n in results if f is not None])
    lat = np.asarray([d - s for s, f, d, n in results if d is not None])
    # eos=-1 => every completed request generated exactly `gen` tokens
    # (SSE events may batch several tokens per poll under fused ticks)
    toks = sum(gen for _, _, d, _ in results if d is not None)
    return {
        "requests": len(results),
        "elapsed_s": round(elapsed, 2),
        "tok_s": round(toks / elapsed, 1),
        "ttft_p50_ms": round(float(np.percentile(ttft, 50)) * 1e3, 1),
        "ttft_p99_ms": round(float(np.percentile(ttft, 99)) * 1e3, 1),
        "latency_p50_s": round(float(np.percentile(lat, 50)), 2),
        "latency_p99_s": round(float(np.percentile(lat, 99)), 2),
    }


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    policy, ptag = _policy()
    print(f"policy: {ptag}", flush=True)
    cfg, qparams = synth_llama7b_quantized(policy)

    slots = int(os.environ.get("FLEXQ_SERVE_SLOTS", "8"))
    gen = int(os.environ.get("FLEXQ_SERVE_GEN", "256"))
    dur = float(os.environ.get("FLEXQ_SERVE_DUR", "60"))
    loads = [float(x) for x in os.environ.get("FLEXQ_SERVE_LOADS", "1.0,2.0,3.0").split(",")]
    fused_ticks = [int(x) for x in os.environ.get("FLEXQ_SERVE_FUSED", "0,8").split(",")]

    rng = np.random.default_rng(0)
    # identical workload across configs: pre-drawn Poisson arrivals + prompts
    workloads = {}
    for load in loads:
        n = max(4, int(load * dur))
        gaps = rng.exponential(1.0 / load, n)
        workloads[load] = np.cumsum(gaps)
    max_n = max(len(a) for a in workloads.values())
    prompts = [
        rng.integers(10, 31000, PROMPT_LEN).tolist() for _ in range(max_n)
    ]

    results = {}
    for ft in fused_ticks:
        tag = f"fused{ft}"
        sched = make_sched(cfg, qparams, policy, ft, slots)
        # warmup: compile prefill + tick programs
        print(f"[{tag}] compiling ...", flush=True)
        t0 = time.perf_counter()
        for i in range(2):
            # max_new is host state, not a compile key: 8 tokens warm every
            # program the measured runs use
            sched.add_request(prompts[i], max_new_tokens=8, eos_id=-1)
        sched.run()
        print(f"[{tag}] warmup {time.perf_counter()-t0:.1f}s", flush=True)

        # 64 tokens/slot is enough for a stable ms/token and keeps the
        # slow per-token-tick baseline bounded (~611 ms/token on axon)
        sat = run_saturated(sched, prompts, min(gen, 64), min(4, slots))
        results[f"{tag}_saturated_B4"] = sat
        print(f"[{tag}] saturated: {sat}", flush=True)

        capacity_req_s = sat["tok_s"] / gen * (slots / sat["batch"])
        if os.environ.get("FLEXQ_SERVE_HTTP"):
            # drive the real HTTP server instead of the scheduler directly
            # (one server per config; loads run back-to-back against it)
            from flexq_tpu.serve.http import serve_background
            from flexq_tpu.serve.tokenizer import load_tokenizer

            server, service, port = serve_background(
                sched, "127.0.0.1", 0, tokenizer=load_tokenizer(None)
            )
            for load in loads:
                if load > 0.9 * capacity_req_s:
                    print(f"[{tag}] http load {load}/s skipped", flush=True)
                    continue
                r = run_http_load(port, workloads[load], prompts, gen)
                r["offered_req_s"] = load
                results[f"{tag}_http_load{load}"] = r
                print(f"[{tag}] http load {load}/s: {r}", flush=True)
            service.shutdown()
            server.shutdown()
            continue
        for load in loads:
            if load > 0.9 * capacity_req_s:
                # >90% of measured capacity: the queue diverges and the run
                # time is unbounded (the per-token-tick config saturates at
                # ~1/100th of the fused tick's throughput on axon)
                print(f"[{tag}] load {load}/s skipped (capacity "
                      f"~{capacity_req_s:.2f} req/s)", flush=True)
                results[f"{tag}_load{load}"] = {
                    "offered_req_s": load, "skipped": "exceeds capacity",
                    "capacity_req_s": round(capacity_req_s, 2),
                }
                continue
            r = run_load(sched, workloads[load], prompts, gen)
            r["offered_req_s"] = load
            results[f"{tag}_load{load}"] = r
            print(f"[{tag}] load {load}/s: {r}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
