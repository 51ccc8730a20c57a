"""HTTP front-end over the continuous-batching scheduler."""

import json
import urllib.request

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig, LlamaForCausalLM

from flexq_tpu.config import QuantPolicy
from flexq_tpu.models import config_from_hf, from_hf_llama
from flexq_tpu.models.quantized import quantize_params
from flexq_tpu.serve.http import serve_background
from flexq_tpu.serve.scheduler import BatchScheduler


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def test_http_generate_matches_scheduler():
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg).eval()
    mcfg = config_from_hf(m.config)
    params = from_hf_llama(m, dtype=jnp.float32)
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, mcfg, policy, dtype=jnp.float32)

    # reference result via a direct scheduler run
    ref_sched = BatchScheduler(qparams, mcfg, policy, num_slots=2, max_seq_len=48)
    r1 = ref_sched.add_request([1, 5, 9], max_new_tokens=5, eos_id=-1)
    r2 = ref_sched.add_request([2, 4, 8], max_new_tokens=5, eos_id=-1)
    want = ref_sched.run()

    sched = BatchScheduler(qparams, mcfg, policy, num_slots=2, max_seq_len=48)
    server, service, port = serve_background(sched)
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["slots"] == 2

        import threading

        results = {}

        def call(name, prompt):
            results[name] = _post(
                port, "/generate",
                {"prompt_ids": prompt, "max_new_tokens": 5, "eos_id": -1},
            )

        t1 = threading.Thread(target=call, args=("a", [1, 5, 9]))
        t2 = threading.Thread(target=call, args=("b", [2, 4, 8]))
        t1.start(); t2.start(); t1.join(120); t2.join(120)
        assert results["a"]["tokens"] == want[r1]
        assert results["b"]["tokens"] == want[r2]

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=b'{"nope": 1}',
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        service.shutdown()
        server.shutdown()


def test_http_metrics_endpoint():
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg).eval()
    mcfg = config_from_hf(m.config)
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(from_hf_llama(m, dtype=jnp.float32), mcfg, policy,
                              dtype=jnp.float32)
    sched = BatchScheduler(qparams, mcfg, policy, num_slots=2, max_seq_len=256,
                           paged=True, page_size=128, kv_dtype=jnp.float32)
    server, service, port = serve_background(sched)
    try:
        _ = _post(port, "/generate", {"prompt_ids": [1, 2, 3],
                                      "max_new_tokens": 4, "eos_id": -1})
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
            met = json.loads(r.read())
        assert met["requests_completed"] == 1 and met["tokens_generated"] == 4
        assert met["pages_total"] > met["pages_free"] >= 0 or met["pages_free"] == met["pages_total"] - 1
    finally:
        service.shutdown()
        server.shutdown()


def test_http_serving_from_tp_sharded_checkpoint(tmp_path):
    """The HTTP CLI load path for a --tp export: load_packed_sharded onto a
    mesh, BatchScheduler(mesh=...), serve — generations must match a
    single-device scheduler over the full checkpoint."""
    from flexq_tpu.export import export_checkpoint, load_packed
    from flexq_tpu.export.exporter import load_packed_sharded
    from flexq_tpu.parallel import make_mesh

    torch.manual_seed(6)
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg).eval()
    hf_dir = tmp_path / "hf"
    m.save_pretrained(hf_dir, safe_serialization=True)
    packed = tmp_path / "tp2"
    export_checkpoint(str(hf_dir), str(packed), tp=2)

    # reference: the same mesh over the full reassembled tree (identical
    # arrays + shardings => identical executable => identical tokens; a
    # single-DEVICE reference would differ by bf16 near-tie argmax flips
    # between the eager and compiled paths)
    mcfg, policy, full = load_packed(str(packed))
    mesh = make_mesh(tp=2, dp=1)
    ref = BatchScheduler(
        full, mcfg, policy, num_slots=2, max_seq_len=48, mesh=mesh
    )
    a = ref.add_request([1, 5, 9], max_new_tokens=5, eos_id=-1)
    want = ref.run()[a]

    _, _, params = load_packed_sharded(str(packed), mesh)
    sched = BatchScheduler(
        params, mcfg, policy, num_slots=2, max_seq_len=48, mesh=mesh
    )
    server, service, port = serve_background(sched)
    try:
        got = _post(
            port, "/generate",
            {"prompt_ids": [1, 5, 9], "max_new_tokens": 5, "eos_id": -1},
        )
        assert got["tokens"] == want, (got, want)
    finally:
        service.shutdown()
        server.shutdown()


def test_http_admission_control():
    """max_pending -> 429 + Retry-After; queue_timeout -> 503; /metrics
    exposes queue depth and shed/reject counters (VERDICT r3 weak #4)."""
    import threading
    import urllib.error

    torch.manual_seed(1)
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg).eval()
    mcfg = config_from_hf(m.config)
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(from_hf_llama(m, dtype=jnp.float32), mcfg, policy,
                              dtype=jnp.float32)
    sched = BatchScheduler(qparams, mcfg, policy, num_slots=1, max_seq_len=256)
    server, service, port = serve_background(
        sched, max_pending=1, queue_timeout_s=0.25
    )
    try:
        results = {}

        def call(name, max_new):
            try:
                results[name] = _post(
                    port, "/generate",
                    {"prompt_ids": [1, 2, 3], "max_new_tokens": max_new,
                     "eos_id": -1},
                )
            except urllib.error.HTTPError as e:
                results[name] = e.code, dict(e.headers), json.loads(e.read())

        # occupy the single slot for a while, then fill the 1-deep queue
        t1 = threading.Thread(target=call, args=("run", 200))
        t1.start()
        import time as _t

        for _ in range(200):  # wait until the first request holds the slot
            if any(s.req_id is not None for s in sched.slots):
                break
            _t.sleep(0.01)
        t2 = threading.Thread(target=call, args=("queued", 4))
        t2.start()
        for _ in range(200):
            if len(sched.pending) >= 1:
                break
            _t.sleep(0.01)
        call("rejected", 4)  # queue full -> 429 with Retry-After
        code, headers, body = results["rejected"]
        assert code == 429
        assert headers.get("Retry-After") == "1"
        assert body["error"]["type"] == "rate_limit_error"

        t1.join(180)
        t2.join(180)
        # the queued request waited > queue_timeout (the slot ran 200 tokens)
        # so it was shed with a 503
        code, _, body = results["queued"]
        assert code == 503
        assert body["error"]["type"] == "overloaded_error"
        assert len(results["run"]["tokens"]) == 200  # admitted work unharmed

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=30
        ) as r:
            met = json.loads(r.read())
        assert met["admission_rejected_total"] == 1
        assert met["queue_shed_total"] == 1
        assert met["queue_depth"] == 0
    finally:
        service.shutdown()
        server.shutdown()
