"""OpenAI-compatible endpoints (/v1/completions, /v1/chat/completions).

The reference's serving surface is raw-id tensors (Triton backend /
llama_example start_ids.csv); the text-in/text-out layer here is the TPU
framework's equivalent of that client integration surface, with the byte
tokenizer making it testable without tokenizer files.
"""

import http.client
import json
import urllib.request

import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig, LlamaForCausalLM

from flexq_tpu.config import QuantPolicy
from flexq_tpu.models import config_from_hf, from_hf_llama
from flexq_tpu.models.quantized import quantize_params
from flexq_tpu.serve.http import serve_background
from flexq_tpu.serve.scheduler import BatchScheduler
from flexq_tpu.serve.tokenizer import ByteTokenizer, load_tokenizer


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def served():
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=300, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    m = LlamaForCausalLM(cfg).eval()
    mcfg = config_from_hf(m.config)
    params = from_hf_llama(m, dtype=jnp.float32)
    policy = QuantPolicy.llama_flex()
    qparams = quantize_params(params, mcfg, policy, dtype=jnp.float32)
    sched = BatchScheduler(qparams, mcfg, policy, num_slots=2, max_seq_len=48)
    server, service, port = serve_background(sched, model_name="tiny-w6")
    yield port
    service.shutdown()
    server.shutdown()


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    s = "héllo, wörld"
    assert tok.decode(tok.encode(s)) == s
    assert tok.encode(s)[0] == tok.bos_id
    assert load_tokenizer("byte").decode([3 + ord("a")]) == "a"
    tmpl = tok.apply_chat_template(
        [{"role": "system", "content": "be brief"},
         {"role": "user", "content": "hi"}]
    )
    assert "be brief" in tmpl and tmpl.endswith("<|assistant|>\n")


def test_models_listing(served):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{served}/v1/models", timeout=30
    ) as r:
        listing = json.loads(r.read())
    assert listing["data"][0]["id"] == "tiny-w6"


def test_completions_raw_ids_matches_generate(served):
    gen = _post(served, "/generate",
                {"prompt_ids": [1, 5, 9], "max_new_tokens": 5, "eos_id": -1})
    oai = _post(served, "/v1/completions",
                {"prompt": [1, 5, 9], "max_tokens": 5, "temperature": 0,
                 "eos_id": -1})
    assert oai["object"] == "text_completion"
    ch = oai["choices"][0]
    assert ch["token_ids"] == gen["tokens"]
    assert ch["finish_reason"] == "length"
    assert oai["usage"] == {"prompt_tokens": 3, "completion_tokens": 5,
                            "total_tokens": 8}
    # text is the byte-decode of the generated ids
    assert ch["text"] == ByteTokenizer().decode(gen["tokens"])


def test_completions_text_prompt_echo_and_n(served):
    r = _post(served, "/v1/completions",
              {"prompt": "ab", "max_tokens": 4, "temperature": 0,
               "eos_id": -1, "echo": True, "n": 2})
    assert len(r["choices"]) == 2
    # greedy: both samples identical; echo prepends the prompt text
    assert r["choices"][0]["text"] == r["choices"][1]["text"]
    assert r["choices"][0]["text"].startswith("ab")
    assert r["usage"]["prompt_tokens"] == 2 * len(ByteTokenizer().encode("ab"))


def test_completions_logprobs(served):
    r = _post(served, "/v1/completions",
              {"prompt": [1, 7], "max_tokens": 3, "temperature": 0,
               "eos_id": -1, "logprobs": 1})
    lp = r["choices"][0]["logprobs"]
    assert len(lp["token_logprobs"]) == 3
    assert all(v <= 0.0 for v in lp["token_logprobs"])


def test_chat_completions(served):
    r = _post(served, "/v1/chat/completions",
              {"messages": [{"role": "user", "content": "hi"}],
               "max_tokens": 4, "temperature": 0, "eos_id": -1})
    assert r["object"] == "chat.completion"
    msg = r["choices"][0]["message"]
    assert msg["role"] == "assistant" and isinstance(msg["content"], str)
    assert r["usage"]["completion_tokens"] == 4

    bad = urllib.request.Request(
        f"http://127.0.0.1:{served}/v1/chat/completions",
        data=json.dumps({"messages": []}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(bad, timeout=30)
    assert ei.value.code == 400


def test_completions_streaming_matches_nonstream(served):
    body = {"prompt": "xy", "max_tokens": 6, "temperature": 0, "eos_id": -1}
    want = _post(served, "/v1/completions", body)["choices"][0]["text"]

    conn = http.client.HTTPConnection("127.0.0.1", served, timeout=300)
    conn.request("POST", "/v1/completions",
                 json.dumps({**body, "stream": True}),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "text/event-stream"
    text, finish, done = "", None, False
    for raw in resp.fp:
        line = raw.decode().strip()
        if not line.startswith("data: "):
            continue
        payload = line[len("data: "):]
        if payload == "[DONE]":
            done = True
            break
        chunk = json.loads(payload)
        assert chunk["object"] == "text_completion"
        c = chunk["choices"][0]
        text += c["text"]
        if c["finish_reason"]:
            finish = c["finish_reason"]
    conn.close()
    assert done and finish == "length"
    assert text == want
