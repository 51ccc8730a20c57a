"""Tokenizer adapters for the text-in/text-out serving surface.

The reference serves raw token ids (examples/cpp/llama reads start_ids.csv;
the Triton backend e2e/triton_backend/llama likewise moves id tensors) and
leaves tokenization to the client. For an OpenAI-style HTTP API the server
itself must tokenize, so this module provides:

  - HFTokenizer: wraps a local `transformers` tokenizer directory (never
    downloads — this environment has no egress).
  - ByteTokenizer: dependency-free UTF-8 byte-level fallback (ids 3..258 are
    bytes; 0/1/2 = pad/bos/eos to match the serve default eos_id=2), so the
    chat/completions endpoints are fully functional and testable without
    tokenizer files.
  - apply_chat_template(): the HF template when available, else a simple
    generic role-tagged format.

load_tokenizer(None | "byte") -> ByteTokenizer; load_tokenizer(path) -> HF.
"""

from __future__ import annotations

from typing import List, Optional, Sequence


class ByteTokenizer:
    """UTF-8 byte-level tokenizer: byte b <-> id 3 + b.

    Vocab layout: 0=pad, 1=bos, 2=eos, 3..258 = the 256 byte values.
    Any model with vocab_size >= 259 can be driven through it (quality of
    byte-level generation depends on the model, but the id mapping is total:
    every string round-trips exactly).
    """

    pad_id = 0
    bos_id = 1
    eos_id = 2
    vocab_size = 259

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids = [3 + b for b in text.encode("utf-8")]
        return [self.bos_id] + ids if add_bos else ids

    def decode(self, ids: Sequence[int]) -> str:
        data = bytes(i - 3 for i in ids if 3 <= int(i) < 259)
        return data.decode("utf-8", errors="replace")

    def apply_chat_template(self, messages: Sequence[dict]) -> str:
        return _generic_chat_template(messages)


class HFTokenizer:
    """Adapter over a local HuggingFace tokenizer directory."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        self.eos_id = int(self.tok.eos_token_id)
        self.bos_id = (
            int(self.tok.bos_token_id) if self.tok.bos_token_id is not None else None
        )

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids = self.tok.encode(text, add_special_tokens=False)
        # chat templates usually embed the BOS token in the text (it
        # re-encodes to bos_id even with add_special_tokens=False) —
        # prepending again would double the BOS and degrade generation
        if add_bos and self.bos_id is not None and (
            not ids or ids[0] != self.bos_id
        ):
            ids = [self.bos_id] + ids
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        return self.tok.decode(list(ids), skip_special_tokens=True)

    def apply_chat_template(self, messages: Sequence[dict]) -> str:
        if getattr(self.tok, "chat_template", None):
            return self.tok.apply_chat_template(
                list(messages), tokenize=False, add_generation_prompt=True
            )
        return _generic_chat_template(messages)


def _generic_chat_template(messages: Sequence[dict]) -> str:
    """Minimal role-tagged template for tokenizers without one."""
    parts = []
    for m in messages:
        parts.append(f"<|{m.get('role', 'user')}|>\n{m.get('content', '')}\n")
    parts.append("<|assistant|>\n")
    return "".join(parts)


def load_tokenizer(spec: Optional[str]):
    """None or "byte" -> ByteTokenizer; anything else -> local HF directory."""
    if spec is None or spec == "byte":
        return ByteTokenizer()
    return HFTokenizer(spec)
