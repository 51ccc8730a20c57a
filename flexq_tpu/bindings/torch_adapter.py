"""PyTorch-facing adapter over the quantized serving stack.

Reference parity: the e2e tree binds its C++ engine into PyTorch via
TorchScript custom classes (th_op/llama/LlamaOp.cc `FTLlama`: weights in,
`forward(input_ids, ...) -> output_ids`). The TPU-native equivalent needs no
C++ glue — tensors cross the torch<->JAX boundary as host numpy buffers
(zero-copy where torch's memory layout allows) and run the exact same
Engine / forward_serve path as the Python API.

Torch is an optional dependency of the package: it is imported lazily inside
the functions so `import flexq_tpu` works without torch installed.

Typical use::

    from transformers import LlamaForCausalLM
    from flexq_tpu.bindings import FlexQCausalLM
    from flexq_tpu.config import QuantPolicy

    hf = LlamaForCausalLM.from_pretrained(...)
    m = FlexQCausalLM.from_hf(hf, QuantPolicy.llama_flex(), max_seq_len=2048)
    out_ids = m.generate(input_ids, max_new_tokens=64)   # torch.LongTensor
    logits = m(input_ids)                                 # torch.FloatTensor
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flexq_tpu.config import ModelConfig, QuantPolicy


def to_jax(t, dtype=None) -> jax.Array:
    """torch.Tensor (any device) -> jax.Array on the default backend."""
    if hasattr(t, "detach"):
        import torch

        t = t.detach().cpu()
        if t.dtype == torch.bfloat16:
            # numpy has no bf16: reinterpret the bits so the jax array is
            # bf16 exactly (no round-trip through f32)
            out = jnp.asarray(t.view(torch.int16).numpy()).view(jnp.bfloat16)
        else:
            out = jnp.asarray(t.numpy())
    else:
        out = jnp.asarray(np.asarray(t))
    return out.astype(dtype) if dtype is not None else out


def to_torch(x: jax.Array):
    """jax.Array -> torch CPU tensor (bf16 upcast to f32 — torch cannot view
    jax bf16 buffers). The host copy is deliberate: torch tensors are
    mutable, so aliasing jax's (immutable, possibly donated) buffer would
    invite silent corruption."""
    import torch

    if x.dtype == jnp.bfloat16:
        x = x.astype(jnp.float32)
    return torch.from_numpy(np.array(x))


class FlexQCausalLM:
    """Quantized causal LM with a torch-tensor API (th_op `FTLlama` parity).

    Construct via ``from_hf`` (an in-memory transformers model),
    ``from_pretrained`` (a HF safetensors directory), or ``from_packed``
    (an exporter-packed directory). ``__call__``/``forward`` returns
    teacher-forced logits; ``generate`` returns generated token ids — both
    ends are torch tensors.
    """

    def __init__(
        self,
        qparams: Dict[str, Any],
        cfg: ModelConfig,
        policy: QuantPolicy,
        max_seq_len: int = 2048,
        kv_dtype=jnp.bfloat16,
    ):
        from flexq_tpu.serve.engine import Engine

        self.cfg = cfg
        self.policy = policy
        self.engine = Engine(
            qparams, cfg, policy, max_seq_len=max_seq_len, kv_dtype=kv_dtype
        )
        self._fwd = jax.jit(self._forward_serve)

    # ---- constructors ------------------------------------------------
    @classmethod
    def from_hf(
        cls,
        model,
        policy: QuantPolicy,
        max_seq_len: int = 2048,
        kv_dtype=jnp.bfloat16,
        dtype=jnp.bfloat16,
        fuse: bool = False,
    ) -> "FlexQCausalLM":
        """Quantize+pack a transformers LlamaForCausalLM / OPTForCausalLM."""
        from flexq_tpu.models.hf_loader import (
            config_from_hf,
            from_hf_llama,
            from_hf_opt,
        )
        from flexq_tpu.models.quantized import quantize_params

        cfg = config_from_hf(model.config)
        loader = from_hf_llama if cfg.arch == "llama" else from_hf_opt
        params = loader(model, dtype=jnp.float32)
        qparams = quantize_params(params, cfg, policy, dtype=dtype, fuse=fuse)
        return cls(qparams, cfg, policy, max_seq_len=max_seq_len, kv_dtype=kv_dtype)

    @classmethod
    def from_pretrained(
        cls,
        model_dir: str,
        policy: QuantPolicy,
        max_seq_len: int = 2048,
        kv_dtype=jnp.bfloat16,
        dtype=jnp.bfloat16,
    ) -> "FlexQCausalLM":
        """Quantize+pack a HF checkpoint directory (safetensors, torch-free)."""
        from flexq_tpu.models.hf_loader import load_checkpoint
        from flexq_tpu.models.quantized import quantize_params

        cfg, params = load_checkpoint(model_dir, dtype=jnp.float32)
        qparams = quantize_params(params, cfg, policy, dtype=dtype)
        return cls(qparams, cfg, policy, max_seq_len=max_seq_len, kv_dtype=kv_dtype)

    @classmethod
    def from_packed(
        cls,
        packed_dir: str,
        max_seq_len: int = 2048,
        kv_dtype=jnp.bfloat16,
    ) -> "FlexQCausalLM":
        """Load an exporter-packed directory (export/exporter.py)."""
        from flexq_tpu.export.exporter import load_packed

        cfg, policy, qparams = load_packed(packed_dir)
        return cls(qparams, cfg, policy, max_seq_len=max_seq_len, kv_dtype=kv_dtype)

    # ---- torch API ---------------------------------------------------
    def _forward_serve(self, params, ids):
        from flexq_tpu.models.quantized import forward_serve

        logits, _ = forward_serve(
            params, self.cfg, self.policy, ids, prefill_bf16=True
        )
        return logits

    def forward(self, input_ids):
        """Teacher-forced logits through the quantized serving path.

        input_ids: torch LongTensor [B, L] -> torch FloatTensor [B, L, V].
        """
        ids = to_jax(input_ids, jnp.int32)
        return to_torch(self._fwd(self.engine.params, ids))

    __call__ = forward

    def generate(
        self,
        input_ids,
        max_new_tokens: int = 32,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        eos_token_id: Optional[int] = 2,
        stop_ids: Sequence[int] = (),
        seed: int = 0,
        mode: str = "fused",
    ):
        """HF-generate-shaped API over Engine.generate.

        input_ids: torch LongTensor [B, L] (equal-length prompts — ragged
        batches go through the continuous-batching scheduler / HTTP API).
        Returns torch LongTensor [B, L + n_generated] (prompt + generation,
        HF convention; Engine itself returns only the generated tokens).
        """
        import torch

        from flexq_tpu.serve.sampling import SamplingParams

        if do_sample:
            sampling = SamplingParams(
                temperature=temperature, top_k=top_k, top_p=top_p, greedy=False
            )
        else:
            sampling = SamplingParams()  # greedy
        prompts = np.asarray(input_ids.detach().cpu().numpy(), np.int32)
        out = self.engine.generate(
            prompts,
            max_new_tokens=max_new_tokens,
            sampling=sampling,
            eos_id=-1 if eos_token_id is None else int(eos_token_id),
            stop_ids=tuple(stop_ids),
            seed=seed,
            mode=mode,
        )
        gen = torch.from_numpy(np.asarray(out).astype(np.int64))
        return torch.cat([input_ids.detach().cpu().long(), gen], dim=1)
