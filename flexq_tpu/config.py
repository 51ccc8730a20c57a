"""Single config system for models, quantization policy, mesh, and serving.

Replaces the reference's three config mechanisms (argparse in algorithm/,
CMake defines + argv in engine/, INI files in e2e/ — SURVEY.md §5) with one
set of dataclasses.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

from flexq_tpu.quant.quantizer import QuantSpec

GROUP_SIZE = 128


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture description (covers the LLaMA family — LLaMA-1/2/3
    MHA+GQA, Mistral sliding-window, Qwen2 biased-qkv — and OPT)."""

    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    arch: str = "llama"  # "llama" | "opt"
    act: str = "silu"  # llama: silu-glu; opt: relu
    tie_word_embeddings: bool = False
    # OPT specifics
    do_layer_norm_before: bool = True  # OPT-350m quirk is False
    attn_bias: bool = False  # OPT linears carry biases
    ffn_bias: bool = False
    # LLaMA-family variants
    # qkv_bias records that the checkpoint's q/k/v carry biases (Qwen2);
    # INFORMATIONAL — the forward paths dispatch on the presence of "b"
    # keys in the param tree, which is authoritative.
    qkv_bias: bool = False
    sliding_window: Optional[int] = None  # Mistral: local attention window
    # LLaMA-3.1 rope frequency scaling (HF rope_type "llama3"):
    # (factor, low_freq_factor, high_freq_factor, original_max_position_embeddings)
    rope_scaling: Optional[Tuple[float, float, float, int]] = None
    # Gemma variants. norm_offset records that LOADERS store gamma+offset
    # (GemmaRMSNorm computes x*(1+w): folding the +1 at load keeps every
    # rmsnorm/rmsnorm_quant kernel unchanged). embed_scale multiplies the
    # embedding output (Gemma: sqrt(hidden_size)).
    norm_offset: float = 0.0
    embed_scale: Optional[float] = None

    def __post_init__(self):
        # meta.json round-trip: JSON turns the tuple into a list, which is
        # unhashable (ModelConfig rides as a jit static); coerce back.
        if isinstance(self.rope_scaling, list):
            object.__setattr__(self, "rope_scaling", tuple(self.rope_scaling))
        if self.sliding_window is not None and self.sliding_window < 1:
            # window 0 would mask every key (NaN softmax); fail at parse time
            raise ValueError(f"sliding_window must be >= 1, got {self.sliding_window}")

    @property
    def num_kv_groups(self) -> int:
        return self.num_heads // self.num_kv_heads

    @staticmethod
    def llama(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=11008,
        num_layers=32,
        num_heads=32,
        num_kv_heads=None,
        max_seq_len=2048,
        rope_theta=10000.0,
        norm_eps=1e-5,
        head_dim=None,  # Mistral-NeMo / Gemma-style override (else hidden/heads)
        act="silu",  # Gemma: "gelu" (tanh-approx GeGLU)
        **kw,
    ) -> "ModelConfig":
        return ModelConfig(
            vocab_size=vocab_size,
            hidden_size=hidden_size,
            intermediate_size=intermediate_size,
            num_layers=num_layers,
            num_heads=num_heads,
            num_kv_heads=num_kv_heads or num_heads,
            head_dim=head_dim or hidden_size // num_heads,
            max_seq_len=max_seq_len,
            rope_theta=rope_theta,
            norm_eps=norm_eps,
            arch="llama",
            act=act,
            **kw,
        )

    @staticmethod
    def opt(
        vocab_size=50272,
        hidden_size=768,
        intermediate_size=3072,
        num_layers=12,
        num_heads=12,
        max_seq_len=2048,
        norm_eps=1e-5,
        **kw,
    ) -> "ModelConfig":
        return ModelConfig(
            vocab_size=vocab_size,
            hidden_size=hidden_size,
            intermediate_size=intermediate_size,
            num_layers=num_layers,
            num_heads=num_heads,
            num_kv_heads=num_heads,
            head_dim=hidden_size // num_heads,
            max_seq_len=max_seq_len,
            norm_eps=norm_eps,
            arch="opt",
            act="relu",
            attn_bias=True,
            ffn_bias=True,
            **kw,
        )


# Linear-layer names per architecture (used by policies and loaders).
LLAMA_LINEARS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")
OPT_LINEARS = ("q_proj", "k_proj", "v_proj", "o_proj", "fc1", "fc2")


@dataclasses.dataclass(frozen=True)
class QuantPolicy:
    """Per-linear (weight_bits, act_bits) policy + group sizes.

    The reference's layer-wise sensitivity result is baked in as static
    per-architecture policies (SURVEY.md §2.1 note):
      * LLaMA flex policy: all weights 6b; down_proj activation 8b, all other
        activations 6b (algorithm/main.py:202,266-276; int_llama_layer.py:35).
      * OPT flex policy: q/k/v activations 8b, rest 6b
        (algorithm/models/int_opt_layer.py:43-60).
    `sensitivity.py` can derive custom policies by measurement.
    """

    weight_bits: Dict[str, int]
    act_bits: Dict[str, int]
    w_group_size: Optional[int] = GROUP_SIZE
    a_group_size: Optional[int] = GROUP_SIZE
    symmetric: bool = True

    def weight_spec(self, name: str) -> QuantSpec:
        return QuantSpec(
            bits=self.weight_bits.get(name, 16),
            symmetric=self.symmetric,
            group_size=self.w_group_size,
        )

    def act_spec(self, name: str) -> QuantSpec:
        return QuantSpec(
            bits=self.act_bits.get(name, 16),
            symmetric=self.symmetric,
            group_size=self.a_group_size,
        )

    @staticmethod
    def llama_flex(wbits: int = 6, abits: int = 6, down_abits: int = 8) -> "QuantPolicy":
        return QuantPolicy(
            weight_bits={n: wbits for n in LLAMA_LINEARS},
            act_bits={
                **{n: abits for n in LLAMA_LINEARS},
                "down_proj": down_abits,
            },
        )

    @staticmethod
    def opt_flex(wbits: int = 6, abits: int = 6, qkv_abits: int = 8) -> "QuantPolicy":
        return QuantPolicy(
            weight_bits={n: wbits for n in OPT_LINEARS},
            act_bits={
                **{n: abits for n in OPT_LINEARS},
                "q_proj": qkv_abits,
                "k_proj": qkv_abits,
                "v_proj": qkv_abits,
            },
        )

    @staticmethod
    def uniform(arch: str = "llama", wbits: int = 6, abits: int = 6) -> "QuantPolicy":
        names = LLAMA_LINEARS if arch == "llama" else OPT_LINEARS
        return QuantPolicy(
            weight_bits={n: wbits for n in names},
            act_bits={n: abits for n in names},
        )

    def with_head(self, wbits: int = 6, abits: int = 8) -> "QuantPolicy":
        """Extend a policy with a quantized lm_head (vocab GEMM).

        The reference keeps the lm_head fp16 in every int8_mode (e2e
        Llama.cc:1090-1130 runs the vocab-TP gemm out of fp16 weights) — on
        TPU the bf16 head is pure weight streaming (~0.4 ms/step at 13B), so
        quantizing it extends the W6 win past parity. Activations default to
        8-bit (logits are accuracy-critical; the final-norm output gets the
        same treatment as the sensitivity-flagged down_proj input). Opt-in:
        default policies leave the head at 16-bit for reference parity.
        """
        return dataclasses.replace(
            self,
            weight_bits={**self.weight_bits, "lm_head": wbits},
            act_bits={**self.act_bits, "lm_head": abits},
        )

    @property
    def no_act_quant(self) -> bool:
        """True when no linear quantizes its activations (W*A16 or fp16).
        The serve path must then skip the fused act-quant producers and run
        the bf16 layer path (int8 containers cannot hold 16-bit values)."""
        return all(b >= 16 for b in self.act_bits.values())

    @property
    def is_weight_only(self) -> bool:
        """True for W*A16 policies (quantized weights, full-precision
        activations) — the reference's int8_mode=1/4 CUTLASS fpA_intB
        baselines. The serve path then skips activation quantization and
        runs the in-kernel-dequant bf16 GEMMs everywhere."""
        return self.no_act_quant and any(b < 16 for b in self.weight_bits.values())

    @staticmethod
    def weight_only(arch: str = "llama", wbits: int = 4) -> "QuantPolicy":
        """W4A16 (or W6/W8A16) weight-only policy — parity with the
        reference's int8_mode=4 weight-only baseline path."""
        names = LLAMA_LINEARS if arch == "llama" else OPT_LINEARS
        return QuantPolicy(
            weight_bits={n: wbits for n in names},
            act_bits={n: 16 for n in names},
        )

    @staticmethod
    def fp16(arch: str = "llama") -> "QuantPolicy":
        names = LLAMA_LINEARS if arch == "llama" else OPT_LINEARS
        return QuantPolicy(
            weight_bits={n: 16 for n in names}, act_bits={n: 16 for n in names}
        )
