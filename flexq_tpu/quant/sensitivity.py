"""Layer-wise activation-sensitivity analysis → per-linear bit policy.

The reference paper describes a sensitivity analysis that decides which
layers keep 8-bit activations, but ships only its *result* as hardcoded
per-architecture policies (SURVEY.md §2.1 note: no analysis code exists in
the repo — down_proj 8-bit for LLaMA, q/k/v 8-bit for OPT). This module
implements the analysis as a first-class tool:

for each linear name, measure the output divergence caused by dropping that
linear's activations from 8-bit to `low_bits` while every other linear stays
at 8-bit, on a set of calibration batches. Linears whose divergence exceeds
`threshold` (relative to the all-low baseline spread) keep 8-bit activations.

Works on any model exposing the dense `forward(params, cfg, ids, policy)`
interface (llama / opt), on CPU or TPU — it is an offline tool.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexq_tpu.config import LLAMA_LINEARS, OPT_LINEARS, ModelConfig, QuantPolicy


def _kl_div(p_logits: jax.Array, q_logits: jax.Array) -> float:
    """Mean KL(p || q) over all positions (f32)."""
    p = jax.nn.log_softmax(p_logits.astype(jnp.float32), axis=-1)
    q = jax.nn.log_softmax(q_logits.astype(jnp.float32), axis=-1)
    return float(jnp.mean(jnp.sum(jnp.exp(p) * (p - q), axis=-1)))


@dataclasses.dataclass
class SensitivityReport:
    per_linear_kl: Dict[str, float]
    baseline_kl: float  # all linears at low_bits
    policy: QuantPolicy

    def summary(self) -> str:
        lines = [f"baseline (all-low) KL: {self.baseline_kl:.5f}"]
        for name, kl in sorted(self.per_linear_kl.items(), key=lambda kv: -kv[1]):
            wb = self.policy.weight_bits.get(name)
            ab = self.policy.act_bits.get(name)
            lines.append(f"  {name:<12} KL {kl:.5f} -> W{wb} A{ab}")
        return "\n".join(lines)


def analyze_act_sensitivity(
    forward_fn: Callable,  # forward(params, cfg, ids, policy=...) -> logits
    params,
    cfg: ModelConfig,
    calib_ids: np.ndarray,  # [n, L] int32 calibration windows
    wbits: int = 6,
    low_bits: int = 6,
    high_bits: int = 8,
    keep_fraction: float = 0.15,
    batch: int = 1,
) -> SensitivityReport:
    """Measure per-linear act-quant sensitivity and derive a policy.

    The derived policy keeps `high_bits` activations for the most sensitive
    ~`keep_fraction` of linear names (at least one), mirroring how the paper
    arrived at down_proj(LLaMA) / qkv(OPT).
    """
    names = LLAMA_LINEARS if cfg.arch == "llama" else OPT_LINEARS
    ref_policy = QuantPolicy(
        weight_bits={n: wbits for n in names},
        act_bits={n: high_bits for n in names},
    )
    windows = [jnp.asarray(calib_ids[i : i + batch]) for i in range(0, len(calib_ids), batch)]

    # policies contain dicts (unhashable) so each gets its own jitted closure
    ref_fwd = jax.jit(lambda ids: forward_fn(params, cfg, ids, policy=ref_policy))
    refs = [ref_fwd(w) for w in windows]

    def mean_kl(policy) -> float:
        fwd = jax.jit(lambda ids: forward_fn(params, cfg, ids, policy=policy))
        tot = 0.0
        for w, ref in zip(windows, refs):
            tot += _kl_div(ref, fwd(w))
        return tot / len(windows)

    per_linear: Dict[str, float] = {}
    for name in names:
        probe = QuantPolicy(
            weight_bits=dict(ref_policy.weight_bits),
            act_bits={**{n: high_bits for n in names}, name: low_bits},
        )
        per_linear[name] = mean_kl(probe)

    all_low = QuantPolicy(
        weight_bits=dict(ref_policy.weight_bits),
        act_bits={n: low_bits for n in names},
    )
    baseline = mean_kl(all_low)

    n_keep = max(1, int(round(keep_fraction * len(names))))
    ranked = sorted(per_linear, key=per_linear.get, reverse=True)
    keep_high = set(ranked[:n_keep])
    policy = QuantPolicy(
        weight_bits={n: wbits for n in names},
        act_bits={n: (high_bits if n in keep_high else low_bits) for n in names},
    )
    report = SensitivityReport(per_linear, baseline, policy)
    return report


def analyze_weight_sensitivity(
    forward_fn: Callable,  # forward(params, cfg, ids, policy=...) -> logits
    params,
    cfg: ModelConfig,
    calib_ids: np.ndarray,  # [n, L] int32 calibration windows
    low_bits: int = 4,
    high_bits: int = 6,
    act_policy: Optional[QuantPolicy] = None,
    kl_budget: Optional[float] = None,
    keep_fraction: float = 0.3,
    batch: int = 1,
) -> SensitivityReport:
    """Per-linear WEIGHT-bit sensitivity → a mixed W4/W6 policy.

    The weight-bit analogue of `analyze_act_sensitivity` (the paper applies
    its sensitivity idea only to activations; applying it to weight bits
    extends it): measure KL against an all-`high_bits` reference when one
    linear's weights drop to `low_bits`, then keep `high_bits` weights for
    either (a) every linear whose solo-drop KL exceeds `kl_budget`, or (b)
    the most sensitive `keep_fraction` of names when no budget is given.
    The resulting policy mixes 4-bit and 6-bit planes per linear — the
    serve path dispatches each linear by its own packed format, so a mixed
    tree runs out of the box. Act bits default to the architecture's flex
    policy so the derived policy is serve-ready.
    """
    names = LLAMA_LINEARS if cfg.arch == "llama" else OPT_LINEARS
    if act_policy is None:
        act_policy = (
            QuantPolicy.llama_flex() if cfg.arch == "llama" else QuantPolicy.opt_flex()
        )
    if cfg.arch == "llama":
        from flexq_tpu.models.llama import fake_quant_weights
    else:
        from flexq_tpu.models.opt import fake_quant_weights

    ref_policy = QuantPolicy(
        weight_bits={n: high_bits for n in names},
        act_bits=dict(act_policy.act_bits),
    )
    windows = [jnp.asarray(calib_ids[i : i + batch]) for i in range(0, len(calib_ids), batch)]

    def mean_kl(policy, refs=None) -> List[jax.Array] | float:
        # weight fake-quant must be BAKED per probe (the dense forward only
        # applies act quant dynamically, like the reference's eval flow)
        qp = fake_quant_weights(params, policy)
        fwd = jax.jit(lambda ids: forward_fn(qp, cfg, ids, policy=policy))
        outs = [fwd(w) for w in windows]
        if refs is None:
            return outs
        return sum(_kl_div(r, o) for r, o in zip(refs, outs)) / len(windows)

    refs = mean_kl(ref_policy)

    per_linear: Dict[str, float] = {}
    for name in names:
        probe = QuantPolicy(
            weight_bits={**{n: high_bits for n in names}, name: low_bits},
            act_bits=dict(ref_policy.act_bits),
        )
        per_linear[name] = mean_kl(probe, refs)

    baseline = mean_kl(
        QuantPolicy(
            weight_bits={n: low_bits for n in names},
            act_bits=dict(ref_policy.act_bits),
        ),
        refs,
    )

    if kl_budget is not None:
        keep_high = {n for n, kl in per_linear.items() if kl > kl_budget}
    else:
        n_keep = max(1, int(round(keep_fraction * len(names))))
        ranked = sorted(per_linear, key=per_linear.get, reverse=True)
        keep_high = set(ranked[:n_keep])
    policy = QuantPolicy(
        weight_bits={
            n: (high_bits if n in keep_high else low_bits) for n in names
        },
        act_bits=dict(ref_policy.act_bits),
    )
    return SensitivityReport(per_linear, baseline, policy)
