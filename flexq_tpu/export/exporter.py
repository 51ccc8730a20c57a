"""Offline weight exporter: HF checkpoint → packed W6 shards.

Fills the reference's missing-component gap (SURVEY.md §2.6: no in-repo tool
produces the packed weight binaries LlamaDecoderLayerWeight::loadModel
consumes). Output is a directory of safetensors files + meta.json that
`load_packed` turns straight into Engine-ready params.

CLI:
    python -m flexq_tpu.export.exporter --model-dir <hf_dir> --out <dir> \
        [--policy llama_flex|uniform|fp16] [--wbits 6] [--abits 6] [--dtype bf16]

Layout:
    out/meta.json                 model config + policy + format version
    out/embed.safetensors         embed, final_norm, lm_head (bf16, or
                                  packed lm_head.hi/.lo/.scale with --head-bits)
    out/layer_{i}.safetensors     per linear: {name}.hi/.lo/.scale (+ .b),
                                  norms bf16
With --tp N (the reference's pre-split per-rank layout,
LlamaDecoderLayerWeight.cc:381-406): layer_{i}.rank{r}.safetensors and
head.rank{r}.safetensors hold rank r's column/row shards, bit-identical to
the slices parallel/tp.py shard_params places on rank r; load with
``load_packed(dir, rank=r)`` so each host reads only its own slice.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Any, Dict

import numpy as np

from flexq_tpu.config import ModelConfig, QuantPolicy
from flexq_tpu.export.native import group_quant_np, quant_pack4, quant_pack6
from flexq_tpu.models.hf_loader import config_from_hf

FORMAT_VERSION = 2  # biased nibble+crumb planes (packing/pack6.py)


def _np_bf16(x: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    return np.asarray(jnp.asarray(x).astype(jnp.bfloat16))


def _pad_cols(a: np.ndarray, n_to: int) -> np.ndarray:
    if a.shape[1] == n_to:
        return a
    return np.pad(a, ((0, 0), (0, n_to - a.shape[1])))


# Tensor-parallel split rules, matching parallel/tp.py param_specs: column
# linears (and the vocab-parallel head) split the output dim, row linears
# split the contraction dim, row biases stay replicated (added post-psum).
# Slicing PACKED planes is exact because the pack6/pack4 layouts are
# K-tile-local (kt=128): any 128-row K range maps to a contiguous plane-row
# range, and N is untouched by packing.
_COL_SPLIT = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "fc1", "lm_head")
_ROW_SPLIT = ("o_proj", "down_proj", "fc2")


def _rank_slice(key: str, a: np.ndarray, tp: int, r: int) -> np.ndarray:
    """Slice one exported tensor (dotted key) to TP rank ``r``."""
    if "." not in key:
        return a  # norms: replicated
    name, part = key.split(".", 1)
    if name in _COL_SPLIT:
        ax = 0 if part == "b" else 1
    elif name in _ROW_SPLIT:
        if part == "b":
            return a
        ax = 0
    else:
        return a
    assert a.shape[ax] % tp == 0, (key, a.shape, tp)
    c = a.shape[ax] // tp
    sl = [slice(None)] * a.ndim
    sl[ax] = slice(r * c, (r + 1) * c)
    return a[tuple(sl)]


def _rank_concat(key: str, shards) -> np.ndarray:
    """Inverse of :func:`_rank_slice` (reassemble a full tensor)."""
    if "." not in key:
        return shards[0]
    name, part = key.split(".", 1)
    if name in _COL_SPLIT:
        ax = 0 if part == "b" else 1
    elif name in _ROW_SPLIT and part != "b":
        ax = 0
    else:
        return shards[0]
    return np.concatenate(shards, axis=ax)


def _emit_packed(out: Dict[str, np.ndarray], name: str, w: np.ndarray, bits: int):
    """Quantize+pack one [K, N] matrix into `out` under dotted keys."""
    if bits == 6:
        hi, lo, scale = quant_pack6(w)
        out[f"{name}.hi"] = hi
        out[f"{name}.lo"] = lo
        out[f"{name}.scale"] = scale
    elif bits == 8:
        # W8A8 baseline checkpoint (reference int8_mode=2 parity)
        q, scale = group_quant_np(w, 8)
        out[f"{name}.q8"] = q
        out[f"{name}.scale"] = scale
    elif bits == 4:
        # W4 weight-only checkpoint (reference int8_mode=4 parity)
        plane, scale = quant_pack4(w)
        out[f"{name}.q4"] = plane
        out[f"{name}.scale"] = scale
    else:
        out[f"{name}.w"] = _np_bf16(w)


def export_checkpoint(
    model_dir: str,
    out_dir: str,
    policy_name: str = "llama_flex",
    wbits: int = 6,
    abits: int = 6,
    head_bits: int = 0,
    tp: int = 1,
) -> None:
    from safetensors import safe_open
    from safetensors.numpy import save_file

    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg)
    if policy_name == "llama_flex":
        policy = QuantPolicy.llama_flex(wbits=wbits, abits=abits)
    elif policy_name == "opt_flex":
        policy = QuantPolicy.opt_flex(wbits=wbits, abits=abits)
    elif policy_name == "uniform":
        policy = QuantPolicy.uniform(cfg.arch, wbits=wbits, abits=abits)
    elif policy_name == "weight_only":
        policy = QuantPolicy.weight_only(cfg.arch, wbits=wbits)
    else:
        raise ValueError(policy_name)
    if head_bits:
        if cfg.tie_word_embeddings:
            # no lm_head tensor exists to export (serving falls back to
            # embed.T); recording head bits in meta.json would claim a
            # quantized head that was never written
            import warnings

            warnings.warn(
                "--head-bits ignored: model ties word embeddings, so there "
                "is no separate lm_head tensor to quantize/export"
            )
        else:
            # quantized lm_head (exceeds parity — the reference's stays
            # fp16); weight-only policies keep the head input at 16-bit too
            policy = policy.with_head(
                head_bits, abits=16 if policy.no_act_quant else 8
            )

    os.makedirs(out_dir, exist_ok=True)

    tensors: Dict[str, np.ndarray] = {}
    for shard in sorted(f for f in os.listdir(model_dir) if f.endswith(".safetensors")):
        with safe_open(os.path.join(model_dir, shard), framework="np") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)

    def t(key: str, transpose=False) -> np.ndarray:
        arr = tensors[key]
        if arr.dtype == np.uint16:  # raw bf16
            import jax.numpy as jnp

            arr = np.asarray(jnp.asarray(arr).view(jnp.bfloat16).astype(jnp.float32))
        arr = arr.astype(np.float32)
        return arr.T if transpose else arr

    ffn = cfg.intermediate_size
    ffn_pad = ffn + ((-ffn) % (1024 if ffn >= 2048 else 128))

    hf_names = {
        "q_proj": "self_attn.q_proj",
        "k_proj": "self_attn.k_proj",
        "v_proj": "self_attn.v_proj",
        "o_proj": "self_attn.o_proj",
        "gate_proj": "mlp.gate_proj",
        "up_proj": "mlp.up_proj",
        "down_proj": "mlp.down_proj",
    }

    for i in range(cfg.num_layers):
        prefix = f"model.layers.{i}."
        out: Dict[str, np.ndarray] = {
            # cfg.norm_offset folds Gemma's (1+w) rmsnorm into the stored
            # gamma (same convention as hf_loader.load_checkpoint). bf16
            # storage rounds (1+w) near 1.0 to ~2^-9 relative — negligible
            # against the W6 weight quantization this checkpoint carries.
            "input_norm": _np_bf16(
                t(prefix + "input_layernorm.weight") + cfg.norm_offset
            ),
            "post_norm": _np_bf16(
                t(prefix + "post_attention_layernorm.weight") + cfg.norm_offset
            ),
        }
        for name, hf in hf_names.items():
            w = t(prefix + hf + ".weight", transpose=True)  # [K, N]
            spec_bits = policy.weight_bits.get(name, 16)
            if spec_bits < 16:
                if name == "down_proj" and w.shape[0] != ffn_pad:
                    w = np.pad(w, ((0, ffn_pad - w.shape[0]), (0, 0)))
                n = w.shape[1]
                n_to = n + ((-n) % (1024 if n >= 2048 else 128))
                w = _pad_cols(w, n_to)
            _emit_packed(out, name, w, spec_bits)
            if prefix + hf + ".bias" in tensors:  # Qwen2 q/k/v biases
                b = t(prefix + hf + ".bias")
                if spec_bits < 16 and b.shape[0] != w.shape[1]:
                    # quantize_params convention: biases ride padded to the
                    # packed plane's N (added pre-slice in _qlinear*)
                    b = np.pad(b, (0, w.shape[1] - b.shape[0]))
                out[f"{name}.b"] = _np_bf16(b)
        # safetensors writes raw buffers stride-blind: force C-contiguous
        if tp == 1:
            out = {k2: np.ascontiguousarray(v2) for k2, v2 in out.items()}
            save_file(out, os.path.join(out_dir, f"layer_{i}.safetensors"))
        else:
            # per-rank shard files (the reference stores weights pre-split
            # per TP rank, LlamaDecoderLayerWeight.cc:381-406 — each host
            # loads only its shard at 70B scale)
            for r in range(tp):
                shard = {
                    k2: np.ascontiguousarray(_rank_slice(k2, v2, tp, r))
                    for k2, v2 in out.items()
                }
                save_file(
                    shard, os.path.join(out_dir, f"layer_{i}.rank{r}.safetensors")
                )
        print(f"layer {i + 1}/{cfg.num_layers} exported", flush=True)

    top: Dict[str, np.ndarray] = {
        "embed": _np_bf16(t("model.embed_tokens.weight")),
        "final_norm": _np_bf16(t("model.norm.weight") + cfg.norm_offset),
    }
    if "lm_head.weight" in tensors and not cfg.tie_word_embeddings:
        hw = t("lm_head.weight", transpose=True)  # [H, V]
        head_wbits = policy.weight_bits.get("lm_head", 16)
        head: Dict[str, np.ndarray] = {}
        if head_wbits < 16:
            v = hw.shape[1]
            hw = _pad_cols(hw, v + ((-v) % (1024 if v >= 2048 else 128)))
            _emit_packed(head, "lm_head", hw, head_wbits)
        else:
            head["lm_head"] = _np_bf16(hw)
        if tp == 1:
            top.update(head)
        else:
            # vocab-parallel head shards (reference Llama.cc:1090-1130)
            for r in range(tp):
                shard = {
                    (k2 if "." in k2 else "lm_head.w"): np.ascontiguousarray(
                        _rank_slice(
                            k2 if "." in k2 else "lm_head.w", v2, tp, r
                        )
                    )
                    for k2, v2 in head.items()
                }
                save_file(
                    shard, os.path.join(out_dir, f"head.rank{r}.safetensors")
                )
    top = {k2: np.ascontiguousarray(v2) for k2, v2 in top.items()}
    save_file(top, os.path.join(out_dir, "embed.safetensors"))

    meta = {
        "format_version": FORMAT_VERSION,
        "tensor_parallel": tp,
        "config": dataclasses.asdict(cfg),
        "policy": {
            "weight_bits": policy.weight_bits,
            "act_bits": policy.act_bits,
            "w_group_size": policy.w_group_size,
            "a_group_size": policy.a_group_size,
            "symmetric": policy.symmetric,
        },
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_packed(out_dir: str, rank: Optional[int] = None):
    """Load an exported directory -> (cfg, policy, serve params pytree).

    For a tensor-parallel export (``--tp N``): ``rank=r`` loads ONLY rank
    r's shard files — the multi-host pattern where each process reads its
    own slice (reference LlamaDecoderLayerWeight::loadModel per-rank bins).
    ``rank=None`` reassembles the full tree by concatenation (single-host
    use, tests).
    """
    import jax.numpy as jnp
    from safetensors import safe_open

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["format_version"] == FORMAT_VERSION, (
        f"packed format v{meta['format_version']} != v{FORMAT_VERSION}"
    )
    tp = meta.get("tensor_parallel", 1)
    if tp == 1:
        assert rank in (None, 0), f"rank={rank} on a tp=1 export"
    cfg = ModelConfig(**meta["config"])
    pol = meta["policy"]
    policy = QuantPolicy(
        weight_bits=pol["weight_bits"],
        act_bits=pol["act_bits"],
        w_group_size=pol["w_group_size"],
        a_group_size=pol["a_group_size"],
        symmetric=pol["symmetric"],
    )

    def load_file(path):
        out = {}
        with safe_open(path, framework="np") as f:
            for key in f.keys():
                out[key] = jnp.asarray(f.get_tensor(key))
        return out

    def load_flat(stem: str) -> Dict[str, Any]:
        """Read one logical file: plain (tp=1), one rank's shard, or the
        rank shards reassembled by concatenation (tp>1, rank=None)."""
        if tp == 1:
            path = os.path.join(out_dir, f"{stem}.safetensors")
            return load_file(path) if os.path.exists(path) else {}
        paths = [
            os.path.join(out_dir, f"{stem}.rank{r}.safetensors")
            for r in range(tp)
        ]
        if not os.path.exists(paths[0]):
            return {}
        if rank is not None:
            return load_file(paths[rank])
        per_rank = [load_file(p) for p in paths]
        return {
            key: jnp.asarray(
                _rank_concat(key, [np.asarray(pr[key]) for pr in per_rank])
            )
            for key in per_rank[0]
        }

    top = load_file(os.path.join(out_dir, "embed.safetensors"))
    top.update(load_flat("head"))
    params: Dict[str, Any] = {
        "embed": top["embed"],
        "final_norm": top["final_norm"],
        "layers": [],
    }
    if "lm_head" in top:
        params["lm_head"] = top["lm_head"]
    else:  # packed quantized head under dotted keys (lm_head.hi/.lo/.scale)
        head = {
            key.split(".", 1)[1]: val
            for key, val in top.items()
            if key.startswith("lm_head.")
        }
        if head:
            # a tp-sharded bf16 head round-trips as {"w": ...}: unwrap it
            params["lm_head"] = head["w"] if set(head) == {"w"} else head
    for i in range(cfg.num_layers):
        flat = load_flat(f"layer_{i}")
        lp: Dict[str, Any] = {}
        for key, val in flat.items():
            if "." in key:
                name, part = key.split(".", 1)
                lp.setdefault(name, {})[part] = val
            else:
                lp[key] = val
        params["layers"].append(lp)
    return cfg, policy, params


def load_packed_sharded(out_dir: str, mesh):
    """Multi-host weight loading: assemble mesh-sharded params from a
    ``--tp N`` export, each process reading ONLY the rank shards its local
    devices own (the reference's per-rank loadModel pattern — at 70B no
    host ever touches the full weight set). Works single-process too.

    The mesh's `model` axis size must equal the export's tp. Returns
    (cfg, policy, params) where every leaf is a global jax.Array sharded
    per parallel/tp.py param_specs (column/row/vocab splits, replicated
    norms) — directly usable by forward_serve_tp / Engine(mesh=...).
    """
    import jax
    from jax.sharding import NamedSharding

    from flexq_tpu.parallel.tp import param_specs

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    tp = meta.get("tensor_parallel", 1)
    assert mesh.shape["model"] == tp, (
        f"mesh model axis {mesh.shape['model']} != export tp {tp}"
    )
    dev = mesh.devices  # (dp, tp) — or (tp,) for a pure-TP mesh
    if dev.ndim == 1:
        dev = dev[None]
    coords = {
        dev[di, ti]: (di, ti)
        for di in range(dev.shape[0])
        for ti in range(dev.shape[1])
    }
    local = [d for d in dev.flatten() if d.process_index == jax.process_index()]
    ranks = sorted({coords[d][1] for d in local})
    trees = {}
    cfg = policy = None
    for r in ranks:
        cfg, policy, trees[r] = load_packed(out_dir, rank=r if tp > 1 else None)

    specs = param_specs(trees[ranks[0]])

    def assemble(spec, *shards):
        # axis carrying "model" in the spec = the split dim; None = replicated
        ax = next((i for i, s in enumerate(spec) if s == "model"), None)
        lshape = shards[0].shape
        gshape = list(lshape)
        if ax is not None:
            gshape[ax] *= tp
        bufs = []
        for d in local:
            _, ti = coords[d]
            piece = shards[ranks.index(ti)] if ax is not None else shards[0]
            bufs.append(jax.device_put(piece, d))
        return jax.make_array_from_single_device_arrays(
            tuple(gshape), NamedSharding(mesh, spec), bufs
        )

    params = jax.tree_util.tree_map(
        assemble, specs, *(trees[r] for r in ranks),
        is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
    )
    return cfg, policy, params


def main():
    # The exporter is pure host work; never claim (or wait on) a TPU.
    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--policy", default="llama_flex")
    ap.add_argument("--wbits", type=int, default=6)
    ap.add_argument("--abits", type=int, default=6)
    ap.add_argument(
        "--head-bits", type=int, default=0,
        help="quantize the lm_head at this width (0 = keep bf16; exceeds "
        "reference parity — its vocab GEMM stays fp16 in every int8_mode)",
    )
    ap.add_argument(
        "--tp", type=int, default=1,
        help="write per-rank tensor-parallel shard files (the reference's "
        "pre-split per-rank weight layout; load with load_packed(rank=r))",
    )
    args = ap.parse_args()
    export_checkpoint(
        args.model_dir, args.out, args.policy, args.wbits, args.abits,
        head_bits=args.head_bits, tp=args.tp,
    )


if __name__ == "__main__":
    main()
