"""Multi-framework bindings (reference e2e th_op / triton_backend surface).

The reference exposes its C++ engine to PyTorch through TorchScript custom
classes (e2e/src/fastertransformer/th_op/llama/LlamaOp.cc) and to Triton
through a backend shim (triton_backend/llama/LlamaTritonModel.cc). The
TPU-native equivalents are:

  * HTTP: serve/http.py (/generate + OpenAI /v1/*) — the Triton analogue.
  * PyTorch: bindings/torch_adapter.py — torch-tensor-in/torch-tensor-out
    wrapper over the same Engine/forward_serve code path.
"""

from flexq_tpu.bindings.torch_adapter import FlexQCausalLM, to_jax, to_torch

__all__ = ["FlexQCausalLM", "to_jax", "to_torch"]
