"""flexq_tpu — TPU-native INT6 quantized LLM inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of FlexQ
(hoffmann-muki/FlexQ): uniform 6-bit group-quantized weights, 6/8-bit dynamic
per-group activations with a layer-wise sensitivity policy, fused
quantize-pack producer epilogues, Pallas W6Ax matmul kernels on the MXU, and
a mesh-sharded multi-chip serving engine.
"""

__version__ = "0.1.0"
