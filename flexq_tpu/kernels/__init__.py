from flexq_tpu.kernels.common import GROUP_SIZE
from flexq_tpu.kernels.fused_quant import (
    glu_quant,
    layernorm_quant,
    quant_act,
    relu_quant,
    rmsnorm_quant,
)
from flexq_tpu.kernels.w4_matmul import w4_matmul, w4_matmul_bf16, w4_matmul_ref
from flexq_tpu.kernels.w6_matmul import w6_matmul, w6_matmul_bf16, w6_matmul_ref
