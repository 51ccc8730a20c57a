from flexq_tpu.quant.quantizer import (
    CLIPMIN,
    CLIPMAX,
    QuantSpec,
    compute_scale_zp,
    dequantize,
    fake_quant,
    fake_quant_ste,
    quantize,
)
