from flexq_tpu.export.exporter import (
    export_checkpoint,
    load_packed,
    load_packed_sharded,
)
from flexq_tpu.export.native import group_quant_np, quant_pack6
