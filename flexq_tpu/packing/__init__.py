from flexq_tpu.packing.pack6 import (
    PACK_KT,
    pack6,
    pack6_np,
    packed_nbytes,
    unpack6,
    unpack6_np,
)
