from flexq_tpu.packing.pack4 import (
    BIAS4,
    pack4,
    pack4_np,
    packed4_nbytes,
    unpack4,
    unpack4_np,
)
from flexq_tpu.packing.pack6 import (
    PACK_KT,
    pack6,
    pack6_np,
    packed_nbytes,
    unpack6,
    unpack6_np,
)
