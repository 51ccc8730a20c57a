from flexq_tpu.parallel.pp import (
    decode_step_pp,
    forward_serve_pp,
    make_pipe_mesh,
    shard_cache_pp,
    shard_params_pp,
)
from flexq_tpu.parallel.tp import (
    forward_serve_tp,
    make_mesh,
    param_specs,
    shard_params,
)
from flexq_tpu.parallel.cp import forward_sp, make_sp_mesh, ring_attention
from flexq_tpu.parallel.sp_serve import (
    generate_sp,
    sp_decode_step,
    sp_prefill,
)
