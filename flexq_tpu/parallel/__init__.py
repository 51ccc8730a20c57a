from flexq_tpu.parallel.tp import (
    forward_serve_tp,
    make_mesh,
    param_specs,
    shard_params,
)
