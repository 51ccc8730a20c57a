from flexq_tpu.models import llama
from flexq_tpu.models.hf_loader import (
    config_from_hf,
    from_hf_llama,
    from_hf_opt,
    load_checkpoint,
)
