from flexq_tpu.serve.engine import Engine
from flexq_tpu.serve.sampling import SamplingParams, process_logits, sample
