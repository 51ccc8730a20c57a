from flexq_tpu.serve.engine import Engine
from flexq_tpu.serve.sampling import SamplingParams, process_logits, sample
from flexq_tpu.serve.beam import BeamParams, beam_search
from flexq_tpu.serve.paged import PagePool, PageTable
from flexq_tpu.serve.scheduler import BatchScheduler
from flexq_tpu.serve.speculative import SpecStats, generate_speculative, ngram_draft
