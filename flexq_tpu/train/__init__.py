from flexq_tpu.train.corpus import build_corpus, train_tokenizer
from flexq_tpu.train.trainer import (
    TrainConfig,
    init_params,
    train_step,
    make_lr_schedule,
    save_checkpoint,
    load_checkpoint,
)
