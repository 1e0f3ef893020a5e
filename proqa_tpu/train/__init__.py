"""Training stack: optimizer, checkpointing, train/eval loops."""

from proqa_tpu.train.optim import (
    TrainState,
    apply_gradients,
    init_train_state,
    make_optimizer,
)
from proqa_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from proqa_tpu.train.retriever_trainer import RetrieverTrainer, RetrieverTrainerConfig
from proqa_tpu.train.qa_trainer import QATrainer, QATrainerConfig

__all__ = [
    "QATrainer",
    "QATrainerConfig",
    "RetrieverTrainer",
    "RetrieverTrainerConfig",
    "TrainState",
    "apply_gradients",
    "init_train_state",
    "latest_checkpoint",
    "load_checkpoint",
    "make_optimizer",
    "save_checkpoint",
]
