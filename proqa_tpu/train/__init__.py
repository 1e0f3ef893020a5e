"""Training stack: optimizer, checkpointing, train/eval loops."""

from proqa_tpu.train.optim import TrainState, make_optimizer
from proqa_tpu.train.checkpoint import load_checkpoint, save_checkpoint

__all__ = ["TrainState", "load_checkpoint", "make_optimizer", "save_checkpoint"]
