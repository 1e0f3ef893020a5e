"""Checkpointing with true resume.

The reference saves bare model state dicts only (no optimizer/step —
/root/reference/retrieval/train_retriever.py:233-235; SURVEY.md §5.4), so
training cannot actually resume. Here the FULL TrainState (step, params,
optimizer moments) round-trips through a flax-serialization msgpack file,
written atomically, with best/last/periodic naming compatible with the
reference's checkpoint_{step}/checkpoint_best/checkpoint_last scheme.
"""
from __future__ import annotations

import os
import tempfile
from typing import Any

import jax
from flax import serialization


def save_checkpoint(path: str, tree: Any) -> None:
    """Atomic msgpack write of any pytree (TrainState or bare params)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_tree = jax.tree.map(lambda x: jax.device_get(x), tree)
    data = serialization.to_bytes(host_tree)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into a pytree of the same structure (`target` provides shapes
    and dtypes, e.g. a freshly-initialized TrainState)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(target, data)


def latest_checkpoint(ckpt_dir: str, prefix: str = "checkpoint_") -> str | None:
    """Highest-step `<prefix><step>.msgpack` in the directory, if any."""
    if not os.path.isdir(ckpt_dir):
        return None
    best_step, best_path = -1, None
    for fname in os.listdir(ckpt_dir):
        if not fname.startswith(prefix) or not fname.endswith(".msgpack"):
            continue
        stem = fname[len(prefix):-len(".msgpack")]
        if stem.isdigit() and int(stem) > best_step:
            best_step, best_path = int(stem), os.path.join(ckpt_dir, fname)
    return best_path
