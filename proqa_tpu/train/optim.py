"""Optimizer and train state.

AdamW with weight-decay masked off biases/layernorms plus global-norm
gradient clipping — the reference's param-group setup
(/root/reference/retrieval/train_retriever.py:140-148,224-228) expressed as an
optax chain. Frozen-parameter masks (freeze_c_encoder / freeze_retriever,
reference qa/bert_retrieve_qa.py:48-56) are optax.set_to_zero partitions.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def _no_decay_mask(params) -> Any:
    """True where weight decay applies: 2-D+ kernels. Biases and LN
    scale/bias (all 1-D per-layer, so 1-2D stacked) are excluded by path."""

    def mask(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if any(k in ("bias", "scale") for k in keys):
            return False
        if any(k in ("ln", "attn_ln", "mlp_ln") for k in keys):
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask, params)


def make_optimizer(
    learning_rate: float | Callable = 1e-5,
    *,
    weight_decay: float = 0.0,
    max_grad_norm: float = 5.0,
    adam_eps: float = 1e-8,
    b1: float = 0.9,
    b2: float = 0.999,
    frozen_mask: Any = None,
    warmup_steps: int = 0,
    total_steps: int | None = None,
) -> optax.GradientTransformation:
    """frozen_mask: pytree of bools, True = frozen (gradient zeroed).
    warmup/total_steps: optional linear warmup + linear decay schedule."""
    if warmup_steps or total_steps:
        if callable(learning_rate):
            # a schedule can't be the linear ramp's endpoint; composing an
            # arbitrary callable with warmup would need the caller's intent
            raise ValueError(
                "learning_rate must be a float when warmup_steps/total_steps "
                "are set (pass a complete optax schedule and leave them 0)"
            )
        peak = learning_rate
        schedules = []
        boundaries = []
        if warmup_steps:
            schedules.append(optax.linear_schedule(0.0, peak, warmup_steps))
            boundaries.append(warmup_steps)
        if total_steps:
            schedules.append(
                optax.linear_schedule(peak, 0.0, max(total_steps - warmup_steps, 1))
            )
        else:
            schedules.append(optax.constant_schedule(peak))
        learning_rate = (
            optax.join_schedules(schedules, boundaries) if len(schedules) > 1 else schedules[0]
        )

    chain = [
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_adam(b1=b1, b2=b2, eps=adam_eps),
        optax.add_decayed_weights(weight_decay, mask=_no_decay_mask) if weight_decay else None,
        optax.scale_by_learning_rate(learning_rate),
    ]
    tx = optax.chain(*[c for c in chain if c is not None])
    if frozen_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            jax.tree.map(lambda frozen: "frozen" if frozen else "train", frozen_mask),
        )
    return tx


def init_train_state(params, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


def apply_gradients(state: TrainState, grads, tx) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(step=state.step + 1, params=new_params, opt_state=new_opt)


def global_norm(tree) -> jax.Array:
    return optax.global_norm(tree)
