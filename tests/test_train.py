"""Training stack: optimizer decay masks, full-state checkpoint resume, and a
tiny end-to-end contrastive training run on the 8-device mesh that must
actually learn."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from proqa_tpu.models.bert import BertConfig
from proqa_tpu.models.retriever import init_retriever_params
from proqa_tpu.parallel import make_mesh
from proqa_tpu.train.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from proqa_tpu.train.optim import (
    TrainState,
    apply_gradients,
    init_train_state,
    make_optimizer,
    _no_decay_mask,
)
from proqa_tpu.train.retriever_trainer import (
    RetrieverTrainer,
    RetrieverTrainerConfig,
    in_batch_loss,
    make_train_step,
)


@pytest.fixture(scope="module")
def cfg():
    return BertConfig.tiny(dtype=jnp.float32)


def test_no_decay_mask(cfg):
    params = init_retriever_params(jax.random.PRNGKey(0), cfg, embed_dim=8)
    mask = _no_decay_mask(params)
    assert mask["proj_q"]["kernel"] is True
    assert mask["proj_q"]["bias"] is False
    assert mask["bert_q"]["layers"]["attn_ln"]["scale"] is False
    assert mask["bert_q"]["layers"]["q"]["kernel"] is True
    assert mask["bert_q"]["embeddings"]["ln"]["bias"] is False


def test_frozen_mask_zeroes_updates(cfg):
    params = {"a": jnp.ones((4,)), "b": jnp.ones((4,))}
    frozen = {"a": False, "b": True}
    tx = make_optimizer(0.1, frozen_mask=frozen)
    state = init_train_state(params, tx)
    grads = {"a": jnp.ones((4,)), "b": jnp.ones((4,))}
    new = apply_gradients(state, grads, tx)
    assert not np.allclose(np.asarray(new.params["a"]), 1.0)
    np.testing.assert_array_equal(np.asarray(new.params["b"]), 1.0)


def test_checkpoint_roundtrip(tmp_path, cfg):
    params = init_retriever_params(jax.random.PRNGKey(1), cfg, embed_dim=8)
    tx = make_optimizer(1e-3)
    state = init_train_state(params, tx)
    grads = jax.tree.map(jnp.ones_like, params)
    state = apply_gradients(state, grads, tx)

    path = str(tmp_path / "checkpoint_1.msgpack")
    save_checkpoint(path, state)
    fresh = init_train_state(init_retriever_params(jax.random.PRNGKey(2), cfg, embed_dim=8), tx)
    restored = load_checkpoint(path, fresh)
    assert int(restored.step) == 1
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params, state.params,
    )
    # optimizer moments restored too (true resume, unlike the reference)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.opt_state, state.opt_state,
    )
    assert latest_checkpoint(str(tmp_path)) == path


def test_in_batch_loss_perfect_alignment():
    d = jnp.eye(4, 8)
    loss, acc = in_batch_loss({"q": d * 10, "c": d * 10})
    assert float(acc) == 1.0
    assert float(loss) < 0.01


def _toy_batches(cfg, n_batches, bsz, seed=0):
    """Paired (q, c) token sequences where matching pairs share a token."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_batches):
        pair_tok = rng.integers(5, cfg.vocab_size, size=bsz)
        q = np.stack([[2, t, 3, 0] for t in pair_tok]).astype(np.int32)
        c = np.stack([[2, t, rng.integers(5, cfg.vocab_size), 3] for t in pair_tok]).astype(np.int32)
        batches.append({
            "input_ids_q": q, "input_mask_q": (q != 0).astype(np.int32),
            "input_ids_c": c, "input_mask_c": (c != 0).astype(np.int32),
        })
    return batches


def test_training_learns_and_shards(tmp_path, eight_devices):
    # a tiny random-init BERT needs a larger init scale to have any
    # input-dependence to bootstrap from (production starts from pretrained
    # weights); dropout off for fast overfitting
    lcfg = BertConfig.tiny(dtype=jnp.float32, initializer_range=0.1,
                           hidden_dropout=0.0, attention_dropout=0.0)
    mesh = make_mesh(8)
    tcfg = RetrieverTrainerConfig(
        learning_rate=1e-2, eval_period=10_000, save_checkpoints_steps=10_000,
        output_dir=str(tmp_path), seed=0,
    )
    trainer = RetrieverTrainer(lcfg, tcfg, mesh=mesh)
    batch = _toy_batches(lcfg, 1, 16)[0]

    losses = []
    for _ in range(200):
        trainer.rng, r = jax.random.split(trainer.rng)
        trainer.state, m = trainer._train_step(trainer.state, trainer._device_batch(batch), r)
        losses.append(float(m["loss"]))
    assert losses[-1] < 1.0, (losses[0], losses[-1])
    assert int(trainer.state.step) == 200

    b = dict(batch)
    b["__rows__"] = 16
    acc = trainer.evaluate(iter([b]))
    assert acc > 0.8


def test_grad_accumulation_equivalence(cfg):
    """accum_steps=2 over a split batch == mean of two separate microbatch
    grads applied once."""
    params = init_retriever_params(jax.random.PRNGKey(3), cfg, embed_dim=8)
    tx = make_optimizer(1e-2)
    state = init_train_state(params, tx)
    batch = _toy_batches(cfg, 1, 8)[0]
    rng = jax.random.PRNGKey(42)

    step1 = make_train_step(cfg, tx, accum_steps=1)
    step2 = make_train_step(cfg, tx, accum_steps=2)
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    s1, m1 = jax.jit(step1)(state, dev, rng)
    s2, m2 = jax.jit(step2)(state, dev, rng)
    # losses agree in expectation scale (not exactly: different negatives and
    # dropout rngs per microbatch) — but both must be finite and states move
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    moved = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)), s2.params, state.params
    )
    assert any(jax.tree.leaves(moved))


def test_trainer_full_loop_with_early_stop(tmp_path, cfg):
    mesh = make_mesh(8)
    tcfg = RetrieverTrainerConfig(
        learning_rate=1e-3, eval_period=2, save_checkpoints_steps=4,
        num_train_epochs=2, wait_step=100, output_dir=str(tmp_path / "run"), seed=1,
        profile_dir=str(tmp_path / "trace"), profile_steps=2,
    )
    trainer = RetrieverTrainer(cfg, tcfg, mesh=mesh)
    train_b = _toy_batches(cfg, 6, 16)
    eval_b = _toy_batches(cfg, 2, 16, seed=7)
    best = trainer.train(lambda epoch: iter(train_b), lambda: iter(eval_b))
    assert 0.0 <= best <= 1.0
    assert os.path.exists(tmp_path / "run" / "checkpoint_last.msgpack")
    assert os.path.exists(tmp_path / "run" / "checkpoint_best.msgpack")
    assert os.path.exists(tmp_path / "run" / "checkpoint_4.msgpack")
    # metrics stream written, incl. the StepTimer summary scalars
    lines = open(tmp_path / "run" / "metrics.jsonl").read().strip().splitlines()
    tags = {json.loads(l)["tag"] for l in lines}
    assert {"train_loss", "dev_acc", "step_p50_ms", "steps_per_s"} <= tags
    # profile_dir captured a device trace of the warm-step window
    trace_files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(tmp_path / "trace") for f in fs
    ]
    assert trace_files, "profile_dir produced no trace artifacts"

    # resume restores step AND loop progress (best_acc/wait/epoch sidecar),
    # so a resumed run can't overwrite checkpoint_best with a worse model
    trainer2 = RetrieverTrainer(cfg, tcfg, mesh=mesh)
    trainer2.resume(str(tmp_path / "run" / "checkpoint_last.msgpack"))
    assert int(trainer2.state.step) == 12
    assert trainer2._resume_meta.get("best_acc") == best
    assert "wait" in trainer2._resume_meta


def test_early_stop_writes_fired_countdown_to_meta(tmp_path, cfg):
    """When wait_step fires, trainer_meta.json must record wait == wait_step
    (not wait_step - 1): a resume() from a stopped run must not silently
    restart an early-stopping countdown that had already fired."""
    mesh = make_mesh(8)
    tcfg = RetrieverTrainerConfig(
        learning_rate=0.0, eval_period=1, save_checkpoints_steps=10_000,
        num_train_epochs=1, wait_step=2, output_dir=str(tmp_path / "run"),
        seed=2,
    )
    trainer = RetrieverTrainer(cfg, tcfg, mesh=mesh)
    # lr=0: params never move, eval accuracy is constant -> after the first
    # eval (improve-or-not), every later eval increments wait until stop
    trainer.train(
        lambda epoch: iter(_toy_batches(cfg, 8, 16)),
        lambda: iter(_toy_batches(cfg, 1, 16, seed=7)),
    )
    meta = json.load(open(tmp_path / "run" / "trainer_meta.json"))
    assert meta["wait"] == 2


def test_resume_continues_training(tmp_path, cfg):
    """Full-state resume: a resumed trainer must continue stepping with the
    restored optimizer state (not restart momentum from zero)."""
    mesh = make_mesh(8)
    tcfg = RetrieverTrainerConfig(
        learning_rate=1e-3, eval_period=10_000, save_checkpoints_steps=10_000,
        output_dir=str(tmp_path / "a"), seed=4,
    )
    t1 = RetrieverTrainer(cfg, tcfg, mesh=mesh)
    batch = _toy_batches(cfg, 1, 16)[0]
    for _ in range(3):
        t1.rng, r = jax.random.split(t1.rng)
        t1.state, _ = t1._train_step(t1.state, t1._device_batch(batch), r)
    t1.save("checkpoint_last")

    t2 = RetrieverTrainer(cfg, tcfg, mesh=mesh)
    t2.resume(str(tmp_path / "a" / "checkpoint_last.msgpack"))
    assert int(t2.state.step) == 3
    # adam moments present and nonzero after restore
    mus = [np.asarray(x) for x in jax.tree.leaves(t2.state.opt_state) if hasattr(x, "shape")]
    assert any(np.abs(m).sum() > 0 for m in mus if m.ndim > 0)
    t2.rng, r = jax.random.split(t2.rng)
    t2.state, m = t2._train_step(t2.state, t2._device_batch(batch), r)
    assert int(t2.state.step) == 4 and np.isfinite(float(m["loss"]))


def test_resume_completed_run_is_noop(tmp_path, cfg):
    """Epoch-end meta writes advance the epoch pointer, so (a) a resumed run
    never re-trains a completed epoch and (b) resuming a finished run with
    the same epoch budget trains zero additional steps."""
    mesh = make_mesh(8)
    tcfg = RetrieverTrainerConfig(
        learning_rate=0.0, eval_period=2, save_checkpoints_steps=10_000,
        num_train_epochs=2, wait_step=100, output_dir=str(tmp_path / "run"),
        seed=3,
    )
    trainer = RetrieverTrainer(cfg, tcfg, mesh=mesh)
    trainer.train(
        lambda epoch: iter(_toy_batches(cfg, 2, 16)),
        lambda: iter(_toy_batches(cfg, 1, 16, seed=7)),
    )
    steps = int(trainer.state.step)
    assert steps == 4  # 2 epochs x 2 batches
    meta = json.load(open(tmp_path / "run" / "trainer_meta.json"))
    assert meta["epoch"] == 2  # pointer advanced past the final epoch

    t2 = RetrieverTrainer(cfg, tcfg, mesh=mesh)
    t2.resume(str(tmp_path / "run" / "checkpoint_last.msgpack"))
    t2.train(
        lambda epoch: iter(_toy_batches(cfg, 2, 16)),
        lambda: iter(_toy_batches(cfg, 1, 16, seed=7)),
    )
    assert int(t2.state.step) == steps  # no epoch re-trained


def test_resume_with_fired_countdown_stops_at_first_eval(tmp_path, cfg):
    """A resume can restore wait already AT wait_step (the countdown fired
    before the stop was saved). The eval check must be >=, not ==: with ==
    the first post-resume non-improving eval pushes wait past wait_step and
    early stopping never triggers again."""
    mesh = make_mesh(8)
    tcfg = RetrieverTrainerConfig(
        learning_rate=0.0, eval_period=1, save_checkpoints_steps=10_000,
        num_train_epochs=1, wait_step=2, output_dir=str(tmp_path / "run"),
        seed=2,
    )
    trainer = RetrieverTrainer(cfg, tcfg, mesh=mesh)
    trainer.train(
        lambda epoch: iter(_toy_batches(cfg, 8, 16)),
        lambda: iter(_toy_batches(cfg, 1, 16, seed=7)),
    )
    steps = int(trainer.state.step)
    meta = json.load(open(tmp_path / "run" / "trainer_meta.json"))
    assert meta["wait"] == 2  # countdown fired

    import dataclasses

    tcfg2 = dataclasses.replace(tcfg, num_train_epochs=3)
    t2 = RetrieverTrainer(cfg, tcfg2, mesh=mesh)
    t2.resume(str(tmp_path / "run" / "checkpoint_last.msgpack"))
    t2.train(
        lambda epoch: iter(_toy_batches(cfg, 8, 16)),
        lambda: iter(_toy_batches(cfg, 1, 16, seed=7)),
    )
    # lr=0: accuracy never improves, so the very first eval (1 step in) must
    # stop the run — not 2 more epochs of non-improving training
    assert int(t2.state.step) == steps + 1


def test_trainer_eval_period_epoch_end_only(tmp_path, cfg):
    """eval_period=-1 (the QA trainer's convention) must mean ONE dev eval
    per epoch at epoch end — not `step % -1 == 0` (true every step) and not
    a ZeroDivisionError at 0."""
    for period in (-1, 0):
        mesh = make_mesh(8)
        tcfg = RetrieverTrainerConfig(
            learning_rate=1e-3, eval_period=period, save_checkpoints_steps=0,
            num_train_epochs=2, wait_step=100,
            output_dir=str(tmp_path / f"run{period}"), seed=1,
        )
        trainer = RetrieverTrainer(cfg, tcfg, mesh=mesh)
        calls = []
        orig = trainer.evaluate
        trainer.evaluate = lambda it: (calls.append(1), orig(it))[1]
        train_b = _toy_batches(cfg, 3, 16)
        eval_b = _toy_batches(cfg, 2, 16, seed=7)
        best = trainer.train(lambda epoch: iter(train_b), lambda: iter(eval_b))
        assert len(calls) == 2, (period, len(calls))  # one per epoch
        assert 0.0 <= best <= 1.0
        # epoch-end eval still tracks best + writes checkpoint_best
        assert os.path.exists(tmp_path / f"run{period}" / "checkpoint_best.msgpack")
        # save_checkpoints_steps=0 must not write per-step checkpoints
        assert not any(
            p.name.startswith("checkpoint_") and p.name[11:-8].isdigit()
            for p in (tmp_path / f"run{period}").iterdir()
        )


def test_trainer_epoch_end_eval_early_stop(tmp_path, cfg):
    """With eval_period<=0, a non-improving run must still early-stop via
    the epoch-end evals (wait increments there)."""
    mesh = make_mesh(8)
    tcfg = RetrieverTrainerConfig(
        learning_rate=0.0, eval_period=-1, save_checkpoints_steps=0,
        num_train_epochs=10, wait_step=2,
        output_dir=str(tmp_path / "run"), seed=1,
    )
    trainer = RetrieverTrainer(cfg, tcfg, mesh=mesh)
    calls = []
    orig = trainer.evaluate
    trainer.evaluate = lambda it: (calls.append(1), orig(it))[1]
    train_b = _toy_batches(cfg, 2, 16)
    eval_b = _toy_batches(cfg, 2, 16, seed=7)
    trainer.train(lambda epoch: iter(train_b), lambda: iter(eval_b))
    # lr=0: acc never improves after the first eval (identical params), so
    # the countdown fires after wait_step=2 further epoch-end evals — far
    # short of the 10 configured epochs (2 if the very first eval reads 0.0)
    assert len(calls) in (2, 3), len(calls)


def test_trainer_meta_atomic_write_and_corrupt_read(tmp_path):
    """write_trainer_meta must leave no partial file visible (temp+rename),
    and read_trainer_meta must treat a truncated/corrupt sidecar as absent
    (default loop state) instead of raising and blocking the resume."""
    from proqa_tpu.train.meta import META_NAME, read_trainer_meta, write_trainer_meta

    write_trainer_meta(str(tmp_path), "best_acc", 0.5, 1, 3)
    assert not os.path.exists(tmp_path / (META_NAME + ".tmp"))
    meta = read_trainer_meta(str(tmp_path / "checkpoint_last.msgpack"))
    assert meta == {"best_acc": 0.5, "wait": 1, "epoch": 3}

    # simulate a crash mid-write from a pre-atomic writer
    (tmp_path / META_NAME).write_text('{"best_acc": 0.5, "wa')
    assert read_trainer_meta(str(tmp_path / "checkpoint_last.msgpack")) == {}


def test_trace_window_boundaries_and_failure_tolerance(monkeypatch):
    """TraceWindow traces exactly `steps` iterations after `skip` warm-up
    ones, closes idempotently, and a failing profiler disables the window
    instead of raising (the axon remote backend may not support tracing)."""
    from proqa_tpu.utils.profiling import TraceWindow

    calls = []
    monkeypatch.setattr(jax.profiler, "start_trace", lambda d: calls.append(("start", d)))
    monkeypatch.setattr(jax.profiler, "stop_trace", lambda: calls.append(("stop",)))

    w = TraceWindow("dir", steps=2, skip=1)
    for _ in range(6):
        w.tick()
    w.close()
    w.close()  # idempotent
    assert calls == [("start", "dir"), ("stop",)]

    # empty dir => fully inert
    calls.clear()
    w = TraceWindow("", steps=2)
    for _ in range(4):
        w.tick()
    w.close()
    assert calls == []

    # loop shorter than the window: close() stops the open trace
    calls.clear()
    w = TraceWindow("dir", steps=10, skip=0)
    w.tick()
    w.close()
    assert calls == [("start", "dir"), ("stop",)]

    # profiler failure: one attempt, then disabled, never raises
    def _boom(d):
        calls.append(("boom", d))
        raise RuntimeError("unsupported")

    calls.clear()
    monkeypatch.setattr(jax.profiler, "start_trace", _boom)
    w = TraceWindow("dir", steps=2, skip=0)
    for _ in range(4):
        w.tick()
    w.close()
    assert calls == [("boom", "dir")]
