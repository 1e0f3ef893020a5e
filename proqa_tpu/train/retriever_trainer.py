"""Retriever contrastive pretraining: pjit-compiled train/eval steps and the
outer loop (eval period, early stopping, checkpointing).

Equivalent of /root/reference/retrieval/train_retriever.py:173-333, redesigned
for TPU:
* one jitted train step: two-tower forward, in-batch-negative CE
  (q @ c^T vs target=arange — reference :203-205), grad, AdamW update;
* gradient accumulation as a lax.scan over microbatches inside the step
  (reference --accumulate_gradients semantics: negatives stay within the
  microbatch);
* batch dim sharded over the `data` mesh axis; XLA inserts the gradient
  all-reduce over ICI (the NCCL-DDP equivalent);
* bf16 activations, fp32 params/optimizer, donated state buffers.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from proqa_tpu.models.bert import BertConfig
from proqa_tpu.models.retriever import init_retriever_params, retriever_forward
from proqa_tpu.parallel.mesh import DATA_AXIS, make_mesh
from proqa_tpu.train import checkpoint as ckpt
from proqa_tpu.train.meta import read_trainer_meta, write_trainer_meta
from proqa_tpu.train.optim import TrainState, apply_gradients, init_train_state, make_optimizer
from proqa_tpu.utils.logging import AverageMeter, MetricLogger, setup_logger
from proqa_tpu.utils.profiling import StepTimer, TraceWindow


def in_batch_loss(out: dict) -> tuple[jax.Array, jax.Array]:
    """Contrastive CE over in-batch negatives; returns (loss, accuracy)."""
    product = jnp.einsum(
        "qd,cd->qc", out["q"], out["c"], preferred_element_type=jnp.float32
    )
    b = product.shape[0]
    logprobs = jax.nn.log_softmax(product, axis=-1)
    loss = -jnp.mean(jnp.diagonal(logprobs))
    acc = jnp.mean(jnp.argmax(product, axis=-1) == jnp.arange(b))
    return loss, acc


def make_train_step(cfg: BertConfig, tx, accum_steps: int = 1):
    """Returns step(state, batch, rng) -> (state, metrics). `batch` leaves are
    [accum_steps * micro, ...]; negatives live within each microbatch."""

    def microbatch_grads(params, mb, rng):
        def loss_fn(p):
            out = retriever_forward(p, cfg, mb, deterministic=False, dropout_rng=rng)
            loss, acc = in_batch_loss(out)
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return grads, loss, acc

    def step(state: TrainState, batch: dict, rng: jax.Array):
        if accum_steps == 1:
            grads, loss, acc = microbatch_grads(state.params, batch, rng)
        else:
            split = {
                k: v.reshape(accum_steps, v.shape[0] // accum_steps, *v.shape[1:])
                for k, v in batch.items()
            }
            rngs = jax.random.split(rng, accum_steps)

            def body(carry, inp):
                gsum, lsum, asum = carry
                mb, r = inp
                g, l, a = microbatch_grads(state.params, mb, r)
                return (jax.tree.map(jnp.add, gsum, g), lsum + l, asum + a), None

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (gsum, lsum, asum), _ = jax.lax.scan(
                body, (zero, jnp.zeros(()), jnp.zeros(())), (split, rngs)
            )
            grads = jax.tree.map(lambda g: g / accum_steps, gsum)
            loss, acc = lsum / accum_steps, asum / accum_steps

        new_state = apply_gradients(state, grads, tx)
        return new_state, {"loss": loss, "acc": acc}

    return step


def make_eval_step(cfg: BertConfig):
    def eval_step(params, batch):
        out = retriever_forward(params, cfg, batch, deterministic=True)
        product = jnp.einsum("qd,cd->qc", out["q"], out["c"], preferred_element_type=jnp.float32)
        pred = jnp.argmax(product, axis=-1)
        return pred == jnp.arange(product.shape[0])

    return eval_step


@dataclass
class RetrieverTrainerConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 0.0
    max_grad_norm: float = 5.0
    adam_eps: float = 1e-8
    accumulate_gradients: int = 1
    num_train_epochs: int = 100
    eval_period: int = 2500        # <= 0: eval at epoch end only (the QA
                                   # trainer's -1 convention)
    save_checkpoints_steps: int = 20000  # <= 0: no periodic step checkpoints
    wait_step: int = 100
    warmup_steps: int = 0
    total_steps: int | None = None
    seed: int = 3
    output_dir: str = "logs/retriever"
    fast_prng: bool = True  # TPU hardware RNG for dropout masks (threefry
                            # mask generation costs ~40% of a BERT-base step
                            # with remat; rbg reclaims ~half of that)
    profile_dir: str = ""   # capture a jax.profiler device trace of a few
                            # warm steps here (view with xprof/tensorboard)
    profile_steps: int = 3  # traced steps (the compile step is skipped)


class RetrieverTrainer:
    """Outer training loop with eval-driven early stopping and checkpoints
    (best / last / periodic, full-state resume)."""

    def __init__(
        self,
        bert_cfg: BertConfig,
        tcfg: RetrieverTrainerConfig,
        *,
        mesh=None,
        params=None,
    ):
        self.cfg = bert_cfg
        self.tcfg = tcfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.logger = setup_logger("proqa.retriever", f"{tcfg.output_dir}/log.txt")
        self.metrics = MetricLogger(f"{tcfg.output_dir}/metrics.jsonl")
        if tcfg.fast_prng:
            jax.config.update("jax_default_prng_impl", "rbg")
        self.rng = jax.random.PRNGKey(tcfg.seed)

        if params is None:
            self.rng, init_rng = jax.random.split(self.rng)
            params = init_retriever_params(init_rng, bert_cfg)
        else:
            # the train step donates state buffers; never destroy caller arrays
            params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        self.tx = make_optimizer(
            tcfg.learning_rate,
            weight_decay=tcfg.weight_decay,
            max_grad_norm=tcfg.max_grad_norm,
            adam_eps=tcfg.adam_eps,
            warmup_steps=tcfg.warmup_steps,
            total_steps=tcfg.total_steps,
        )
        self.state = init_train_state(params, self.tx)

        replicated = NamedSharding(self.mesh, P())
        batch_sharded = NamedSharding(self.mesh, P(DATA_AXIS))
        self._train_step = jax.jit(
            make_train_step(bert_cfg, self.tx, tcfg.accumulate_gradients),
            in_shardings=(replicated, batch_sharded, replicated),
            out_shardings=(replicated, replicated),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            make_eval_step(bert_cfg),
            in_shardings=(replicated, batch_sharded),
            out_shardings=batch_sharded,
        )

    # ------------- checkpoint plumbing -------------

    def save(self, name: str):
        ckpt.save_checkpoint(f"{self.tcfg.output_dir}/{name}.msgpack", self.state)

    def _write_meta(self, best_acc: float, wait: int, epoch: int) -> None:
        """Loop-progress sidecar so resume() continues the best-checkpoint
        race, early stopping, and epoch position (semantics: train/meta.py)."""
        write_trainer_meta(self.tcfg.output_dir, "best_acc", best_acc, wait, epoch)

    def resume(self, path: str):
        self.state = ckpt.load_checkpoint(path, self.state)
        self._resume_meta = read_trainer_meta(path)
        self.logger.info(
            f"resumed from {path} at step {int(self.state.step)}"
            + (f" with loop progress {self._resume_meta}" if self._resume_meta else "")
        )

    # ------------- loops -------------

    def evaluate(self, eval_batches) -> float:
        correct = total = 0
        for batch in eval_batches:
            rows = batch.pop("__rows__", None)
            res = np.asarray(self._eval_step(self.state.params, self._device_batch(batch)))
            if rows is not None:
                res = res[:rows]
            correct += int(res.sum())
            total += len(res)
        return correct / max(total, 1)

    def _device_batch(self, batch: dict):
        return {k: jnp.asarray(v) for k, v in batch.items() if not k.startswith("__")}

    def train(self, train_batches_fn, eval_batches_fn) -> float:
        """train_batches_fn(epoch) -> iterator of collated batches;
        eval_batches_fn() -> iterator. Returns best eval accuracy."""
        t = self.tcfg
        meta = getattr(self, "_resume_meta", {})
        best_acc = float(meta.get("best_acc", 0.0))
        wait = int(meta.get("wait", 0))
        start_epoch = int(meta.get("epoch", 0))
        stop = False
        meter = AverageMeter()
        timer = StepTimer()
        tracer = TraceWindow(t.profile_dir, steps=t.profile_steps, logger=self.logger)

        last_saved_step = -1  # state.step at the latest checkpoint_last write

        def run_eval(epoch: int) -> None:
            """One dev evaluation + best/early-stop bookkeeping; shared by
            the mid-epoch (eval_period > 0) and epoch-end (<= 0) paths."""
            nonlocal best_acc, wait, stop, last_saved_step
            step = int(self.state.step)
            acc = self.evaluate(eval_batches_fn())
            ts = timer.summary()
            self.logger.info(
                f"Step {step} Train loss {meter.avg:.2f} Acc {acc*100:.2f} "
                f"epoch={epoch} {ts.get('steps_per_s', 0):.2f} steps/s"
            )
            self.metrics.scalar("dev_acc", acc * 100, step)
            if ts:
                self.metrics.scalar("step_p50_ms", ts["p50_s"] * 1e3, step)
                self.metrics.scalar("steps_per_s", ts["steps_per_s"], step)
            self.save("checkpoint_last")
            last_saved_step = step
            if acc > best_acc:
                self.save("checkpoint_best")
                best_acc, wait = acc, 0
            else:
                wait += 1
                # >= not ==: a resume can restore wait already at
                # wait_step (countdown fired before the save); an
                # equality check would then never trigger again
                if wait >= t.wait_step:
                    stop = True

        for epoch in range(start_epoch, t.num_train_epochs):
            for batch in train_batches_fn(epoch):
                tracer.tick()
                rows = batch.pop("__rows__", None)
                # a padded trailing train batch duplicates rows, corrupting
                # in-batch negatives (dup gold columns) — callers must pass
                # drop_last=True; evaluate() is where ragged tails belong
                assert rows is None or rows == len(batch["input_ids_q"]), (
                    f"padded train batch ({rows} real rows): build train "
                    "batches with drop_last=True"
                )
                self.rng, step_rng = jax.random.split(self.rng)
                with timer:
                    self.state, m = self._train_step(
                        self.state, self._device_batch(batch), step_rng
                    )
                    loss = float(m["loss"])  # forces the step inside the timer
                step = int(self.state.step)
                meter.update(loss)
                self.metrics.scalar("train_loss", loss, step)
                self.metrics.scalar("smoothed_train_loss", meter.avg, step)

                if t.save_checkpoints_steps > 0 and step % t.save_checkpoints_steps == 0:
                    self.save(f"checkpoint_{step}")
                # eval_period <= 0 means epoch-end-only eval (the QA
                # trainer's -1 convention) — a raw `step % -1 == 0` is true
                # EVERY step and 0 divides by zero
                if t.eval_period > 0 and step % t.eval_period == 0:
                    run_eval(epoch)
                    # write meta BEFORE any early-stop break: recording
                    # wait = wait_step - 1 would make a resume() restart a
                    # countdown that had already fired
                    self._write_meta(best_acc, wait, epoch)
                    if stop:
                        break
            if not stop and t.eval_period <= 0:
                run_eval(epoch)
            # end-of-epoch: pair a fresh checkpoint_last with an ADVANCED
            # epoch pointer so a resumed run never re-trains a completed
            # epoch (and resuming a finished run is a no-op). Mid-epoch eval
            # writes above keep epoch = E on purpose — see train/meta.py.
            # Skip the write when run_eval just saved this exact step (the
            # eval_period<=0 path otherwise writes the full checkpoint twice
            # back-to-back every epoch).
            if int(self.state.step) != last_saved_step:
                self.save("checkpoint_last")
            self._write_meta(best_acc, wait, epoch + 1)
            if stop:
                break
        tracer.close()
        ts = timer.summary()
        if ts:
            self.metrics.scalar("step_p50_ms", ts["p50_s"] * 1e3, int(self.state.step))
            self.metrics.scalar("steps_per_s", ts["steps_per_s"], int(self.state.step))
        self.logger.info("Training finished!")
        return best_acc
