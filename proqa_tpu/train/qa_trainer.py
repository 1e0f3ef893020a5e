"""Dense QA finetuning: jitted joint train step, α-sweep EM evaluation, and
the outer loop with online retrieval.

Equivalent of /root/reference/qa/train_retrieve_qa.py:170-401, restructured:
the online sampler feeds static-shape [B, k, L] batches (B questions per step
instead of the reference's 1), the loss zoo runs fused in one jit, span
decoding happens on-device, and only text projection + the rank/span score
sweep (reference :366-394) stay on the host.
"""
from __future__ import annotations

import collections
import dataclasses
import json
import threading
import weakref
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from proqa_tpu.data.collate import batch_pad, pad_bucket
from proqa_tpu.data.loader import BatchLoader
from proqa_tpu.models.bert import BertConfig
from proqa_tpu.models.reader import (
    QAConfig,
    decode_spans,
    init_qa_params,
    qa_forward,
    qa_frozen_mask,
    qa_loss,
)
from proqa_tpu.models.retriever import encode_query
from proqa_tpu.parallel.mesh import DATA_AXIS, make_mesh
from proqa_tpu.text.metrics import exact_match_score, metric_max_over_ground_truths, regex_match_score
from proqa_tpu.text.squad import get_final_text, wordpieces_to_text
from proqa_tpu.train import checkpoint as ckpt
from proqa_tpu.train.meta import read_trainer_meta, write_trainer_meta
from proqa_tpu.train.optim import apply_gradients, init_train_state, make_optimizer
from proqa_tpu.utils.logging import AverageMeter, MetricLogger, setup_logger
from proqa_tpu.utils.profiling import StepTimer, TraceWindow

ALPHA_GRID = (0, 0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.5, 0.55, 0.6, 0.7, 0.8, 0.9, 1)

Prediction = collections.namedtuple(
    "Prediction", ["text", "rank_score", "span_score", "passage", "question"]
)


@dataclasses.dataclass
class QATrainerConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 0.0
    max_grad_norm: float = 5.0
    adam_eps: float = 1e-8
    accumulate_gradients: int = 1  # microbatches per optimizer step, scanned
                                   # inside the jitted step (reference
                                   # qa/config.py:57, train_retrieve_qa.py:196-217)
    num_train_epochs: int = 20
    eval_period: int = -1          # -1: eval at epoch end only (reference default)
    wait_step: int = 100
    eval_k: int = 5
    train_k: int = 5               # paragraphs read per question (ref batch size 5)
    questions_per_batch: int = 4
    fix_para_encoder: bool = True
    freeze_retriever: bool = False
    do_lower_case: bool = True
    regex: bool = False
    max_answer_len: int = 10
    seed: int = 3
    output_dir: str = "logs/qa"
    fast_prng: bool = True  # TPU hardware RNG for dropout masks (see
                            # RetrieverTrainerConfig.fast_prng)
    prefetch_batches: int = 2  # sampler batches built ahead of the device
                               # (host span matching overlaps TPU steps);
                               # 0 disables the prefetch thread
    profile_dir: str = ""      # jax.profiler device trace of a few warm steps
    profile_steps: int = 3


class QATrainer:
    def __init__(
        self,
        bert_cfg: BertConfig,
        qa_cfg: QAConfig,
        tcfg: QATrainerConfig,
        *,
        mesh=None,
        params=None,
    ):
        self.cfg = bert_cfg
        self.qcfg = qa_cfg
        self.tcfg = tcfg
        self.mesh = mesh if mesh is not None else make_mesh()
        n_dev = self.mesh.shape[DATA_AXIS]
        accum = max(1, tcfg.accumulate_gradients)
        assert tcfg.questions_per_batch % (n_dev * accum) == 0, (
            f"questions_per_batch={tcfg.questions_per_batch} must divide over "
            f"{accum} microbatches x the {n_dev}-device data mesh"
        )
        self.logger = setup_logger("proqa.qa", f"{tcfg.output_dir}/log.txt")
        self.metrics = MetricLogger(f"{tcfg.output_dir}/metrics.jsonl")
        self._resume_meta: dict = {}  # loop progress restored by resume()
        if tcfg.fast_prng:
            jax.config.update("jax_default_prng_impl", "rbg")
        self.rng = jax.random.PRNGKey(tcfg.seed)

        if params is None:
            self.rng, init_rng = jax.random.split(self.rng)
            params = init_qa_params(init_rng, bert_cfg, qa_cfg)
        else:
            # the train step donates state buffers; never destroy caller arrays
            params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        frozen = qa_frozen_mask(
            params,
            freeze_c_encoder=tcfg.fix_para_encoder,
            freeze_retriever=tcfg.freeze_retriever,
        )
        self.tx = make_optimizer(
            tcfg.learning_rate,
            weight_decay=tcfg.weight_decay,
            max_grad_norm=tcfg.max_grad_norm,
            adam_eps=tcfg.adam_eps,
            frozen_mask=frozen,
        )
        self.state = init_train_state(params, self.tx)

        replicated = NamedSharding(self.mesh, P())
        batch_sharded = NamedSharding(self.mesh, P(DATA_AXIS))

        def microbatch_grads(params, mb, rng):
            def loss_fn(p):
                out = qa_forward(
                    p, bert_cfg, qa_cfg, mb, deterministic=False, dropout_rng=rng
                )
                comp = qa_loss(out, mb, qa_cfg)
                return comp["loss"], comp

            (_, comp), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return grads, comp

        def train_step(state, batch, rng, corpus_emb):
            # corpus_emb: device-resident index for the para_rows gather path
            # (None with host-materialized para_embed batches). Kept OUT of
            # `batch` so grad-accum microbatch splitting and the batch
            # sharding spec never touch the [N, D] corpus.
            def with_emb(mb):
                return mb if corpus_emb is None else {**mb, "corpus_emb": corpus_emb}

            if accum == 1:
                grads, comp = microbatch_grads(state.params, with_emb(batch), rng)
            else:
                # lax.scan over question-dim microbatches (reference
                # --accumulate_gradients, qa/train_retrieve_qa.py:196-217)
                split = {
                    k: v.reshape(accum, v.shape[0] // accum, *v.shape[1:])
                    for k, v in batch.items()
                }
                rngs = jax.random.split(rng, accum)

                def body(carry, inp):
                    gsum, csum = carry
                    mb, r = inp
                    g, c = microbatch_grads(state.params, with_emb(mb), r)
                    return (
                        jax.tree.map(jnp.add, gsum, g),
                        jax.tree.map(jnp.add, csum, c),
                    ), None

                zero_g = jax.tree.map(jnp.zeros_like, state.params)
                comp_struct = jax.eval_shape(
                    lambda p, mb, r: microbatch_grads(p, with_emb(mb), r)[1],
                    state.params, {k: v[0] for k, v in split.items()}, rngs[0],
                )
                zero_c = jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), comp_struct
                )
                (gsum, csum), _ = jax.lax.scan(body, (zero_g, zero_c), (split, rngs))
                grads = jax.tree.map(lambda g: g / accum, gsum)
                comp = jax.tree.map(lambda c: c / accum, csum)
            return apply_gradients(state, grads, self.tx), comp

        # corpus_emb keeps its existing sharding (None spec): a mesh-sharded
        # index must not be all-gathered to satisfy a replicated constraint
        self._train_step_fn = jax.jit(
            train_step,
            in_shardings=(replicated, batch_sharded, replicated, None),
            out_shardings=(replicated, replicated),
            donate_argnums=(0,),
        )
        self._train_step_body = train_step
        self._packed_cache: dict = {}  # shape signature -> (jitted fn, keys)
        self._corpus_emb = None

        def eval_step(params, batch):
            out = qa_forward(params, bert_cfg, qa_cfg, batch, deterministic=True)
            start, end, score = decode_spans(
                out["start_logits"], out["end_logits"], tcfg.max_answer_len
            )
            rank = (
                out["select_logits"] if qa_cfg.add_select
                else out["rank_logits"][:, : start.shape[1]]
            )
            return {"start": start, "end": end, "span_score": score, "rank_score": rank}

        self._eval_step = jax.jit(
            eval_step,
            in_shardings=(replicated, batch_sharded),
            out_shardings=replicated,
        )

        self._raw_encode_query = lambda p, ids, mask: encode_query(p, bert_cfg, ids, mask)
        self._encode_query = jax.jit(self._raw_encode_query)
        # (index id, k, exact, ids shape) ->
        #   (weakref(index), (fn, operands) | None, consecutive_failures)
        self._fused_cache: dict = {}
        # Serializes state-reading dispatches against the train step's
        # donate+reassign: the prefetch thread encodes queries with the live
        # params, and must never capture a state whose buffers were just
        # donated but not yet replaced.
        self._state_lock = threading.Lock()

    # -------------------- plumbing --------------------

    def set_corpus(self, index) -> None:
        """Register the dense index whose device-resident embeddings the
        train step gathers para_embed from (para_rows batches). Called
        automatically by train(); needed before driving _train_step manually
        with sampler batches. The index (not its buffer) is stored, so an
        incremental index.add() is picked up by the next step."""
        self._corpus_index = index
        self._corpus_emb = index.embeddings  # back-compat for probes/tools

    def _train_step(self, state, batch, rng):
        idx = getattr(self, "_corpus_index", None)
        if idx is not None:
            self._corpus_emb = idx.embeddings
        emb = self._corpus_emb if "para_rows" in batch else None
        if "para_rows" in batch and emb is None:
            raise ValueError(
                "batch uses para_rows but no corpus is registered — call "
                "trainer.set_corpus(sampler.index) (train() does this)"
            )
        packed = self._pack_batch(batch)
        if packed is not None:
            fn, flat = packed
            return fn(state, flat, rng, emb)
        return self._train_step_fn(state, batch, rng, emb)

    def _pack_batch(self, batch):
        """Single-transfer fast path: concatenate every host int array of the
        batch into ONE flat int32 buffer (unpacked by static slicing inside
        the jit, masks re-derived on device). The per-array `jnp.asarray`
        path paid the tunneled TPU's fixed per-transfer latency ~10x per
        step (~14 ms measured, tools/qa_wall_decomp.py). Engages only on a
        single-device mesh (multi-device DP shards the batch dict per-array)
        with all-integer numpy batches whose masks carry no information
        beyond (ids != 0). Returns (jitted_fn, flat) or None."""
        if self.mesh.size != 1:
            return None
        if not all(
            isinstance(v, np.ndarray) and v.dtype.kind == "i"
            for v in batch.values()
        ):
            return None
        needed = ("input_ids", "input_ids_q", "input_mask", "input_mask_q")
        if any(k not in batch for k in needed):
            return None
        if not np.array_equal(batch["input_mask"], batch["input_ids"] != 0) or \
                not np.array_equal(batch["input_mask_q"], batch["input_ids_q"] != 0):
            return None
        keys = tuple(sorted(k for k in batch if k not in ("input_mask", "input_mask_q")))
        sig = tuple((k, batch[k].shape) for k in keys)
        if sig not in self._packed_cache:
            body = self._train_step_body

            def step(state, flat, rng, emb):
                b = {}
                off = 0
                for k, shape in sig:
                    size = int(np.prod(shape))
                    b[k] = flat[off : off + size].reshape(shape)
                    off += size
                b["input_mask"] = (b["input_ids"] != 0).astype(jnp.int32)
                b["input_mask_q"] = (b["input_ids_q"] != 0).astype(jnp.int32)
                return body(state, b, rng, emb)

            self._packed_cache[sig] = jax.jit(step, donate_argnums=(0,))
        flat = np.concatenate(
            [np.ascontiguousarray(batch[k], np.int32).ravel() for k in keys]
        )
        return self._packed_cache[sig], flat

    def query_encoder(self) -> Callable:
        """Encoder reading the LIVE retriever params at every call, so online
        retrieval follows training (and donated state buffers are never
        captured stale). Safe to call from the prefetch thread: dispatch is
        serialized against the train step's state swap.

        The returned object is also an `encode_search` provider: the sampler
        uses it to run encode+search as ONE device dispatch instead of two
        (each synchronized dispatch through the tunneled TPU costs ~26-52 ms
        of fixed latency)."""
        trainer = self

        class _LiveEncoder:
            def __call__(self, ids, mask):
                with trainer._state_lock:
                    return trainer._encode_query(
                        trainer.state.params["retriever"], jnp.asarray(ids), jnp.asarray(mask)
                    )

            def encode_search(self, ids, mask, index, k, exact):
                return trainer._encode_search(ids, mask, index, k, exact)

        return _LiveEncoder()

    _FUSED_MAX_FAILURES = 3  # consecutive dispatch errors before giving up

    def _encode_search(self, ids, mask, index, k: int, exact: bool):
        """One-dispatch encode+search against `index` with the live retriever
        params. Returns (vals, idx) as host arrays with the same contract as
        DenseIndex.search, or None when the index can't fuse (caller falls
        back to the two-dispatch path).

        Cache notes: entries are keyed by id(index) but validated against a
        weakref before use — CPython reuses addresses, and a hit on a NEW
        index at a dead index's address would silently search the old
        corpus. Dead indexes' entries are purged via weakref callback so the
        cache never pins a retired index's device embeddings. Transient
        dispatch errors (the tunnel/remote compiler flakes) do NOT poison
        the entry; only _FUSED_MAX_FAILURES consecutive failures disable the
        fused path for that key."""
        ids = np.asarray(ids)
        # version in the key: an incremental add/remove (DenseIndex.add)
        # replaces the embeddings buffer / changes n — a pre-mutation fused
        # program must never serve the old corpus
        version = getattr(index, "version", 0)
        key = (id(index), version, int(k), bool(exact), ids.shape)
        cached = self._fused_cache.get(key)
        if cached is not None and cached[0]() is not index:
            cached = None  # id reused by a different (or rebuilt) index
        if cached is None:
            # drop stale-version entries of this index so the cache doesn't
            # pin pre-mutation device buffers (the operands tuple holds the
            # old embeddings array)
            stale = [
                kk for kk in self._fused_cache
                if kk[0] == id(index) and kk[1] != version
                and self._fused_cache[kk][0]() is index
            ]
            for kk in stale:
                del self._fused_cache[kk]
            entry = index.fused_search_fn(
                self._raw_encode_query, k, exact=exact, q_count=ids.shape[0]
            )
            if entry is not None and not self._devices_compatible(entry[1]):
                # e.g. params replicated over a multi-device mesh while the
                # index sits on one device — jit would reject mixed sets
                entry = None
            # the callback cycle (cache -> weakref -> bound _purge_fused ->
            # trainer -> cache) is gc-collectable; neither class defines
            # __del__
            ref = weakref.ref(index, self._purge_fused)
            cached = (
                (ref, None, self._FUSED_MAX_FAILURES) if entry is None
                else (ref, entry, 0)
            )
            self._fused_cache[key] = cached
        ref, entry, failures = cached
        if entry is None or failures >= self._FUSED_MAX_FAILURES:
            return None
        fn, operands = entry
        try:
            # mask is NOT shipped: the fused fn derives it on device from ids
            # (one less per-group host->device transfer through the tunnel)
            with self._state_lock:
                out = fn(
                    self.state.params["retriever"], jnp.asarray(ids), *operands
                )
        except Exception as e:  # never kill training over a fusion fast path
            failures += 1
            self._fused_cache[key] = (ref, entry, failures)
            self.logger.warning(
                f"fused encode+search failed ({type(e).__name__}: {e}); "
                f"falling back to two-dispatch retrieval "
                f"({failures}/{self._FUSED_MAX_FAILURES} before disabling)"
            )
            return None
        if failures:
            self._fused_cache[key] = (ref, entry, 0)  # success resets the count
        vals, idx = (np.asarray(x) for x in out)
        if vals.shape[1] < k:  # degenerate tiny-corpus case, as DenseIndex.search
            pad = k - vals.shape[1]
            vals = np.pad(vals, ((0, 0), (0, pad)), constant_values=-np.inf)
            idx = np.pad(idx, ((0, 0), (0, pad)))
        return vals, idx

    def _purge_fused(self, dead_ref) -> None:
        """weakref callback: drop cache entries of a collected index so the
        cache never keeps a retired index's embeddings alive."""
        self._fused_cache = {
            k: v for k, v in self._fused_cache.items() if v[0] is not dead_ref
        }

    def _devices_compatible(self, operands) -> bool:
        leaves = jax.tree_util.tree_leaves(self.state.params)
        pset = getattr(getattr(leaves[0], "sharding", None), "device_set", None)
        if pset is None:
            return True
        for op in operands:
            oset = getattr(getattr(op, "sharding", None), "device_set", None)
            if oset is not None and oset != pset:
                return False
        return True

    def _prefetched(self, batch_iter):
        if self.tcfg.prefetch_batches > 0:
            return BatchLoader(batch_iter, prefetch=self.tcfg.prefetch_batches)
        return batch_iter

    def save(self, name: str):
        ckpt.save_checkpoint(f"{self.tcfg.output_dir}/{name}.msgpack", self.state)

    def _write_meta(self, best_em: float, wait: int, epoch: int) -> None:
        """Loop-progress sidecar so resume() continues the best-model race,
        early stopping, and epoch position (semantics: train/meta.py)."""
        write_trainer_meta(self.tcfg.output_dir, "best_em", best_em, wait, epoch)

    def resume(self, path: str):
        self.state = ckpt.load_checkpoint(path, self.state)
        self._resume_meta = read_trainer_meta(path)
        if self._resume_meta:
            self.logger.info(f"resumed loop progress: {self._resume_meta}")

    def _device_batch(self, net: dict):
        return {k: jnp.asarray(v) for k, v in net.items()}

    # -------------------- evaluation --------------------

    def _iter_candidate_predictions(self, sampler, B: int):
        """Retrieve + read + decode: yields one
        (qid, question, true_answers, [Prediction x eval_k]) tuple per
        question. Shared decode path of `predict` (batch EM eval) and
        `answer` (one-shot serving)."""
        t = self.tcfg
        buckets = getattr(sampler.cfg, "pad_buckets", False)
        for batch in self._prefetched(sampler.eval_load(self.query_encoder(), t.eval_k, B)):
            # pad_buckets (serving): pad the reader forward to the group's
            # power-of-two bucket, rounded UP to a multiple of the data-mesh
            # size (_eval_step DP-shards the batch dim, so it must stay
            # divisible — a max() floor breaks on non-power-of-two meshes,
            # e.g. bucket 4 on a 3-device mesh)
            if buckets:
                mesh_n = self.mesh.shape[DATA_AXIS]
                target = -(-pad_bucket(len(batch["id"]), B) // mesh_n) * mesh_n
            else:
                target = B
            net, rows = batch_pad(batch["net_input"], target)
            out = self._eval_step(self.state.params, self._device_batch(net))
            start = np.asarray(out["start"])[:rows]
            end = np.asarray(out["end"])[:rows]
            span_score = np.asarray(out["span_score"])[:rows]
            rank_score = np.asarray(out["rank_score"])[:rows]

            for qi, qid in enumerate(batch["id"]):
                preds = []
                for pi in range(t.eval_k):
                    off = batch["para_offset"][qi][pi]
                    s = int(start[qi, pi]) - off
                    e = int(end[qi, pi]) - off
                    t2o = batch["tok_to_orig_index"][qi][pi]
                    doc_tokens = batch["doc_tokens"][qi][pi]
                    wp = batch["wp_tokens"][qi][pi]
                    if not wp or s < 0 or s >= len(t2o):
                        final = ""
                    else:
                        e = min(e, len(t2o) - 1)
                        tok_text = wordpieces_to_text(wp[s : e + 1])
                        orig_text = " ".join(doc_tokens[t2o[s] : t2o[e] + 1])
                        final = get_final_text(
                            tok_text, orig_text, do_lower_case=t.do_lower_case, verbose=False
                        )
                    preds.append(Prediction(
                        text=final,
                        rank_score=float(rank_score[qi, pi]),
                        span_score=float(span_score[qi, pi]),
                        passage=" ".join(doc_tokens),
                        question=batch["q"][qi],
                    ))
                yield qid, batch["q"][qi], batch["true_answers"][qi], preds

    def answer(self, sampler, alpha=0.8, topn=3) -> list[dict]:
        """One-shot open-domain QA inference (the serving path): retrieve
        eval_k paragraphs, read, extract the best span per question, rank
        candidates by alpha*span + (1-alpha)*rank. The reference exposes no
        single-question path (train_retrieve_qa.py:280-330 only batch-evals
        against gold answers); this is predict's decode without the sweep.

        alpha/topn may be scalars or per-question sequences aligned with the
        sampler's question order — the ranking mix is a HOST-side decode over
        already-computed span/rank scores, so questions with different alphas
        still share every device dispatch (serving.MicroBatcher relies on
        this to coalesce concurrent requests into one dispatch).
        """
        results = []
        alphas = alpha if isinstance(alpha, (list, tuple)) else None
        topns = topn if isinstance(topn, (list, tuple)) else None
        for _qid, question, _ans, preds in self._iter_candidate_predictions(
            sampler, sampler.cfg.question_batch
        ):
            a = float(alphas[len(results)]) if alphas is not None else alpha
            n = int(topns[len(results)]) if topns is not None else topn
            ranked = sorted(
                preds,
                key=lambda x: a * x.span_score + (1 - a) * x.rank_score,
                reverse=True,
            )
            results.append({
                "question": question,
                "answer": ranked[0].text if ranked else "",
                "alpha": a,
                "candidates": [
                    {
                        "answer": p.text,
                        "score": round(a * p.span_score + (1 - a) * p.rank_score, 4),
                        "span_score": round(p.span_score, 4),
                        "rank_score": round(p.rank_score, 4),
                        "passage": p.passage,
                    }
                    for p in ranked[:n]
                ],
            })
        return results

    def predict(
        self,
        sampler,
        save_path: str | None = None,
        save_all_prefix: str | None = None,
    ) -> float:
        """Full EM eval with the rank/span linear-combination sweep.

        save_path: optional jsonl of the best-alpha top predictions
        (reference --save-pred, train_retrieve_qa.py:391-394 best alpha).
        save_all_prefix: reference --save-all/--save-pred dump set
        (train_retrieve_qa.py:359-364,391-394): `{prefix}_all.json` (every
        candidate prediction per question), `{prefix}_ground.json` (ground
        truths), and `{prefix}_{alpha}.json` per-alpha top-1 jsonl.
        """
        t = self.tcfg
        qid2results: dict[str, list[Prediction]] = collections.defaultdict(list)
        qid2ground: dict[str, list] = {}
        B = sampler.cfg.question_batch

        for qid, _q, true_answers, preds in self._iter_candidate_predictions(sampler, B):
            qid2ground[qid] = true_answers
            qid2results[qid].extend(preds)

        if save_all_prefix:
            # reference --save-all (train_retrieve_qa.py:359-364): every
            # candidate prediction and the ground truths, for offline analysis
            with open(f"{save_all_prefix}_all.json", "w") as f:
                json.dump({q: [p._asdict() for p in ps] for q, ps in qid2results.items()}, f)
            with open(f"{save_all_prefix}_ground.json", "w") as f:
                json.dump(qid2ground, f)

        match_fn = regex_match_score if t.regex else exact_match_score
        # first alpha wins ties (reference `em > best_em`, :386-387)
        best_em, best_rows = -1.0, []
        for alpha in ALPHA_GRID:
            ems, rows = [], []
            for qid, preds in qid2results.items():
                top = max(preds, key=lambda x: alpha * x.span_score + (1 - alpha) * x.rank_score)
                # gold-less rows (serving-style inputs) are EXCLUDED from the
                # EM mean — averaging them in as 0 would silently deflate EM
                # on mixed datasets (suppressing best-model saves and firing
                # wait_step early); the reference assumes gold always exists
                if qid2ground[qid]:
                    em_i = metric_max_over_ground_truths(
                        match_fn, top.text, qid2ground[qid]
                    )
                    ems.append(em_i)
                else:
                    em_i = None  # not scorable
                rows.append({
                    "question": top.question, "para": top.passage, "answer": top.text,
                    "rank_score": top.rank_score, "span_score": top.span_score,
                    "gold": qid2ground[qid], "alpha": alpha,
                    "em": None if em_i is None else float(em_i),
                })
            em = float(np.mean(ems)) if ems else 0.0
            if em > best_em:
                best_em, best_rows = em, rows
            if save_all_prefix:
                # reference --save-pred per-alpha dumps (:391-394)
                with open(f"{save_all_prefix}_{alpha}.json", "w") as f:
                    for row in rows:
                        f.write(json.dumps(row) + "\n")
        if save_path:
            with open(save_path, "w") as f:
                for row in best_rows:
                    f.write(json.dumps(row) + "\n")
        return max(best_em, 0.0)

    # -------------------- training --------------------

    def train(self, train_sampler, eval_sampler) -> float:
        t = self.tcfg
        if getattr(train_sampler, "index", None) is not None:
            self.set_corpus(train_sampler.index)
        best_em = float(self._resume_meta.get("best_em", 0.0))
        wait = int(self._resume_meta.get("wait", 0))
        start_epoch = int(self._resume_meta.get("epoch", 0))
        stop = False
        meter = AverageMeter()
        timer = StepTimer()
        tracer = TraceWindow(t.profile_dir, steps=t.profile_steps, logger=self.logger)
        for epoch in range(start_epoch, t.num_train_epochs):
            train_sampler.shuffle(seed=t.seed + epoch)
            for batch in self._prefetched(train_sampler.load(
                self.query_encoder(), t.train_k, t.questions_per_batch
            )):
                tracer.tick()
                net, rows = batch_pad(batch["net_input"], t.questions_per_batch)
                net["question_mask"] = (
                    np.arange(t.questions_per_batch) < rows
                ).astype(np.int32)
                self.rng, step_rng = jax.random.split(self.rng)
                with timer:
                    with self._state_lock:
                        # host net passed raw: _train_step packs it into a
                        # single device transfer when eligible (_pack_batch)
                        self.state, comp = self._train_step(self.state, net, step_rng)
                    loss = float(comp["loss"])  # forces the step inside the timer
                step = int(self.state.step)
                meter.update(loss)
                self.metrics.scalar("train_loss", loss, step)

                if t.eval_period != -1 and step % t.eval_period == 0:
                    em = self.predict(eval_sampler)
                    self.metrics.scalar("dev_em", em * 100, step)
                    self.logger.info(
                        f"Step {step} loss {meter.avg:.3f} EM {em*100:.2f} epoch={epoch}"
                    )
                    if em > best_em:
                        self.save("best-model")
                        best_em, wait = em, 0
                    else:
                        wait += 1
                        # >= not ==: a resume can restore wait already at
                        # wait_step (countdown fired before the save); an
                        # equality check would then never trigger again
                        if wait >= t.wait_step:
                            stop = True
                    self._write_meta(best_em, wait, epoch)
                    if stop:
                        break

            self.logger.info(
                f"Failed retrieval: {train_sampler.failed_retrieval}/{len(train_sampler)}"
            )
            # NOTE: a mid-epoch early-stop break still reaches this epoch-end
            # eval before terminating — deliberate reference parity
            # (train_retrieve_qa.py:243-255 runs its epoch-end predict and can
            # save best-model after stop_training is already set, then breaks)
            # full-state epoch checkpoint: supersedes the reference's late
            # per-epoch dumps (train_retrieve_qa.py:257-260) and — unlike any
            # reference checkpoint — is resumable (step + optimizer moments)
            self.save("checkpoint_last")
            # pair the advanced epoch pointer with the save IMMEDIATELY: a
            # crash during the (minutes-long) epoch-end predict below would
            # otherwise leave end-of-epoch weights next to a stale epoch=E
            # meta, and the resume would re-train the whole epoch.
            # Re-written after the eval with the updated best/wait.
            self._write_meta(best_em, wait, epoch + 1)
            em = self.predict(eval_sampler)
            self.metrics.scalar("dev_em", em * 100, int(self.state.step))
            if em > best_em:
                self.save("best-model")
                best_em, wait = em, 0
            else:
                # the reference never increments wait_step on its epoch-end
                # eval (train_retrieve_qa.py:244-255), so with the default
                # eval_period=-1 its early stopping is dead code; here
                # epoch-end evals count toward wait_step too
                wait += 1
                if wait >= t.wait_step:
                    stop = True
            self._write_meta(best_em, wait, epoch + 1)
            if stop:
                break
        tracer.close()
        ts = timer.summary()
        if ts:
            self.metrics.scalar("step_p50_ms", ts["p50_s"] * 1e3, int(self.state.step))
            self.metrics.scalar("steps_per_s", ts["steps_per_s"], int(self.state.step))
        self.logger.info("Training finished!")
        return best_em
