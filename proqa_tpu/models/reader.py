"""Joint retrieve-and-read QA model: BERT span reader + retriever rank head.

Equivalent of `BertRetrieveQA` (/root/reference/qa/bert_retrieve_qa.py:12-176):
a reader BERT over [CLS] q [SEP] p [SEP] inputs with a span head
(Linear(h, 2)), the bi-encoder retriever embedded as a submodule for the rank
logits (q_emb · para_embed^T), and an optional CLS selection head.

The reference's "loss zoo" (bert_retrieve_qa.py:83-171) is re-derived here in
fully static shapes: every list-comprehension-over-nonzero in the reference
becomes `where`-masked log-sum-exp arithmetic, with the same empty-gold guard
semantics (loss contribution 0 when a question has no positive — reference
:93-95,151-153,164-166). Batched over questions (the reference processes one
question per step; here B questions × k paragraphs per device step).

Loss semantics (flags in reference qa/config.py:103-108):
* early loss   : marginal CE of gold paragraphs among the top-M retrieved
                 (-log Σ_gold softmax(rank_logits)); disabled by drop_early.
* span loss    : per-paragraph or shared (flattened over k paragraphs)
                 normalization of start/end log-softmax; marginalized over
                 all gold spans (Σ exp).
* joint        : span marginal × paragraph rank prob (or select prob), i.e.
                 -log Σ_paras Σ_spans P_rank(p) P_span(s|p);
  separate     : -log Σ marginal span probs + select loss + early loss.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from proqa_tpu.models.bert import BertConfig, bert_encoder, init_bert_params
from proqa_tpu.models.retriever import EMBED_DIM, encode_query, init_retriever_params

NEG = -1.0e10  # matches the reference's masked_fill(-1e10)


@dataclasses.dataclass(frozen=True)
class QAConfig:
    shared_norm: bool = False
    separate: bool = False
    add_select: bool = False
    drop_early: bool = False
    qa_drop: float = 0.0
    max_answer_len: int = 10


def init_qa_params(rng: jax.Array, cfg: BertConfig, qcfg: QAConfig, embed_dim: int = EMBED_DIM) -> Any:
    kr, kb, kq, ks = jax.random.split(rng, 4)
    s = cfg.initializer_range
    params = {
        "bert": init_bert_params(kb, cfg),
        "retriever": init_retriever_params(kr, cfg, embed_dim),
        "qa_outputs": {
            "kernel": (s * jax.random.normal(kq, (cfg.hidden_size, 2))).astype(jnp.float32),
            "bias": jnp.zeros((2,), jnp.float32),
        },
    }
    if qcfg.add_select:
        params["select_outputs"] = {
            "kernel": (s * jax.random.normal(ks, (cfg.hidden_size, 1))).astype(jnp.float32),
            "bias": jnp.zeros((1,), jnp.float32),
        }
    return params


def qa_frozen_mask(params: Any, *, freeze_c_encoder: bool = False, freeze_retriever: bool = False):
    """Boolean pytree (True = frozen) for optimizer partitioning; mirrors
    freeze_c_encoder/freeze_retriever (reference bert_retrieve_qa.py:48-56)."""

    def fill(tree, value):
        return jax.tree.map(lambda _: value, tree)

    mask = fill(params, False)
    if freeze_retriever:
        mask["retriever"] = fill(params["retriever"], True)
    elif freeze_c_encoder:
        mask["retriever"]["bert_c"] = fill(params["retriever"]["bert_c"], True)
        mask["retriever"]["proj_c"] = fill(params["retriever"]["proj_c"], True)
    return mask


def _dense(x, p):
    y = jnp.einsum("...h,ho->...o", x, p["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return y + p["bias"]


def qa_forward(
    params: Any,
    cfg: BertConfig,
    qcfg: QAConfig,
    batch: dict,
    *,
    deterministic: bool = True,
    dropout_rng: jax.Array | None = None,
) -> dict:
    """Forward over a [B, k, L] reader batch.

    batch keys: input_ids/input_mask/segment_ids/paragraph_mask [B,k,L],
    input_ids_q/input_mask_q [B,Tq], and the rank-head candidates as either
    para_embed [B,M,D] (host-materialized) or para_rows [B,M] + corpus_emb
    [N,D] (device-resident index gather — avoids shipping ~10 MB of
    embeddings through the host per step; the tunnel moves ~105 MB/s).
    Returns start/end logits [B,k,L] (masked to paragraph tokens),
    rank_logits [B,M], q_embed [B,D], and select_logits [B,k] if enabled.
    """
    b, k, l = batch["input_ids"].shape
    flat = lambda x: x.reshape(b * k, l)

    if dropout_rng is None:
        r_bert = r_q = r_drop = None
    else:
        r_bert, r_q, r_drop = jax.random.split(dropout_rng, 3)

    seq, pooled = bert_encoder(
        params["bert"], cfg,
        flat(batch["input_ids"]), flat(batch["input_mask"]), flat(batch["segment_ids"]),
        deterministic=deterministic, dropout_rng=r_bert,
    )
    if not deterministic and qcfg.qa_drop > 0.0:
        from proqa_tpu.models.bert import _dropout

        seq = _dropout(seq, qcfg.qa_drop, r_drop, deterministic)

    logits = _dense(seq, params["qa_outputs"])          # [B*k, L, 2] f32
    para_mask = flat(batch["paragraph_mask"])
    start_logits = jnp.where(para_mask == 1, logits[..., 0], NEG).reshape(b, k, l)
    end_logits = jnp.where(para_mask == 1, logits[..., 1], NEG).reshape(b, k, l)

    q_embed = encode_query(
        params["retriever"], cfg, batch["input_ids_q"], batch["input_mask_q"],
        deterministic=deterministic, dropout_rng=r_q,
    )                                                    # [B, D] f32
    if "para_embed" in batch:
        para_embed = batch["para_embed"]
    else:
        # mode="clip" is the padding contract: under-filled retrieval slots
        # travel as row -1 (qa/sampler.py _retrieve) and must gather row 0,
        # matching the host path's np.maximum(rows, 0). Default jnp.take
        # WRAPS -1 to the last row (and NaN-fills true out-of-bounds).
        para_embed = jnp.take(
            batch["corpus_emb"], batch["para_rows"], axis=0, mode="clip"
        )
    rank_logits = jnp.einsum(
        "bd,bmd->bm", q_embed, para_embed.astype(q_embed.dtype),
        preferred_element_type=jnp.float32,
    )

    out = {
        "start_logits": start_logits,
        "end_logits": end_logits,
        "rank_logits": rank_logits,
        "q_embed": q_embed,
    }
    if qcfg.add_select:
        out["select_logits"] = _dense(pooled, params["select_outputs"]).reshape(b, k)
    return out


# --------------------------------------------------------------------------
# loss zoo
# --------------------------------------------------------------------------


def _span_log_probs(start_logits, end_logits, start_pos, end_pos, shared_norm: bool):
    """Log prob of each annotated span. [B,k,L] logits, [B,k,S] positions
    (-1 = padding). Returns [B,k,S] log probs with -inf at padded slots."""
    b, k, l = start_logits.shape
    valid = start_pos >= 0                                # [B,k,S]
    s_idx = jnp.maximum(start_pos, 0)
    e_idx = jnp.maximum(end_pos, 0)

    if shared_norm:
        ls = jax.nn.log_softmax(start_logits.reshape(b, k * l), axis=-1).reshape(b, k, l)
        le = jax.nn.log_softmax(end_logits.reshape(b, k * l), axis=-1).reshape(b, k, l)
    else:
        ls = jax.nn.log_softmax(start_logits, axis=-1)
        le = jax.nn.log_softmax(end_logits, axis=-1)

    sp = jnp.take_along_axis(ls, s_idx, axis=-1)
    ep = jnp.take_along_axis(le, e_idx, axis=-1)
    return jnp.where(valid, sp + ep, -jnp.inf)


def qa_loss(out: dict, batch: dict, qcfg: QAConfig) -> dict:
    """Total loss (mean over questions) plus components.

    batch targets: start_positions/end_positions [B,k,S] (-1 pad),
    para_targets [B,k] (paragraph covered), top5000_labels [B,M].
    """
    start_logits, end_logits = out["start_logits"], out["end_logits"]
    rank_logits = out["rank_logits"]                     # [B, M]
    b, k, l = start_logits.shape

    # ---- early loss: -log Σ_gold softmax(rank_logits) ----
    labels = batch["top5000_labels"]
    any_gold = jnp.any(labels > 0, axis=-1)              # [B]
    lse = jax.nn.logsumexp(rank_logits, axis=-1)
    gold_lse = jax.nn.logsumexp(
        jnp.where(labels > 0, rank_logits, -jnp.inf), axis=-1
    )
    early = jnp.where(any_gold, lse - gold_lse, 0.0)
    if qcfg.drop_early:
        early = jnp.zeros_like(early)

    # ---- span marginal per paragraph ----
    span_lp = _span_log_probs(
        start_logits, end_logits,
        batch["start_positions"], batch["end_positions"], qcfg.shared_norm,
    )                                                    # [B,k,S]
    marg_lp = jax.nn.logsumexp(span_lp, axis=-1)         # [B,k], -inf if no span
    has_span = jnp.any(jnp.isfinite(span_lp), axis=-1)   # [B,k]
    any_span = jnp.any(has_span, axis=-1)                # [B]

    if qcfg.separate:
        # span: -log Σ_paras exp(marg_lp)
        span_loss = jnp.where(
            any_span, -jax.nn.logsumexp(jnp.where(has_span, marg_lp, -jnp.inf), axis=-1), 0.0
        )
        total = span_loss + early
        components = {"span_loss": span_loss, "early_loss": early}
        if qcfg.add_select:
            select_logits = out["select_logits"]         # [B,k]
            sel_targets = batch["para_targets"] > 0      # [B,k]
            any_sel = jnp.any(sel_targets, axis=-1)
            s_lse = jax.nn.logsumexp(select_logits, axis=-1)
            s_gold = jax.nn.logsumexp(
                jnp.where(sel_targets, select_logits, -jnp.inf), axis=-1
            )
            select_loss = jnp.where(any_sel, s_lse - s_gold, 0.0)
            total = total + select_loss
            components["select_loss"] = select_loss
    else:
        # joint: -log Σ_paras P_rank(p) Σ_spans P_span(s|p)
        if qcfg.add_select:
            rank_lp_k = jax.nn.log_softmax(out["select_logits"], axis=-1)
        else:
            # softmax over all M candidates, restricted to the k read paras
            # (the search returns them first — reference
            # bert_retrieve_qa.py:162 takes rank_probs[:k])
            rank_lp_k = jax.nn.log_softmax(rank_logits, axis=-1)[:, :k]
        joint_lp = jnp.where(has_span, marg_lp + rank_lp_k, -jnp.inf)
        joint_loss = jnp.where(any_span, -jax.nn.logsumexp(joint_lp, axis=-1), 0.0)
        total = joint_loss + early
        components = {"joint_loss": joint_loss, "early_loss": early}

    # questions with no gold anywhere contribute only their early guard (0);
    # question_mask (optional, [B]) excludes batch-padding rows entirely
    qmask = batch.get("question_mask")
    if qmask is None:
        components["loss"] = jnp.mean(total)
        components = {kk: (jnp.mean(vv) if vv.ndim else vv) for kk, vv in components.items()}
    else:
        qmask = qmask.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(qmask), 1.0)
        components["loss"] = jnp.sum(total * qmask) / denom
        components = {
            kk: (jnp.sum(vv * qmask) / denom if vv.ndim else vv)
            for kk, vv in components.items()
        }
    return components


# --------------------------------------------------------------------------
# eval-time span decoding
# --------------------------------------------------------------------------


def decode_spans(start_logits: jax.Array, end_logits: jax.Array, max_answer_len: int = 10):
    """Best span per paragraph under the band constraint 0 <= end-start <=
    max_answer_len (reference predict(), qa/train_retrieve_qa.py:300-314).

    [B,k,L] logits -> (start [B,k], end [B,k], score [B,k]).
    """
    b, k, l = start_logits.shape
    scores = start_logits[..., :, None] + end_logits[..., None, :]   # [B,k,L,L]
    i = jnp.arange(l)
    band = (i[None, :] >= i[:, None]) & (i[None, :] <= i[:, None] + max_answer_len)
    scores = jnp.where(band[None, None], scores, NEG)
    best_end_per_start = jnp.max(scores, axis=-1)         # [B,k,L]
    start = jnp.argmax(best_end_per_start, axis=-1)       # [B,k]
    score = jnp.max(best_end_per_start, axis=-1)
    end_idx = jnp.argmax(scores, axis=-1)                 # [B,k,L]
    end = jnp.take_along_axis(end_idx, start[..., None], axis=-1)[..., 0]
    return start, end, score
