"""Two-tower dense retriever (bi-encoder) with 128-d projections.

Equivalent of `BertForRetriever` (/root/reference/retrieval/retriever.py:8-43):
separate question/context BERT towers + Linear(hidden, 128) projections over
the pooled CLS output. Functional: params pytree in, embeddings out; the
contrastive in-batch-negative loss lives in train/retriever_trainer.py.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from proqa_tpu.models.bert import BertConfig, bert_encoder, init_bert_params

EMBED_DIM = 128  # reference hardcodes 128 (retriever.py:19, eval_retrieval.py:98)

RetrieverParams = Any


def init_retriever_params(rng: jax.Array, cfg: BertConfig, embed_dim: int = EMBED_DIM) -> RetrieverParams:
    kq, kc, kpq, kpc = jax.random.split(rng, 4)
    s = cfg.initializer_range

    def proj(rng_):
        return {
            "kernel": (s * jax.random.normal(rng_, (cfg.hidden_size, embed_dim))).astype(jnp.float32),
            "bias": jnp.zeros((embed_dim,), jnp.float32),
        }

    return {
        "bert_q": init_bert_params(kq, cfg),
        "bert_c": init_bert_params(kc, cfg),
        "proj_q": proj(kpq),
        "proj_c": proj(kpc),
    }


def _project(pooled: jax.Array, proj: Any) -> jax.Array:
    kernel = proj["kernel"].astype(pooled.dtype)
    y = jnp.einsum("bh,hd->bd", pooled, kernel, preferred_element_type=jnp.float32)
    return y + proj["bias"]  # fp32 embeddings


def encode_query(
    params: RetrieverParams,
    cfg: BertConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    *,
    deterministic: bool = True,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """[B, T] -> [B, embed_dim] fp32 query embeddings."""
    _, pooled = bert_encoder(
        params["bert_q"], cfg, input_ids, attention_mask,
        deterministic=deterministic, dropout_rng=dropout_rng,
    )
    return _project(pooled, params["proj_q"])


def encode_context(
    params: RetrieverParams,
    cfg: BertConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    *,
    deterministic: bool = True,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """[B, T] -> [B, embed_dim] fp32 paragraph embeddings."""
    _, pooled = bert_encoder(
        params["bert_c"], cfg, input_ids, attention_mask,
        deterministic=deterministic, dropout_rng=dropout_rng,
    )
    return _project(pooled, params["proj_c"])


def retriever_forward(
    params: RetrieverParams,
    cfg: BertConfig,
    batch: dict,
    *,
    deterministic: bool = True,
    dropout_rng: jax.Array | None = None,
) -> dict:
    """Both towers on a paired batch: {"q": [B,D], "c": [B,D]}."""
    if dropout_rng is None:
        rq = rc = None
    else:
        rq, rc = jax.random.split(dropout_rng)
    q = encode_query(
        params, cfg, batch["input_ids_q"], batch["input_mask_q"],
        deterministic=deterministic, dropout_rng=rq,
    )
    c = encode_context(
        params, cfg, batch["input_ids_c"], batch["input_mask_c"],
        deterministic=deterministic, dropout_rng=rc,
    )
    return {"q": q, "c": c}
