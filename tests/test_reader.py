"""QA reader + loss-zoo tests.

The loss zoo is verified against an independent numpy oracle implementing the
reference's math (marginal CE over gold paragraphs / spans, joint vs separate,
shared vs per-paragraph normalization, empty-gold guards) directly from its
definition — covering all flag combinations and the edge cases SURVEY.md §7
flags as hard (empty gold sets, padded spans)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from proqa_tpu.models.bert import BertConfig
from proqa_tpu.models.reader import (
    QAConfig,
    decode_spans,
    init_qa_params,
    qa_forward,
    qa_frozen_mask,
    qa_loss,
)


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def oracle_loss(out, batch, qcfg: QAConfig):
    """Reference semantics in plain numpy, one question at a time."""
    start_logits = np.asarray(out["start_logits"], np.float64)
    end_logits = np.asarray(out["end_logits"], np.float64)
    rank_logits = np.asarray(out["rank_logits"], np.float64)
    B, k, L = start_logits.shape
    totals = []
    for bi in range(B):
        # early loss
        labels = np.asarray(batch["top5000_labels"][bi])
        probs = _softmax(rank_logits[bi])
        gold_p = probs[labels > 0].sum()
        early = -np.log(gold_p) if (labels > 0).any() else 0.0
        if qcfg.drop_early:
            early = 0.0

        # span probabilities
        sp = np.asarray(batch["start_positions"][bi])   # [k, S]
        ep = np.asarray(batch["end_positions"][bi])
        if qcfg.shared_norm:
            ls = _softmax(start_logits[bi].reshape(-1)).reshape(k, L)
            le = _softmax(end_logits[bi].reshape(-1)).reshape(k, L)
        else:
            ls = _softmax(start_logits[bi], axis=-1)
            le = _softmax(end_logits[bi], axis=-1)
        marg = np.zeros(k)
        for ki in range(k):
            for si in range(sp.shape[1]):
                if sp[ki, si] >= 0:
                    marg[ki] += ls[ki, sp[ki, si]] * le[ki, ep[ki, si]]

        if qcfg.separate:
            span = -np.log(marg[marg > 0].sum()) if (marg > 0).any() else 0.0
            total = span + early
            if qcfg.add_select:
                sel = _softmax(np.asarray(out["select_logits"][bi], np.float64))
                tgt = np.asarray(batch["para_targets"][bi]) > 0
                total += -np.log(sel[tgt].sum()) if tgt.any() else 0.0
        else:
            if qcfg.add_select:
                rank_k = _softmax(np.asarray(out["select_logits"][bi], np.float64))
            else:
                rank_k = _softmax(rank_logits[bi])[:k]
            joint = (marg * rank_k)[marg > 0].sum()
            total = (-np.log(joint) if (marg > 0).any() else 0.0) + early
        totals.append(total)
    return float(np.mean(totals))


def _rand_case(rng, B=2, k=3, L=12, S=2, M=8, with_gold=True):
    start_logits = rng.standard_normal((B, k, L)).astype(np.float32)
    end_logits = rng.standard_normal((B, k, L)).astype(np.float32)
    rank_logits = rng.standard_normal((B, M)).astype(np.float32)
    select_logits = rng.standard_normal((B, k)).astype(np.float32)
    sp = rng.integers(-1, L, size=(B, k, S))
    ep = np.where(sp >= 0, np.minimum(sp + rng.integers(0, 3, size=sp.shape), L - 1), -1)
    if not with_gold:
        sp[:] = -1
        ep[:] = -1
    labels = (rng.random((B, M)) < (0.3 if with_gold else 0.0)).astype(np.int32)
    covered = (sp >= 0).any(-1).astype(np.int32)
    out = {
        "start_logits": jnp.asarray(start_logits),
        "end_logits": jnp.asarray(end_logits),
        "rank_logits": jnp.asarray(rank_logits),
        "select_logits": jnp.asarray(select_logits),
    }
    batch = {
        "start_positions": jnp.asarray(sp),
        "end_positions": jnp.asarray(ep),
        "top5000_labels": jnp.asarray(labels),
        "para_targets": jnp.asarray(covered),
    }
    return out, batch


@pytest.mark.parametrize("shared_norm", [False, True])
@pytest.mark.parametrize("separate", [False, True])
@pytest.mark.parametrize("add_select", [False, True])
@pytest.mark.parametrize("drop_early", [False, True])
def test_loss_zoo_matches_oracle(shared_norm, separate, add_select, drop_early):
    qcfg = QAConfig(
        shared_norm=shared_norm, separate=separate,
        add_select=add_select, drop_early=drop_early,
    )
    rng = np.random.default_rng(hash((shared_norm, separate, add_select, drop_early)) % 2**31)
    out, batch = _rand_case(rng)
    got = float(qa_loss(out, batch, qcfg)["loss"])
    want = oracle_loss(out, batch, qcfg)
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.parametrize("separate", [False, True])
def test_loss_no_gold_guard(separate):
    """No gold paragraph and no spans anywhere: loss must be exactly 0
    (guard semantics), never NaN/inf."""
    qcfg = QAConfig(separate=separate)
    rng = np.random.default_rng(0)
    out, batch = _rand_case(rng, with_gold=False)
    comp = qa_loss(out, batch, qcfg)
    assert float(comp["loss"]) == 0.0


def test_loss_gradients_finite_through_guards():
    """Gradient through a mixed batch (one question with gold, one without)
    stays finite — the -inf maskings must not poison the backward pass."""
    qcfg = QAConfig()
    rng = np.random.default_rng(1)
    out, batch = _rand_case(rng, B=2)
    batch = dict(batch)
    sp = np.asarray(batch["start_positions"]).copy()
    sp[1] = -1
    batch["start_positions"] = jnp.asarray(sp)
    ep = np.asarray(batch["end_positions"]).copy()
    ep[1] = -1
    batch["end_positions"] = jnp.asarray(ep)

    def f(start_logits):
        o = dict(out)
        o["start_logits"] = start_logits
        return qa_loss(o, batch, qcfg)["loss"]

    g = jax.grad(f)(out["start_logits"])
    assert np.isfinite(np.asarray(g)).all()


def test_qa_forward_shapes_and_masking():
    cfg = BertConfig.tiny(dtype=jnp.float32, hidden_dropout=0.0, attention_dropout=0.0)
    qcfg = QAConfig(add_select=True)
    params = init_qa_params(jax.random.PRNGKey(0), cfg, qcfg, embed_dim=8)
    B, k, L, Tq, M = 2, 3, 16, 6, 10
    rng = np.random.default_rng(2)
    ids = rng.integers(1, cfg.vocab_size, size=(B, k, L)).astype(np.int32)
    para_mask = np.zeros((B, k, L), np.int32)
    para_mask[:, :, 7:-1] = 1
    batch = {
        "input_ids": jnp.asarray(ids),
        "input_mask": jnp.ones((B, k, L), jnp.int32),
        "segment_ids": jnp.asarray((np.arange(L) >= 7).astype(np.int32) * np.ones((B, k, L), np.int32)),
        "paragraph_mask": jnp.asarray(para_mask),
        "input_ids_q": jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, Tq)).astype(np.int32)),
        "input_mask_q": jnp.ones((B, Tq), jnp.int32),
        "para_embed": jnp.asarray(rng.standard_normal((B, M, 8)).astype(np.float32)),
    }
    out = qa_forward(params, cfg, qcfg, batch)
    assert out["start_logits"].shape == (B, k, L)
    assert out["rank_logits"].shape == (B, M)
    assert out["select_logits"].shape == (B, k)
    s = np.asarray(out["start_logits"])
    assert (s[:, :, :7] <= -1e9).all(), "question positions must be masked"
    assert (s[:, :, 7:-1] > -1e9).all()


def test_decode_spans_band_constraint():
    B, k, L = 1, 2, 10
    start = np.full((B, k, L), -5.0, np.float32)
    end = np.full((B, k, L), -5.0, np.float32)
    # best span start=2 end=4
    start[0, 0, 2] = 5.0
    end[0, 0, 4] = 5.0
    # a longer-than-band pairing: start 1, end 9 would win but is banned
    start[0, 1, 1] = 10.0
    end[0, 1, 9] = 10.0
    end[0, 1, 3] = 1.0
    s, e, score = decode_spans(jnp.asarray(start), jnp.asarray(end), max_answer_len=5)
    assert (int(s[0, 0]), int(e[0, 0])) == (2, 4)
    assert int(s[0, 1]) == 1 and int(e[0, 1]) <= 6  # end forced inside band
    assert float(score[0, 0]) == pytest.approx(10.0)


def test_frozen_mask_structure():
    cfg = BertConfig.tiny()
    qcfg = QAConfig()
    params = init_qa_params(jax.random.PRNGKey(0), cfg, qcfg, embed_dim=8)
    m1 = qa_frozen_mask(params, freeze_c_encoder=True)
    assert m1["retriever"]["bert_c"]["pooler"]["kernel"] is True
    assert m1["retriever"]["proj_c"]["kernel"] is True
    assert m1["retriever"]["bert_q"]["pooler"]["kernel"] is False
    assert m1["bert"]["pooler"]["kernel"] is False
    m2 = qa_frozen_mask(params, freeze_retriever=True)
    assert m2["retriever"]["bert_q"]["pooler"]["kernel"] is True
    assert m2["qa_outputs"]["kernel"] is False


def test_para_rows_path_matches_para_embed():
    """qa_forward with para_rows + corpus_emb (device-resident index gather)
    must equal the host-materialized para_embed path bit for bit."""
    cfg = BertConfig.tiny(dtype=jnp.float32)
    qcfg = QAConfig(shared_norm=True)
    params = init_qa_params(jax.random.PRNGKey(0), cfg, qcfg, embed_dim=16)

    rng = np.random.default_rng(11)
    B, k, L, Tq, M, N = 2, 2, 16, 6, 8, 40
    ids = rng.integers(1, cfg.vocab_size, (B, k, L)).astype(np.int32)
    segs = np.broadcast_to((np.arange(L) >= Tq).astype(np.int32), ids.shape).copy()
    corpus = rng.standard_normal((N, 16)).astype(np.float32)
    rows = rng.integers(0, N, (B, M)).astype(np.int32)
    base = {
        "input_ids": jnp.asarray(ids),
        "input_mask": jnp.ones_like(jnp.asarray(ids)),
        "segment_ids": jnp.asarray(segs),
        "paragraph_mask": jnp.asarray(segs),
        "input_ids_q": jnp.asarray(rng.integers(1, cfg.vocab_size, (B, Tq)).astype(np.int32)),
        "input_mask_q": jnp.ones((B, Tq), jnp.int32),
    }
    out_embed = qa_forward(
        params, cfg, qcfg, {**base, "para_embed": jnp.asarray(corpus[rows])}
    )
    out_rows = qa_forward(
        params, cfg, qcfg,
        {**base, "para_rows": jnp.asarray(rows), "corpus_emb": jnp.asarray(corpus)},
    )
    for key in out_embed:
        np.testing.assert_array_equal(
            np.asarray(out_embed[key]), np.asarray(out_rows[key]), err_msg=key
        )

    # -1 padding slots (under-filled retrieval, qa/sampler._retrieve) must
    # gather row 0 like the host path's np.maximum(rows, 0) — NOT wrap to
    # the last corpus row (default jnp.take semantics)
    rows_pad = rows.copy()
    rows_pad[:, -3:] = -1
    out_pad = qa_forward(
        params, cfg, qcfg,
        {**base, "para_rows": jnp.asarray(rows_pad), "corpus_emb": jnp.asarray(corpus)},
    )
    rows_clip = np.maximum(rows_pad, 0)
    out_clip = qa_forward(
        params, cfg, qcfg, {**base, "para_embed": jnp.asarray(corpus[rows_clip])}
    )
    for key in out_pad:
        np.testing.assert_array_equal(
            np.asarray(out_pad[key]), np.asarray(out_clip[key]), err_msg=key
        )
