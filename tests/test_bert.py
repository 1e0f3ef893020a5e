"""BERT encoder tests: numerical parity with HuggingFace torch BertModel via
the checkpoint converter, plus masking/determinism properties."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from proqa_tpu.models.bert import BertConfig, bert_encoder, init_bert_params, param_count
from proqa_tpu.models.retriever import init_retriever_params, retriever_forward


@pytest.fixture(scope="module")
def cfg():
    return BertConfig.tiny(dtype=jnp.float32, hidden_dropout=0.0, attention_dropout=0.0)


@pytest.fixture(scope="module")
def params(cfg):
    return init_bert_params(jax.random.PRNGKey(0), cfg)


def _batch(cfg, rng, b=3, t=10):
    ids = rng.integers(1, cfg.vocab_size, size=(b, t))
    lens = rng.integers(3, t + 1, size=(b,))
    mask = (np.arange(t)[None, :] < lens[:, None]).astype(np.int32)
    ids = ids * mask  # pad with 0
    return jnp.asarray(ids), jnp.asarray(mask)


def test_shapes(cfg, params):
    ids, mask = _batch(cfg, np.random.default_rng(0))
    seq, pooled = bert_encoder(params, cfg, ids, mask)
    assert seq.shape == (3, 10, cfg.hidden_size)
    assert pooled.shape == (3, cfg.hidden_size)
    assert np.isfinite(np.asarray(seq)).all()


def test_padding_invariance(cfg, params):
    """Extending padding must not change unmasked outputs (static shapes rely
    on this)."""
    rng = np.random.default_rng(1)
    ids, mask = _batch(cfg, rng, b=2, t=8)
    seq1, pooled1 = bert_encoder(params, cfg, ids, mask)
    ids2 = jnp.pad(ids, ((0, 0), (0, 4)))
    mask2 = jnp.pad(mask, ((0, 0), (0, 4)))
    seq2, pooled2 = bert_encoder(params, cfg, ids2, mask2)
    np.testing.assert_allclose(np.asarray(pooled1), np.asarray(pooled2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(seq1), np.asarray(seq2[:, :8]), atol=1e-5)


def test_dropout_determinism(cfg, params):
    ids, mask = _batch(cfg, np.random.default_rng(2))
    drop_cfg = BertConfig.tiny(dtype=jnp.float32)  # default dropout 0.1
    r = jax.random.PRNGKey(7)
    a, _ = bert_encoder(params, drop_cfg, ids, mask, deterministic=False, dropout_rng=r)
    b, _ = bert_encoder(params, drop_cfg, ids, mask, deterministic=False, dropout_rng=r)
    c, _ = bert_encoder(params, drop_cfg, ids, mask, deterministic=False, dropout_rng=jax.random.PRNGKey(8))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_hf_parity(cfg):
    """Random-weight HF BertModel -> converter -> our encoder: outputs match."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.BertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf_model = transformers.BertModel(hf_cfg)
    hf_model.eval()

    from proqa_tpu.models.hf_convert import bert_params_from_state_dict

    ours = bert_params_from_state_dict(hf_model.state_dict(), cfg)

    rng = np.random.default_rng(3)
    ids, mask = _batch(cfg, rng, b=2, t=12)
    tt = np.zeros_like(np.asarray(ids))
    tt[:, 6:] = 1
    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(np.asarray(ids)),
            attention_mask=torch.tensor(np.asarray(mask)),
            token_type_ids=torch.tensor(tt),
        )
    seq, pooled = bert_encoder(ours, cfg, ids, mask, token_type_ids=jnp.asarray(tt))

    hf_seq = out.last_hidden_state.numpy()
    hf_pooled = out.pooler_output.numpy()
    # Only unmasked positions are comparable.
    m = np.asarray(mask)[..., None].astype(bool)
    np.testing.assert_allclose(
        np.asarray(seq, dtype=np.float32) * m, hf_seq * m, atol=1e-3, rtol=0
    )
    np.testing.assert_allclose(np.asarray(pooled, np.float32), hf_pooled, atol=2e-3, rtol=0)


def test_retriever_forward(cfg):
    params = init_retriever_params(jax.random.PRNGKey(1), cfg, embed_dim=16)
    rng = np.random.default_rng(4)
    ids_q, mask_q = _batch(cfg, rng, b=4, t=6)
    ids_c, mask_c = _batch(cfg, rng, b=4, t=12)
    out = retriever_forward(
        params, cfg,
        {"input_ids_q": ids_q, "input_mask_q": mask_q,
         "input_ids_c": ids_c, "input_mask_c": mask_c},
    )
    assert out["q"].shape == (4, 16)
    assert out["c"].shape == (4, 16)
    assert out["q"].dtype == jnp.float32


def test_param_count_scales(cfg):
    p = init_bert_params(jax.random.PRNGKey(0), cfg)
    n = param_count(p)
    # embeddings + 2 layers + pooler for the tiny config
    assert n > cfg.vocab_size * cfg.hidden_size


def test_remat_matches_no_remat():
    """jax.checkpoint over the layer scan must not change values or grads."""
    base = BertConfig.tiny(dtype=jnp.float32, hidden_dropout=0.0, attention_dropout=0.0)
    remat = BertConfig.tiny(dtype=jnp.float32, hidden_dropout=0.0,
                            attention_dropout=0.0, remat=True)
    params = init_bert_params(jax.random.PRNGKey(5), base)
    ids, mask = _batch(base, np.random.default_rng(6), b=2, t=8)

    def loss(p, cfg):
        seq, pooled = bert_encoder(p, cfg, ids, mask)
        return jnp.sum(pooled ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(p, base))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(p, remat))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        g1, g2,
    )


def test_remat_policy_matches_default(cfg, params):
    """remat_policy (jax.checkpoint policy name) must not change outputs or
    grads — only what gets saved vs recomputed. (The axon remote compiler
    currently rejects dots policies on TPU — tools/remat_policy_ab.py — but
    the feature is validated here on CPU and usable on other toolchains.)"""
    import dataclasses

    ids, mask = _batch(cfg, np.random.default_rng(5))
    base = dataclasses.replace(cfg, remat=True)
    pol = dataclasses.replace(cfg, remat=True, remat_policy="dots_saveable")

    def loss(c):
        return lambda p: jnp.sum(bert_encoder(p, c, ids, mask)[1] ** 2)

    np.testing.assert_allclose(
        float(loss(base)(params)), float(loss(pol)(params)), rtol=1e-6
    )
    g1 = jax.grad(loss(base))(params)
    g2 = jax.grad(loss(pol))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_remat_scope_mlp_matches_no_remat():
    """remat_scope="mlp" (checkpoint only the MLP block — the manual
    stand-in for the axon-rejected save-dots policies) must not change
    values or grads."""
    base = BertConfig.tiny(dtype=jnp.float32, hidden_dropout=0.0, attention_dropout=0.0)
    remat = BertConfig.tiny(dtype=jnp.float32, hidden_dropout=0.0,
                            attention_dropout=0.0, remat=True, remat_scope="mlp")
    params = init_bert_params(jax.random.PRNGKey(5), base)
    ids, mask = _batch(base, np.random.default_rng(6), b=2, t=8)

    def loss(p, cfg):
        seq, pooled = bert_encoder(p, cfg, ids, mask)
        return jnp.sum(pooled ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(p, base))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(p, remat))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        g1, g2,
    )
