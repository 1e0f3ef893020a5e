"""Cross-implementation equivalence harness (the strongest recall-parity
evidence available without the released checkpoint/corpus, see BASELINE.md).

A random-weight torch bi-encoder built EXACTLY like the reference
`BertForRetriever` (/root/reference/retrieval/retriever.py:8-43: two separate
HF BertModel towers + Linear(hidden, 128) over the CLS pooled output) is run
through the reference's own pipeline math:

  encode  (/root/reference/retrieval/get_embed.py:142-172, batch no_grad
           get_embed -> np.save)
  search  (/root/reference/retrieval/eval_retrieval.py:102-104,
           faiss.IndexFlatIP replaced by numpy dot + argsort — identical
           exact-MIPS semantics)
  recall  (/root/reference/retrieval/eval_retrieval.py:27-65, top-k answer
           containment flags)

and compared against the full proqa bridge on the same artifacts:

  proqa convert-hf -> build-index -> encode-queries -> eval-retrieval  (--f32)

Asserts: (1) corpus + query embeddings match the torch ones, (2) the exact
top-k id lists are identical, (3) every recall@k value is identical. This
proves the whole chain — converter, wordpiece tokenizer, BERT encoder, index
artifacts, MIPS search, recall scoring — end to end.
"""
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from proqa_tpu.cli.main import main

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
    f"tok{i}" for i in range(60)
] + ["what", "is", "about"]
EMBED_DIM = 128  # reference hardcodes 128 (retriever.py:19)
TOPK = 20


class TorchRetriever(torch.nn.Module):
    """Reference-shaped bi-encoder (retriever.py:8-43), random weights."""

    def __init__(self, hf_cfg):
        super().__init__()
        self.bert_q = transformers.BertModel(hf_cfg)
        self.bert_c = transformers.BertModel(hf_cfg)
        self.proj_q = torch.nn.Linear(hf_cfg.hidden_size, EMBED_DIM)
        self.proj_c = torch.nn.Linear(hf_cfg.hidden_size, EMBED_DIM)

    @torch.no_grad()
    def get_embed(self, ids, mask, is_query):  # retriever.py:33-43
        bert, proj = (
            (self.bert_q, self.proj_q) if is_query else (self.bert_c, self.proj_c)
        )
        pooled = bert(ids, attention_mask=mask).pooler_output
        return proj(pooled)


def _torch_encode(model, hf_tok, texts, max_length, is_query, batch_size=8):
    """Reference get_embed.py:142-172 predict(): batched no_grad encode."""
    out = []
    for start in range(0, len(texts), batch_size):
        chunk = texts[start : start + batch_size]
        ids_list = [
            hf_tok.encode(t, max_length=max_length, truncation=True) for t in chunk
        ]
        width = max(len(x) for x in ids_list)
        ids = np.zeros((len(chunk), width), np.int64)
        for r, x in enumerate(ids_list):
            ids[r, : len(x)] = x
        mask = (ids != 0).astype(np.int64)
        emb = model.get_embed(torch.tensor(ids), torch.tensor(mask), is_query)
        out.append(emb.numpy().astype(np.float32))
    return np.concatenate(out, axis=0)


def _reference_recall(answers, retrieved_ids, paras_by_id, ks):
    """Reference eval_retrieval.py:27-65 recall math. The synthetic corpus is
    space-separated alnum tokens, for which SimpleTokenizer().words(uncased)
    is exactly str.split() — so the containment check reduces to a token
    subsequence test on the split words."""
    flags_per_q = []
    for answer, doc_ids in zip(answers, retrieved_ids):
        flags = []
        for did in doc_ids:
            words = paras_by_id[did].lower().split()
            hit = any(a.lower() in words for a in answer)
            flags.append(int(hit))
        flags_per_q.append(flags)
    return {k: float(np.mean([int(any(f[:k])) for f in flags_per_q])) for k in ks}


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity_world")
    (root / "vocab.txt").write_text("\n".join(VOCAB) + "\n")

    paras = [
        (f"p{i}", " ".join(f"tok{(i + j) % 60}" for j in range(20)))
        for i in range(40)
    ]
    from proqa_tpu.data.docdb import DocDB

    DocDB.create(str(root / "docs.db"), paras).close()
    with open(root / "corpus.jsonl", "w") as f:
        for pid, text in paras:
            f.write(json.dumps({"text": text, "id": pid}) + "\n")
    qa = [
        {"question": f"what is about tok{i} tok{i + 1}", "answer": [f"tok{i + 5}"]}
        for i in range(10)
    ]
    with open(root / "qa.jsonl", "w") as f:
        for row in qa:
            f.write(json.dumps(row) + "\n")

    # tiny dims matching proqa's BertConfig.tiny (models/bert.py)
    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = TorchRetriever(hf_cfg).eval()
    torch.save(model.state_dict(), str(root / "torch_retriever.pt"))
    hf_tok = transformers.BertTokenizer(str(root / "vocab.txt"), do_lower_case=True)
    return dict(root=root, model=model, hf_tok=hf_tok, paras=paras, qa=qa)


def _common(root):
    return ["--vocab", str(root / "vocab.txt"), "--tiny", "--f32",
            "--max-seq-length", "64", "--max-query-length", "12"]


def test_reference_pipeline_parity(world, capsys):
    root, model, hf_tok = world["root"], world["model"], world["hf_tok"]
    paras, qa = world["paras"], world["qa"]

    # ---------- reference side: torch encode -> numpy exact MIPS -> recall ----
    xb = _torch_encode(model, hf_tok, [t for _, t in paras], 64, is_query=False)
    xq = _torch_encode(model, hf_tok, [q["question"] for q in qa], 12, is_query=True)
    scores = xq @ xb.T
    I_ref = np.argsort(-scores, kind="stable", axis=1)[:, :TOPK]
    ref_ids = [[paras[i][0] for i in row] for row in I_ref]
    ref_recalls = _reference_recall(
        [q["answer"] for q in qa], ref_ids, dict(paras), ks=(5, 10, 20)
    )

    # ---------- proqa side: convert-hf -> build-index -> encode -> eval ------
    main(["convert-hf", *_common(root),
          "--torch-checkpoint", str(root / "torch_retriever.pt"),
          "--kind", "retriever", "--output", str(root / "converted.msgpack")])
    main(["build-index", *_common(root),
          "--corpus", str(root / "corpus.jsonl"),
          "--init-checkpoint", str(root / "converted.msgpack"),
          "--output-dir", str(root / "index"), "--predict-batch-size", "8"])
    main(["encode-queries", *_common(root),
          "--queries", str(root / "qa.jsonl"),
          "--init-checkpoint", str(root / "converted.msgpack"),
          "--output", str(root / "q.npy"), "--predict-batch-size", "8"])
    capsys.readouterr()
    main(["eval-retrieval", str(root / "qa.jsonl"), str(root / "index"),
          str(root / "q.npy"), str(root / "docs.db"),
          "--topk", str(TOPK), "--f32"])
    out = capsys.readouterr().out.strip().splitlines()
    recalls = json.loads(out[-1])

    # (1) embeddings match the torch reference (f32 encode, HF-parity tol)
    xb_ours = np.load(root / "index" / "embeddings.npy")
    xq_ours = np.load(root / "q.npy")
    np.testing.assert_allclose(xb_ours, xb, atol=5e-3, rtol=0)
    np.testing.assert_allclose(xq_ours, xq, atol=5e-3, rtol=0)

    # (2) identical exact top-k id lists through our scoring
    I_ours = np.argsort(-(xq_ours @ xb_ours.T), kind="stable", axis=1)[:, :TOPK]
    np.testing.assert_array_equal(I_ours, I_ref)

    # (3) identical recall values, reference math vs proqa CLI
    for k in (5, 10, 20):
        assert recalls[f"recall@{k}"] == ref_recalls[k], (
            f"recall@{k}: proqa {recalls[f'recall@{k}']} != reference {ref_recalls[k]}"
        )


def test_spanbert_reader_path(tmp_path):
    """The reference's --use-spanbert option is `BertModel.from_pretrained(
    spanbert_path)` as the reader tower + cased tokenization in the sampler
    (/root/reference/qa/bert_retrieve_qa.py:24-25, online_sampler.py:68-72).
    Exercise our equivalent end to end: a random-weight torch BertModel
    ("SpanBERT stand-in") -> `proqa convert-hf --kind bert` -> loaded as the
    QA reader tower -> numerically identical reader forward (with QA segment
    ids), plus the --cased tokenizer wiring."""
    import jax
    import jax.numpy as jnp

    from proqa_tpu.models.bert import BertConfig, bert_encoder

    cfg = BertConfig.tiny(dtype=jnp.float32)
    hf_cfg = transformers.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(11)
    spanbert = transformers.BertModel(hf_cfg)
    spanbert.eval()
    pt = str(tmp_path / "spanbert.pt")
    torch.save(spanbert.state_dict(), pt)

    # cased vocab: case-distinct wordpieces must survive --cased
    vocab = tmp_path / "vocab_cased.txt"
    vocab.write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "Apple", "apple", "pie"])
    )
    out = str(tmp_path / "spanbert.msgpack")
    main([
        "convert-hf", "--vocab", str(vocab), "--cased", "--tiny",
        "--torch-checkpoint", pt, "--kind", "bert", "--output", out,
    ])

    # load exactly the way finetune-qa --reader-path does (cli/main.py:309-316)
    from proqa_tpu.cli.main import _load_params
    from proqa_tpu.models.bert import init_bert_params

    reader = _load_params(out, init_bert_params(jax.random.PRNGKey(0), cfg))

    # reader forward with QA-style [CLS]q[SEP]p[SEP] segment ids
    rng = np.random.default_rng(4)
    b, t = 2, 16
    ids = rng.integers(1, cfg.vocab_size, (b, t))
    mask = (np.arange(t)[None, :] < np.array([[12], [16]])).astype(np.int32)
    ids = ids * mask
    segs = np.zeros_like(ids)
    segs[:, 6:] = 1
    with torch.no_grad():
        want = spanbert(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(segs),
        ).last_hidden_state.numpy()
    seq, _ = bert_encoder(
        reader, cfg, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(segs)
    )
    m = mask[..., None].astype(bool)
    np.testing.assert_allclose(
        np.asarray(seq, np.float32) * m, want * m, atol=1e-3, rtol=0
    )

    # --cased tokenizer: case is preserved (uncased would fold Apple->apple)
    from proqa_tpu.text.wordpiece import BertTokenizer

    tok_cased = BertTokenizer.from_vocab_file(str(vocab), do_lower_case=False)
    tok_uncased = BertTokenizer.from_vocab_file(str(vocab), do_lower_case=True)
    assert tok_cased.tokenize("Apple pie") == ["Apple", "pie"]
    assert tok_uncased.tokenize("Apple pie") == ["apple", "pie"]
