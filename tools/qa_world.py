"""Shared synthetic QA world for the wall-clock benches and A/B tools.

ONE definition so bench.py, qa_wall_ab.py, qa_wall_decomp.py and
qa_group_ab.py measure the exact same workload (6000 paras x ~220 words,
answer 'tok1 tok2' planted in every even paragraph, 48 questions): the
cross-tool numbers in ROADMAP.md are only comparable because the worlds are
identical by construction.
"""
from __future__ import annotations

import json
import os
import random as pyrandom
import tempfile

import numpy as np

N_PARAS = 6000
N_QUESTIONS = 48
PARA_WORDS = 220
VOCAB_WORDS = 2000
EMBED_DIM = 128


def build_qa_world(dtype=None, n_paras: int = N_PARAS,
                   n_questions: int = N_QUESTIONS, gold_every: int = 2):
    """Returns dict(root, db, tok, index, qa_path, vocab_path, n_paras).
    `dtype` is the index dtype (default bfloat16). The defaults are the
    frozen bench world (don't change them — ROADMAP numbers compare across
    tools); `gold_every`/`n_paras` overrides exist for probes that need
    sparse gold (e.g. the IVF retention A/B, tools/qa_ivf_ab.py)."""
    import jax.numpy as jnp

    from proqa_tpu.data.docdb import DocDB
    from proqa_tpu.index.dense import DenseIndex
    from proqa_tpu.index.idmap import IdMap
    from proqa_tpu.text.wordpiece import BertTokenizer

    root = tempfile.mkdtemp(prefix="bench_qa_")
    words = [f"tok{i}" for i in range(VOCAB_WORDS)]
    prng = pyrandom.Random(0)
    paras = []
    for i in range(n_paras):
        ws = [prng.choice(words) for _ in range(PARA_WORDS)]
        if i % gold_every == 0:
            j = prng.randrange(len(ws) - 2)
            ws[j : j + 2] = ["tok1", "tok2"]
        paras.append((f"p{i}", " ".join(ws)))
    DocDB.create(os.path.join(root, "docs.db"), paras).close()
    qa_path = os.path.join(root, "qa.jsonl")
    with open(qa_path, "w") as f:
        for _ in range(n_questions):
            f.write(json.dumps({
                "question": " ".join(prng.choice(words) for _ in range(6)),
                "answer": ["tok1 tok2"],
            }) + "\n")
    vocab_path = os.path.join(root, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words))

    tok = BertTokenizer.from_vocab_file(vocab_path)
    db = DocDB(os.path.join(root, "docs.db"))
    rng = np.random.default_rng(0)
    index = DenseIndex.from_embeddings(
        rng.standard_normal((len(paras), EMBED_DIM)).astype(np.float32),
        id_map=IdMap([p[0] for p in paras]),
        dtype=dtype if dtype is not None else jnp.bfloat16,
    )
    return dict(
        root=root, db=db, tok=tok, index=index,
        qa_path=qa_path, vocab_path=vocab_path, n_paras=len(paras),
    )
