"""The north-star loop in miniature: contrastive pretraining must improve
corpus-level retrieval recall (SURVEY.md §7 minimum slice, asserted
quantitatively). Uses a learnable synthetic world where each question shares
a key token with exactly one paragraph."""
import json
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from proqa_tpu.data.datasets import PairDataset, grouped_shuffle_order
from proqa_tpu.data.docdb import DocDB
from proqa_tpu.index import DenseIndex, IdMap, build_index, recall_at_k
from proqa_tpu.models.bert import BertConfig
from proqa_tpu.parallel import make_mesh
from proqa_tpu.train.retriever_trainer import RetrieverTrainer, RetrieverTrainerConfig

N_TOPICS = 40
VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + [f"w{i}" for i in range(80)] + ["q"]


class Tok:
    """Vocab-file-free tokenizer over the synthetic vocabulary."""

    def __init__(self):
        from collections import OrderedDict

        from proqa_tpu.text.wordpiece import BertTokenizer

        self._t = BertTokenizer(OrderedDict((w, i) for i, w in enumerate(VOCAB)))

    def __getattr__(self, name):
        return getattr(self._t, name)


def _world(tmp_path):
    rng = np.random.default_rng(0)
    paras = []
    for t in range(N_TOPICS):
        # topic token w<t> plus noise tokens from the upper half of the vocab
        words = [f"w{t}"] + [f"w{40 + rng.integers(0, 40)}" for _ in range(24)]
        rng.shuffle(words)
        paras.append((f"p{t}", " ".join(words)))
    db = DocDB.create(str(tmp_path / "docs.db"), paras)
    with open(tmp_path / "corpus.jsonl", "w") as f:
        for pid, text in paras:
            f.write(json.dumps({"text": text, "id": pid}) + "\n")

    with open(tmp_path / "pairs.jsonl", "w") as f:
        for t in range(N_TOPICS):
            for v in range(3):
                f.write(json.dumps({
                    "Question": f"q w{t} q",
                    "Paragraph": dict(paras)[f"p{t}"],
                    "Answer": f"w{t}",
                }) + "\n")

    qa = [{"question": f"q w{t} q", "answer": [f"w{t}"]} for t in range(N_TOPICS)]
    return db, paras, qa


def _recall(trainer, tok, tmp_path, qa, db, cfg):
    index = build_index(
        trainer.state.params, cfg, str(tmp_path / "corpus.jsonl"),
        tokenizer=tok, max_length=32, batch_size=16, dtype=jnp.float32,
    )
    from proqa_tpu.data.collate import pad_to
    from proqa_tpu.models.retriever import encode_query

    q_ids = pad_to([tok.encode(x["question"], max_length=8) for x in qa], 8)
    q_emb = np.asarray(encode_query(
        trainer.state.params, cfg, jnp.asarray(q_ids),
        jnp.asarray((q_ids != 0).astype(np.int32)),
    ))
    _, _, ids = index.search_ids(q_emb, 5)
    return recall_at_k(qa, ids, db, ks=(1, 5))


def test_pretraining_improves_recall(tmp_path, eight_devices):
    db, paras, qa = _world(tmp_path)
    tok = Tok()
    cfg = BertConfig.tiny(
        vocab_size=len(VOCAB), dtype=jnp.float32, initializer_range=0.1,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    trainer = RetrieverTrainer(
        cfg,
        RetrieverTrainerConfig(learning_rate=3e-3, output_dir=str(tmp_path / "run"),
                               eval_period=10_000, save_checkpoints_steps=10_000, seed=0),
        mesh=make_mesh(8),
    )

    before = _recall(trainer, tok, tmp_path, qa, db, cfg)

    ds = PairDataset(tok, str(tmp_path / "pairs.jsonl"), max_query_length=8, max_length=40)
    rng = random.Random(0)
    for epoch in range(12):
        order = grouped_shuffle_order(ds, rng)
        for batch in ds.batches(order, batch_size=24, drop_last=True):
            batch.pop("__rows__", None)
            trainer.rng, r = jax.random.split(trainer.rng)
            trainer.state, m = trainer._train_step(
                trainer.state, trainer._device_batch(batch), r
            )

    after = _recall(trainer, tok, tmp_path, qa, db, cfg)
    # a trained retriever must beat the random-init one decisively
    assert after[5] >= 0.9, (before, after)
    assert after[1] > before[1]
    assert after[5] > before[5]
