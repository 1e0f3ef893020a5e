"""Offline QA data path: MRQA loading, openqa tokenization, grouped batching."""
import json
import random

import numpy as np
import pytest

from proqa_tpu.qa.offline_data import (
    OpenQADataset,
    load_mrqa_dataset,
    tokenize_openqa_file,
    tokenize_openqa_item,
    tokenize_qa_item,
)
from proqa_tpu.text.wordpiece import BertTokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + [f"tok{i}" for i in range(40)] + ["what", "is"]


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    p = tmp_path_factory.mktemp("oqa") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return BertTokenizer.from_vocab_file(str(p))


def test_load_mrqa(tmp_path):
    path = tmp_path / "mrqa.jsonl"
    with open(path, "w") as f:
        f.write(json.dumps({"header": True}) + "\n")
        f.write(json.dumps({
            "id": "d1", "context": "tok1 tok2 tok3",
            "qas": [{"qid": "q1", "question": "what is tok1",
                     "answers": ["tok2"],
                     "detected_answers": [{"text": "tok2", "char_spans": [[5, 8]]}]}],
        }) + "\n")
    rows = load_mrqa_dataset(str(path))
    assert len(rows) == 1 and rows[0]["qid"] == "q1"


def test_tokenize_qa_item(tok):
    sample = {
        "qid": "q1", "question": "what is tok1", "context": "tok1 tok2 tok3",
        "matched_answers": [{"text": "tok2", "char_spans": [[5, 8]]}],
        "true_answers": ["tok2"],
    }
    ex = tokenize_qa_item(sample, tok)
    assert ex["doc_subtoks"] == ["tok1", "tok2", "tok3"]
    assert ex["starts"] == [1] and ex["ends"] == [1]


def test_tokenize_openqa_item(tok):
    sample = {
        "question": "what is tok1",
        "answer": ["tok5"],
        "retrieved": [
            {"para": "tok4 tok5 tok6", "matched_answer": "tok5"},
            {"para": "tok7 tok8", "matched_answer": ""},
        ],
    }
    exs = tokenize_openqa_item(sample, tok)
    assert len(exs) == 2
    assert exs[0]["no_answer"] == 0 and exs[0]["starts"] == [1]
    assert exs[1]["no_answer"] == 1 and exs[1]["starts"] == [-1]


def test_openqa_dataset_batches(tok, tmp_path):
    raw = tmp_path / "raw.jsonl"
    with open(raw, "w") as f:
        for qi in range(3):
            f.write(json.dumps({
                "question": f"what is tok{qi}",
                "answer": [f"tok{qi+10}"],
                "retrieved": [
                    {"para": f"tok{qi+10} tok1 tok2", "matched_answer": f"tok{qi+10}"},
                    {"para": "tok20 tok21", "matched_answer": ""},
                    {"para": "tok22 tok23", "matched_answer": ""},
                ],
            }) + "\n")
    tokenized = tmp_path / "tokenized.jsonl"
    n = tokenize_openqa_file(str(raw), tok, str(tokenized))
    assert n == 9

    ds = OpenQADataset(tok, str(tokenized), max_query_length=8, max_length=24, max_spans=4)
    batches = list(ds.train_batches(3, random.Random(0)))
    assert len(batches) == 3
    b = batches[0]["net_input"]
    assert b["input_ids"].shape == (1, 3, 24)
    assert b["start_positions"].shape == (1, 3, 4)
    assert b["para_targets"].sum() >= 1  # the positive is in every batch
    # positive's span points at the answer token
    qi = int(batches[0]["id"][0] is not None)  # just exercise meta
    sp = b["start_positions"][0]
    covered_rows = np.where(b["para_targets"][0] == 1)[0]
    for r in covered_rows:
        s = sp[r][sp[r] >= 0]
        for pos in s:
            tok_id = b["input_ids"][0, r, pos]
            assert tok.ids_to_tokens[int(tok_id)].startswith("tok")

    evals = list(ds.eval_batches(2))
    assert len(evals) == 3
    assert evals[0]["net_input"]["input_ids"].shape == (1, 2, 24)
    assert "start_positions" not in evals[0]["net_input"]
