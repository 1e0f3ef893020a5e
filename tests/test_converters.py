"""TREC / MSMARCO converter tests (reference trec_process / msmarco_process
equivalents)."""
import json

import numpy as np
import jax.numpy as jnp

from proqa_tpu.data.converters import (
    msmarco_extract_qa,
    retrieve_topk_labels,
    trec_extract_labels,
    trec_prepare_corpus,
)
from proqa_tpu.index import DenseIndex, IdMap


def test_trec_prepare_corpus(tmp_path):
    (tmp_path / "collection.tsv").write_text("0\tfirst passage\n1\tsecond\tstill second\n")
    out = str(tmp_path / "corpus.jsonl")
    n = trec_prepare_corpus(str(tmp_path / "collection.tsv"), out)
    rows = [json.loads(l) for l in open(out)]
    assert n == 2
    assert rows[0] == {"text": "first passage", "id": 0}
    assert rows[1]["text"] == "second\tstill second"  # only first tab splits


def test_trec_extract_labels(tmp_path):
    (tmp_path / "queries.tsv").write_text("7\twhat is x?\n9\tname y\n")
    (tmp_path / "qrels.tsv").write_text("7\t0\t101\t1\n7\t0\t102\t1\n9\t0\t103\t1\n")
    out = str(tmp_path / "labels.jsonl")
    n = trec_extract_labels(str(tmp_path / "qrels.tsv"), str(tmp_path / "queries.tsv"), out)
    rows = {r["qid"]: r for r in map(json.loads, open(out))}
    assert n == 2
    assert rows[7]["question"] == "what is x"  # trailing '?' stripped
    assert rows[7]["labels"] == [101, 102]


def test_trec_extract_labels_skips_unknown_qids(tmp_path):
    """qrels routinely judge qids outside a subset/split queries file —
    those rows must be skipped, not abort the conversion with a KeyError."""
    (tmp_path / "queries.tsv").write_text("7\twhat is x?\n")
    (tmp_path / "qrels.tsv").write_text("7\t0\t101\t1\n42\t0\t999\t1\n")
    out = str(tmp_path / "labels.jsonl")
    n = trec_extract_labels(str(tmp_path / "qrels.tsv"), str(tmp_path / "queries.tsv"), out)
    rows = [json.loads(l) for l in open(out)]
    assert n == 1 and len(rows) == 1 and rows[0]["qid"] == 7


def test_retrieve_topk_labels(tmp_path):
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((64, 8)).astype(np.float32)
    index = DenseIndex.from_embeddings(
        emb, IdMap.from_doc_ids([str(100 + i) for i in range(64)]),
        dtype=jnp.float32, pad_multiple=8,
    )
    queries = emb[:4] * 3  # retrieve-yourself queries
    qin = str(tmp_path / "queries.jsonl")
    with open(qin, "w") as f:
        for i in range(4):
            f.write(json.dumps({"question": f"q{i}", "labels": [100 + i], "qid": i}) + "\n")
    out = str(tmp_path / "topk.jsonl")
    recall = retrieve_topk_labels(index, queries, qin, out, topk=8)
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 4
    assert all(len(r["para_embed_idx"]) == 8 for r in rows)
    assert 0.0 <= recall <= 1.0
    # a row labeled positive must correspond to its gold passage id
    for r in rows:
        for idx, lab in zip(r["para_embed_idx"], r["para_labels"]):
            if lab:
                assert 100 + idx in r["labels"]


def test_msmarco_extract_qa(tmp_path):
    data = {
        "answers": {"0": ["an answer"], "1": ["No Answer Present."], "2": ["x"]},
        "query": {"0": "q zero", "1": "q one", "2": "q two"},
        "passages": {
            "0": [{"is_selected": 1, "passage_text": "p a"},
                  {"is_selected": 0, "passage_text": "p b"}],
            "1": [{"is_selected": 1, "passage_text": "p c"}],
            "2": [{"is_selected": 0, "passage_text": "p d"}],
        },
    }
    src = str(tmp_path / "marco.json")
    json.dump(data, open(src, "w"))
    out = str(tmp_path / "qa.jsonl")
    n = msmarco_extract_qa(src, out)
    rows = [json.loads(l) for l in open(out)]
    assert n == 1  # unanswerable and no-selected-passage rows dropped
    assert rows[0] == {"q": "q zero", "answer": ["an answer"], "para": "p a"}
