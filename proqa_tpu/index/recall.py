"""Retrieval quality evaluation: answer recall@k over the dense index.

Equivalent of /root/reference/retrieval/eval_retrieval.py:78-123 — the
BASELINE.md headline workload: exact MIPS top-80 for every eval question,
then uncased token-subsequence answer matching in the retrieved paragraph
texts, reported as Recall@{5,10,20,50,80}.
"""
from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from proqa_tpu.data.docdb import DocDB
from proqa_tpu.index.dense import DenseIndex
from proqa_tpu.text.matching import para_has_answer
from proqa_tpu.text.simple import SimpleTokenizer


def load_qa_pairs(path: str) -> list[dict]:
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def recall_at_k(
    qa_pairs: list[dict],
    retrieved_ids: list[list[str]],
    db: DocDB,
    ks=(5, 10, 20, 50, 80),
    num_workers: int = 0,
) -> dict[int, float]:
    """qa_pairs: [{"question", "answer": [...]}...]; retrieved_ids: top-k doc
    ids per question (k >= max(ks))."""
    tok = SimpleTokenizer()
    kmax = max(ks)

    def covered_flags(args):
        qa, doc_ids = args
        flags = []
        for did in doc_ids[:kmax]:
            text = db.get_doc_text(did)
            flags.append(
                bool(text) and para_has_answer(text, qa["answer"], tok)[0]
            )
        return flags

    pairs = list(zip(qa_pairs, retrieved_ids))
    if num_workers > 0:
        with ThreadPoolExecutor(num_workers) as pool:
            all_flags = list(pool.map(covered_flags, pairs))
    else:
        all_flags = [covered_flags(p) for p in pairs]

    out = {}
    for k in ks:
        out[k] = float(np.mean([any(f[:k]) for f in all_flags]))
    return out


def evaluate_retrieval(
    qa_path: str,
    index: DenseIndex,
    query_embeds: np.ndarray,
    db: DocDB,
    *,
    topk: int = 80,
    ks=(5, 10, 20, 50, 80),
    num_workers: int = 0,
) -> dict[int, float]:
    """Search + recall scoring. query_embeds: [Q, D] (pre-encoded queries,
    row-aligned with qa_path)."""
    qa_pairs = load_qa_pairs(qa_path)
    assert len(qa_pairs) == query_embeds.shape[0], (
        f"{len(qa_pairs)} QA pairs in {qa_path} but {query_embeds.shape[0]} "
        "query embeddings — rows must align"
    )
    # always score the full retrieval depth too (reference get_score reports
    # 'Top {topk} Recall' unconditionally) — otherwise --topk 100 pays the
    # k=100 search but never reports recall@100
    ks = tuple(k for k in ks if k < topk) + (topk,)
    _, _, ids = index.search_ids(query_embeds, topk)
    return recall_at_k(qa_pairs, ids, db, ks=ks, num_workers=num_workers)
