"""Decompose the QA sampler's per-step HOST work (no device involved).

The qa_wall bench world (6000 paras x ~220 words, B=4 questions x k=5
paras/step) spends ~57 ms/step on the host beyond the ~104 ms device step.
This times each stage of _build_train_example's chain in isolation:

  sqlite get_doc_text -> normalize -> match_answer_span (SimpleTokenizer)
  -> prepare_context (C++) -> find_answer_spans -> tensorize tail -> collate

Run: python tools/qa_host_profile.py   (forces CPU jax; pure host timing)
"""
from __future__ import annotations

import json
import os
import random as pyrandom
import tempfile
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from proqa_tpu.data.docdb import DocDB
    from proqa_tpu.text.matching import match_answer_span, normalize
    from proqa_tpu.text.simple import SimpleTokenizer
    from proqa_tpu.text.squad import char_spans_of, find_answer_spans, prepare_context
    from proqa_tpu.text.wordpiece import BertTokenizer

    root = tempfile.mkdtemp(prefix="qa_host_")
    words = [f"tok{i}" for i in range(2000)]
    prng = pyrandom.Random(0)
    paras = []
    for i in range(6000):
        ws = [prng.choice(words) for _ in range(220)]
        if i % 2 == 0:
            j = prng.randrange(len(ws) - 2)
            ws[j : j + 2] = ["tok1", "tok2"]
        paras.append((f"p{i}", " ".join(ws)))
    DocDB.create(os.path.join(root, "docs.db"), paras).close()
    db = DocDB(os.path.join(root, "docs.db"))
    vocab_path = os.path.join(root, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words))
    tok = BertTokenizer.from_vocab_file(vocab_path)
    simple = SimpleTokenizer()
    answers = ["tok1 tok2"]

    # one train step touches B*k paras = 20
    PARAS_PER_STEP = 20
    REPS = 10
    pids = [f"p{i}" for i in range(PARAS_PER_STEP * REPS)]

    def timed(fn, items):
        t0 = time.perf_counter()
        out = [fn(x) for x in items]
        dt = (time.perf_counter() - t0) * 1e3
        return out, dt / REPS  # ms per step's worth

    texts, t_db = timed(db.get_doc_text, pids)
    norms, t_norm = timed(normalize, texts)
    matches, t_match = timed(
        lambda p: match_answer_span(p, answers, simple, match="string"), norms
    )
    preps, t_prep = timed(lambda p: prepare_context(p, tok), norms)

    def spans(args):
        p, matched, prep = args
        doc_tokens, c2w, o2t, t2o, pieces = prep
        out = []
        for m in matched:
            out.extend(find_answer_spans(
                m, char_spans_of(p, m), c2w, doc_tokens, pieces, o2t, tok
            ))
        return out

    _, t_spans = timed(spans, list(zip(norms, matches, preps)))

    def convert(prep):
        return tok.convert_tokens_to_ids(prep[4][:480])

    _, t_conv = timed(convert, preps)

    # full end-to-end per-step host chain through the sampler itself
    from proqa_tpu.index.dense import DenseIndex
    from proqa_tpu.index.idmap import IdMap
    from proqa_tpu.qa.sampler import OnlineSampler, OnlineSamplerConfig

    rng = np.random.default_rng(0)
    index = DenseIndex.from_embeddings(
        rng.standard_normal((len(paras), 128)).astype(np.float32),
        id_map=IdMap([p[0] for p in paras]),
    )
    qa_path = os.path.join(root, "qa.jsonl")
    with open(qa_path, "w") as f:
        for _ in range(40):
            f.write(json.dumps({
                "question": " ".join(prng.choice(words) for _ in range(6)),
                "answer": ["tok1 tok2"],
            }) + "\n")
    scfg = OnlineSamplerConfig(
        max_query_length=30, max_length=512, candidates=5000,
        question_batch=4, num_workers=0,
    )
    sampler = OnlineSampler(qa_path, tok, db, index, scfg)
    k = 5
    qs = [q["question"] for q in sampler.qa_data[:4]]
    q_ids, rows, _ = sampler._retrieve(
        qs, lambda ids, mask: rng.standard_normal((ids.shape[0], 128)).astype(np.float32),
        gather_embeds=False,
    )

    def build_group(_):
        built = [
            sampler._build_train_example(qa, qi, rr, None, k)
            for qa, qi, rr in zip(sampler.qa_data[:4], q_ids, rows)
        ]
        built = [b for b in built if b is not None]
        if built:
            sampler._collate_questions(built, with_targets=True, k=k)

    t0 = time.perf_counter()
    for r in range(REPS):
        build_group(r)
    t_full = (time.perf_counter() - t0) / REPS * 1e3

    built = [
        sampler._build_train_example(qa, qi, rr, None, k)
        for qa, qi, rr in zip(sampler.qa_data[:4], q_ids, rows)
    ]
    built = [b for b in built if b is not None]
    t0 = time.perf_counter()
    for _ in range(REPS):
        sampler._collate_questions(built, with_targets=True, k=k)
    t_collate = (time.perf_counter() - t0) / REPS * 1e3

    print(json.dumps({
        "per_step_ms": {
            "db_fetch": round(t_db, 2),
            "normalize": round(t_norm, 2),
            "match_answer_span": round(t_match, 2),
            "prepare_context_cpp": round(t_prep, 2),
            "find_answer_spans": round(t_spans, 2),
            "convert_tokens_to_ids": round(t_conv, 2),
            "collate": round(t_collate, 2),
            "full_build_group": round(t_full, 2),
        },
        "paras_per_step": PARAS_PER_STEP,
    }))


if __name__ == "__main__":
    main()
