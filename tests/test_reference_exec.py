"""Parity tests that EXECUTE the reference's own code as the oracle
(VERDICT round-2 task #3): the reference's `para_has_answer`/`get_score`
(/root/reference/retrieval/eval_retrieval.py:27-65), DrQA `SimpleTokenizer`
(/root/reference/qa/basic_tokenizer.py:232-271), the MRQA official metrics
(/root/reference/qa/official_eval.py:20-72), `get_final_text`
(/root/reference/qa/eval_utils.py:15-82), and the full `BertRetrieveQA`
forward + loss zoo (/root/reference/qa/bert_retrieve_qa.py:58-171) run
directly (faiss stubbed, numpy standing in for the one FAISS call) against
the proqa_tpu equivalents."""
import random
import string

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from _reference_exec import load_reference_module

# ---------------------------------------------------------------------------
# text-stack oracles
# ---------------------------------------------------------------------------

TRICKY_TEXTS = [
    "The quick brown fox, jumped -- over!",
    "Łódź is a city; naïve café-au-lait costs $3.50 (really).",
    "He said ``hello'' and left... didn't he?",
    "ΑΛΦΑ βήτα 123,456 u.s.a. Dr. Smith's 3:45pm",
    "hyphen-ated multi--dash “smart quotes” and 'single'",
    "  leading space\nand\tmixed   whitespace ",
    "", "   ", "a", "ε",
]


def _rand_texts(n=60, seed=3):
    rng = random.Random(seed)
    pool = string.ascii_letters + string.digits + " .,!?-'\"();:" + "àéüπФ中"
    return ["".join(rng.choice(pool) for _ in range(rng.randint(0, 80)))
            for _ in range(n)]


def test_simple_tokenizer_matches_reference_executed():
    ref_bt = load_reference_module("qa", "basic_tokenizer")
    from proqa_tpu.text.simple import SimpleTokenizer

    ref_tok = ref_bt.SimpleTokenizer()
    ours = SimpleTokenizer()
    for text in TRICKY_TEXTS + _rand_texts():
        rt, ot = ref_tok.tokenize(text), ours.tokenize(text)
        assert ot.words() == rt.words(), repr(text)
        assert ot.words(uncased=True) == rt.words(uncased=True), repr(text)
        assert ot.offsets() == rt.offsets(), repr(text)
        assert ot.untokenize() == rt.untokenize(), repr(text)
        if len(rt) >= 2:
            assert ot.slice(1, len(rt)).untokenize() == \
                rt.slice(1, len(rt)).untokenize(), repr(text)


def test_para_has_answer_matches_reference_executed():
    ref_ev = load_reference_module("retrieval", "eval_retrieval")
    ref_bt = load_reference_module("qa", "basic_tokenizer")
    from proqa_tpu.text.matching import para_has_answer
    from proqa_tpu.text.simple import SimpleTokenizer

    ref_ev.PROCESS_TOK = ref_bt.SimpleTokenizer()
    ours_tok = SimpleTokenizer()
    cases = [
        (["fox"], "The quick brown Fox jumped."),
        (["quick brown"], "the Quick  Brown fox"),
        (["quick fox"], "the quick brown fox"),          # not contiguous
        (["3.50"], "costs $3.50 today"),
        (["didn't"], "he didn't go"),
        (["naïve café"], "so naïve café au lait"),
        (["Łódź"], "Łódź is a city"),
        (["U.S."], "in the U.S. today"),
        (["nothing at all"], ""),
        ([""], "empty answer string"),
        (["fox", "missing"], "the fox ran"),             # multi-answer any-hit
    ]
    rng = random.Random(9)
    words = ["fox", "café", "didn", "t", "3", "50", "u", "s", "the", "-"]
    for _ in range(80):
        para = " ".join(rng.choice(words) for _ in range(rng.randint(0, 12)))
        ans = [" ".join(rng.choice(words) for _ in range(rng.randint(1, 3)))]
        cases.append((ans, para))
    for answers, para in cases:
        want = ref_ev.para_has_answer(answers, para)
        got, _ = para_has_answer(para, answers, ours_tok)
        assert got == want, (answers, para)
    # matched-string projection parity
    want_hit, want_m = ref_ev.para_has_answer(["quick brown"], "a Quick  Brown fox", True)
    got_hit, got_m = para_has_answer("a Quick  Brown fox", ["quick brown"], ours_tok)
    assert (got_hit, got_m) == (want_hit, want_m)


def test_recall_matches_reference_get_score_executed(tmp_path):
    """Full recall computation: reference get_score (with the reference's own
    DocDB + SimpleTokenizer) vs proqa recall_at_k on the same retrieval."""
    ref_ev = load_reference_module("retrieval", "eval_retrieval")
    ref_bt = load_reference_module("qa", "basic_tokenizer")
    ref_utils = load_reference_module("retrieval", "utils")
    from proqa_tpu.data.docdb import DocDB
    from proqa_tpu.index.recall import recall_at_k

    rng = random.Random(1)
    vocab = ["alpha", "beta", "gamma", "delta", "eps-ilon", "3.5", "zeta"]
    paras = [
        (f"p{i}", " ".join(rng.choice(vocab) for _ in range(10)))
        for i in range(30)
    ]
    db_path = str(tmp_path / "docs.db")
    DocDB.create(db_path, paras).close()

    qa_pairs = [
        {"question": f"q{i}", "answer": [rng.choice(vocab), rng.choice(vocab)]}
        for i in range(12)
    ]
    retrieved = [
        [f"p{j}" for j in rng.sample(range(30), 20)] for _ in qa_pairs
    ]

    ref_ev.PROCESS_TOK = ref_bt.SimpleTokenizer()
    ref_ev.PROCESS_DB = ref_utils.DocDB(db_path)
    ks = (5, 10, 20)
    scores = [
        ref_ev.get_score(
            (qa["question"], qa["answer"], ids), topk=20
        )
        for qa, ids in zip(qa_pairs, retrieved)
    ]
    want = {k: float(np.mean([s[str(k)] for s in scores])) for k in ks}
    ref_ev.PROCESS_DB.close()

    db = DocDB(db_path)
    got = recall_at_k(qa_pairs, retrieved, db, ks=ks)
    assert got == want


def test_official_metrics_match_reference_executed():
    ref_oe = load_reference_module("qa", "official_eval")
    from proqa_tpu.text import metrics as m

    rng = random.Random(5)
    pool = ["the", "an", "a", "Fox", "fox!", "1,000", "naïve", "U.S.", ""]
    pairs = [
        ("the fox", "fox"), ("a Fox!", "fox"), ("1,000", "1000"),
        ("", ""), ("", "x"), ("an answer here", "answer there"),
    ] + [
        (" ".join(rng.choice(pool) for _ in range(rng.randint(0, 5))),
         " ".join(rng.choice(pool) for _ in range(rng.randint(0, 5))))
        for _ in range(60)
    ]
    for pred, gt in pairs:
        assert m.normalize_answer(pred) == ref_oe.normalize_answer(pred), pred
        assert bool(m.exact_match_score(pred, gt)) == \
            bool(ref_oe.exact_match_score(pred, gt)), (pred, gt)
        assert m.f1_score(pred, gt) == pytest.approx(
            ref_oe.f1_score(pred, gt)), (pred, gt)
    for pred, pat in [("the fox", r"f.x"), ("Fox", r"^fox$"), ("ox", r"fox"),
                      ("a+b", r"a\+b"), ("x", r"(unclosed")]:
        assert bool(m.regex_match_score(pred, pat)) == \
            bool(ref_oe.regex_match_score(pred, pat)), (pred, pat)
    preds = ["the fox", "1000", "wrong"]
    gts = [["fox", "hound"], ["1,000"], ["right", "answers"]]
    for p, g in zip(preds, gts):
        assert m.metric_max_over_ground_truths(m.f1_score, p, g) == \
            pytest.approx(ref_oe.metric_max_over_ground_truths(ref_oe.f1_score, p, g))


def test_get_final_text_matches_reference_executed():
    ref_eu = load_reference_module("qa", "eval_utils")
    from proqa_tpu.text.squad import get_final_text

    cases = [
        ("john smith", "John Smith's house", True),
        ("john smith", "John Smith", True),
        ("fo x", "Fo X.", True),
        ("a b c", "A-B C", True),          # length-mismatch fallback path
        ("u . s .", "U.S.", True),
        ("1992", "(1992)", True),
        ("café", "Café!", True),
        ("john smith", "John Smith's house", False),
    ]
    for pred, orig, lower in cases:
        want = ref_eu.get_final_text(pred, orig, do_lower_case=lower,
                                     verbose_logging=False)
        got = get_final_text(pred, orig, do_lower_case=lower)
        assert got == want, (pred, orig, lower)


# ---------------------------------------------------------------------------
# BertRetrieveQA forward + loss zoo, reference-executed
# ---------------------------------------------------------------------------

K, L, M, S, TQ = 3, 32, 8, 4, 8
QLEN, PLEN = 6, 20   # [CLS] q [SEP] = 8 tokens offset, paragraph tokens after


def _tiny_hf_cfg():
    return transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )


def _make_reference_qa(flags: dict, seed: int):
    """Construct the reference BertRetrieveQA with random tiny towers
    (BertModel.from_pretrained patched to random local init — the reference's
    weight download is irrelevant to forward/loss math)."""
    import argparse
    from unittest import mock

    ref_qa = load_reference_module("qa", "bert_retrieve_qa")
    hf_cfg = _tiny_hf_cfg()
    args = argparse.Namespace(
        use_spanbert=False, bert_model_name="stub", retriever_path="",
        qa_drop=0.0, **flags,
    )
    torch.manual_seed(seed)
    with mock.patch.object(
        transformers.BertModel, "from_pretrained",
        classmethod(lambda cls, name: transformers.BertModel(hf_cfg)),
    ):
        model = ref_qa.BertRetrieveQA(hf_cfg, args)
    return model, hf_cfg


def _our_params_from_torch(model, qcfg):
    import jax.numpy as jnp

    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.hf_convert import (
        bert_params_from_state_dict, retriever_params_from_state_dict,
    )

    cfg = BertConfig.tiny(dtype=jnp.float32)
    state = {k: v for k, v in model.state_dict().items()}
    params = {
        "bert": bert_params_from_state_dict(state, cfg, prefix="bert."),
        "retriever": retriever_params_from_state_dict(
            {k[len("retriever."):]: v for k, v in state.items()
             if k.startswith("retriever.")}, cfg,
        ),
        "qa_outputs": {
            "kernel": np.asarray(state["qa_outputs.weight"].T, np.float32),
            "bias": np.asarray(state["qa_outputs.bias"], np.float32),
        },
    }
    if qcfg.add_select:
        params["select_outputs"] = {
            "kernel": np.asarray(state["select_outputs.weight"].T, np.float32),
            "bias": np.asarray(state["select_outputs.bias"], np.float32),
        }
    return params, cfg


def _make_question_batch(rng, *, with_gold: bool):
    """One reference-shaped question batch ([K, L] reader inputs)."""
    ids = np.zeros((K, L), np.int64)
    mask = np.zeros((K, L), np.int64)
    segs = np.zeros((K, L), np.int64)
    pmask = np.zeros((K, L), np.int64)
    off = QLEN + 2                       # [CLS] q ... [SEP]
    for p in range(K):
        plen = int(rng.integers(PLEN - 5, PLEN + 1))
        tot = off + plen + 1
        ids[p, :tot] = rng.integers(5, 127, tot)
        mask[p, :tot] = 1
        segs[p, off:tot] = 1
        pmask[p, off : off + plen] = 1
    starts = np.full((K, S), -1, np.int64)
    ends = np.full((K, S), -1, np.int64)
    para_targets = np.zeros((K,), np.int64)
    labels = np.zeros((M,), np.int64)
    if with_gold:
        for p in range(K - 1):           # last paragraph stays empty
            n_sp = int(rng.integers(1, S))
            for s_i in range(n_sp):
                s = int(rng.integers(off, off + 10))
                starts[p, s_i] = s
                ends[p, s_i] = s + int(rng.integers(0, 5))
            para_targets[p] = 1
        labels[rng.integers(0, M, 2)] = 1
    q_ids = np.zeros((1, TQ), np.int64)
    q_ids[0, : QLEN + 2] = rng.integers(5, 127, QLEN + 2)
    q_mask = (q_ids != 0).astype(np.int64)
    para_embed = rng.standard_normal((M, 128)).astype(np.float32)
    return {
        "input_ids": ids, "input_mask": mask, "segment_ids": segs,
        "paragraph_mask": pmask, "start_positions": starts,
        "end_positions": ends, "para_targets": para_targets,
        "top5000_labels": labels, "input_ids_q": q_ids,
        "input_mask_q": q_mask, "para_embed": para_embed,
    }


FLAG_COMBOS = [
    dict(shared_norm=sn, separate=sep, add_select=sel, drop_early=False)
    for sn in (False, True) for sep in (False, True) for sel in (False, True)
]
# drop_early=True is untestable against the reference: its forward then
# references the never-assigned `early_loss` (bert_retrieve_qa.py:156,169 vs
# the guard at :88) and raises UnboundLocalError — verified by
# test_reference_drop_early_is_broken below. Our drop_early semantics
# (early component zeroed) are covered by the builder-oracle tests in
# test_reader.py.


@pytest.mark.parametrize("flags", FLAG_COMBOS, ids=lambda f: "-".join(
    k for k, v in f.items() if v) or "base")
@pytest.mark.parametrize("with_gold", [True, False], ids=["gold", "nogold"])
def test_qa_loss_matches_reference_executed(flags, with_gold):
    import jax
    import jax.numpy as jnp

    from proqa_tpu.models.reader import QAConfig, qa_forward, qa_loss

    qcfg = QAConfig(**{k: v for k, v in flags.items()})
    model, _ = _make_reference_qa(flags, seed=17)
    params, cfg = _our_params_from_torch(model, qcfg)

    rng = np.random.default_rng(23)
    batch_np = _make_question_batch(rng, with_gold=with_gold)

    # ---- reference: torch training-mode forward returns the total loss ----
    model.train()
    tb = {k: torch.tensor(v) for k, v in batch_np.items()}
    with torch.no_grad():
        want = float(model(tb)["loss"])

    # ---- ours: batched [B=1, ...] forward + loss ----
    # (q fields are already [1, Tq] — the reference's per-question layout)
    jb = {
        k: jnp.asarray(v if k in ("input_ids_q", "input_mask_q") else v[None])
        for k, v in batch_np.items()
    }
    out = qa_forward(params, cfg, qcfg, jb, deterministic=True)
    got = float(qa_loss(out, jb, qcfg)["loss"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # ---- eval-mode logits parity ----
    model.eval()
    with torch.no_grad():
        ref_out = model(tb)
    np.testing.assert_allclose(
        np.asarray(out["start_logits"][0]), ref_out["start_logits"].numpy(),
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["rank_logits"][0]), ref_out["rank_logits"].numpy()[0],
        rtol=2e-3, atol=2e-3,
    )


def test_qa_loss_batched_matches_reference_mean():
    """Our [B, k, L] batching must equal the mean of the reference's
    per-question losses (the reference runs one question per step)."""
    import jax.numpy as jnp

    from proqa_tpu.models.reader import QAConfig, qa_forward, qa_loss

    flags = dict(shared_norm=True, separate=False, add_select=False,
                 drop_early=False)
    qcfg = QAConfig(**flags)
    model, _ = _make_reference_qa(flags, seed=31)
    params, cfg = _our_params_from_torch(model, qcfg)

    rng = np.random.default_rng(7)
    qbatches = [
        _make_question_batch(rng, with_gold=g) for g in (True, True, False, True)
    ]
    model.train()
    wants = []
    for b in qbatches:
        with torch.no_grad():
            wants.append(float(model({k: torch.tensor(v) for k, v in b.items()})["loss"]))

    jb = {
        k: jnp.asarray(np.stack([
            b[k][0] if k in ("input_ids_q", "input_mask_q") else b[k]
            for b in qbatches
        ]))
        for k in qbatches[0]
    }
    out = qa_forward(params, cfg, qcfg, jb, deterministic=True)
    got = float(qa_loss(out, jb, qcfg)["loss"])
    np.testing.assert_allclose(got, float(np.mean(wants)), rtol=2e-4, atol=2e-5)


def test_reference_drop_early_is_broken():
    """Documents why drop_early combos are excluded above: the reference
    crashes on its own --drop-early flag during training."""
    flags = dict(shared_norm=False, separate=False, add_select=False,
                 drop_early=True)
    model, _ = _make_reference_qa(flags, seed=3)
    model.train()
    batch = {
        k: torch.tensor(v)
        for k, v in _make_question_batch(
            np.random.default_rng(0), with_gold=True
        ).items()
    }
    with pytest.raises(UnboundLocalError):
        with torch.no_grad():
            model(batch)


def test_squad_prepare_and_spans_match_reference_executed(tmp_path):
    """Execute the reference's own `prepare` + `find_ans_span_with_char_offsets`
    (/root/reference/qa/prepro_utils.py:62-178) against our prepare_context +
    find_answer_spans (incl. the native C++ wp_prepare path) on the same
    vocab: doc tokens, every offset map, and the improved wordpiece spans
    must be identical."""
    ref_pp = load_reference_module("qa", "prepro_utils")
    from proqa_tpu.text.squad import char_spans_of, find_answer_spans, prepare_context
    from proqa_tpu.text.wordpiece import BertTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "quick", "brown",
             "fox", "jump", "##s", "##ed", "over", "lazy", "dog", "in",
             "19", "##92", ",", ".", "!", "-", "(", ")", "a", "an", "un",
             "##able", "run", "##ning", "tok", "##en", "##1", "##2", "1", "2"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")
    ours_tok = BertTokenizer.from_vocab_file(str(vp))
    hf_tok = transformers.BertTokenizer(str(vp), do_lower_case=True)

    contexts = [
        "The quick brown fox jumped over the lazy dog in 1992.",
        "  un-able, running! (a fox)  the quick dog .",
        "tok1 tok2 a an the\tquick\nfox",
        "a" + " the fox" * 10,
    ]
    answers = ["the lazy dog", "fox", "1992", "running", "a", "quick brown"]

    for context in contexts:
        want = ref_pp.prepare(context, hf_tok)
        got = prepare_context(context, ours_tok)
        assert list(got) == [list(w) if isinstance(w, list) else w for w in want], context
        doc_tokens, c2w, o2t, t2o, pieces = got
        for ans in answers:
            spans = char_spans_of(context, ans)
            if not spans:
                continue
            want_spans = ref_pp.find_ans_span_with_char_offsets(
                {"text": ans, "char_spans": spans},
                c2w, doc_tokens, pieces, o2t, hf_tok,
            )
            got_spans = find_answer_spans(
                ans, spans, c2w, doc_tokens, pieces, o2t, ours_tok
            )
            assert [tuple(s) for s in got_spans] == [tuple(s) for s in want_spans], (context, ans)
