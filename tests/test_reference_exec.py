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


# ---------------------------------------------------------------------------
# predict/decode oracle: execute the reference's OWN predict() end-to-end
# ---------------------------------------------------------------------------


def _predict_world(seed=0, nq=6, k=3, L=32):
    """Synthetic decode inputs shared by both sides: per-(question, para)
    start/end/rank logits (already paragraph-masked, the way the model hands
    them to predict — /root/reference/qa/bert_retrieve_qa.py:64-70), plus the
    host-side text projection context (doc/wp tokens, offset maps, golds)."""
    rng = np.random.default_rng(seed)
    pool = ["apple", "banana", "cherry", "dragonfruit", "elephant", "falcon",
            "grape", "harborside", "island", "jungle", "kettle", "lanternfish"]
    start = np.full((nq, k, L), -1e10, np.float32)
    end = np.full((nq, k, L), -1e10, np.float32)
    rank = (rng.normal(size=(nq, k)) * 2).astype(np.float32)
    offs, docs, wps, maps, golds, qs = [], [], [], [], [], []
    for qi in range(nq):
        po, dts, wpl, ml = [], [], [], []
        for pi in range(k):
            toks = [pool[int(rng.integers(len(pool)))]
                    for _ in range(int(rng.integers(5, 9)))]
            wp, m = [], []
            for oi, t in enumerate(toks):
                if len(t) > 6:
                    wp += [t[:4], "##" + t[4:]]
                    m += [oi, oi]
                else:
                    wp.append(t)
                    m.append(oi)
            off = 3 + int(rng.integers(0, 3))
            assert off + len(wp) <= L
            po.append(off), dts.append(toks), wpl.append(wp), ml.append(m)
            start[qi, pi, off:off + len(wp)] = rng.normal(size=len(wp))
            end[qi, pi, off:off + len(wp)] = rng.normal(size=len(wp))
        # gold span in one paragraph; for even questions force its logits to
        # peak there so EM is nonzero and varies across the alpha sweep
        gpi = int(rng.integers(k))
        wp, m, off = wpl[gpi], ml[gpi], po[gpi]
        s = int(rng.integers(len(wp)))
        e = min(len(wp) - 1, s + int(rng.integers(0, 3)))
        gold = " ".join(dts[gpi][m[s]:m[e] + 1])
        if qi % 2 == 0:
            start[qi, gpi, off + s] += 10.0
            end[qi, gpi, off + e] += 10.0
            rank[qi, (gpi + 1) % k] = rank[qi, gpi] + 1.5  # rank disagrees
        offs.append(po), docs.append(dts), wps.append(wpl), maps.append(ml)
        golds.append([gold, "zzz never-the-answer"])
        qs.append(f"question number {qi}")
    return dict(start=start, end=end, rank=rank, offs=offs, docs=docs,
                wps=wps, maps=maps, golds=golds, qs=qs, nq=nq, k=k, L=L)


def test_predict_decode_and_alpha_sweep_match_reference_executed(tmp_path):
    """VERDICT r3 missing #2: run the reference's own `predict()` —
    span-matrix decode with the <=10-token tril/triu band, wordpiece->text
    projection through its get_final_text, the 15-point rank/span alpha
    sweep, and the best-EM pick (/root/reference/qa/train_retrieve_qa.py:
    274-401) — on synthetic logits, and assert `QATrainer.predict` (real
    decode_spans + _iter_candidate_predictions + sweep) produces identical
    chosen spans, texts, scores, per-alpha EMs, and best alpha/EM."""
    import json as _json
    import types

    import jax.numpy as jnp

    w = _predict_world()
    nq, k, L = w["nq"], w["k"], w["L"]

    # ---- reference side: execute predict() with fake model/loader ----
    ref = load_reference_module("qa", "train_retrieve_qa")
    ref.move_to_cuda = lambda b: b  # CPU-only image

    flat_start = torch.tensor(w["start"].reshape(nq * k, L))
    flat_end = torch.tensor(w["end"].reshape(nq * k, L))
    flat_rank = torch.tensor(w["rank"].reshape(nq * k))

    class FakeModel:
        retriever = None

        def eval(self):
            pass

        def train(self):
            pass

        def __call__(self, batch):
            return {"start_logits": flat_start, "end_logits": flat_end,
                    "rank_logits": flat_rank}

    ref_batch = {
        "net_input": {},
        "para_offset": [w["offs"][qi][pi] for qi in range(nq) for pi in range(k)],
        "id": [f"q{qi}" for qi in range(nq) for _ in range(k)],
        "q": [w["qs"][qi] for qi in range(nq) for _ in range(k)],
        "true_answers": [w["golds"][qi] for qi in range(nq) for _ in range(k)],
        "tok_to_orig_index": [w["maps"][qi][pi] for qi in range(nq) for pi in range(k)],
        "doc_tokens": [w["docs"][qi][pi] for qi in range(nq) for pi in range(k)],
        "wp_tokens": [w["wps"][qi][pi] for qi in range(nq) for pi in range(k)],
    }

    class FakeLoader:
        def eval_load(self, retriever, k):
            return iter([ref_batch])

        def __len__(self):
            return 1

    ref_prefix = str(tmp_path / "ref")
    ref_args = types.SimpleNamespace(
        eval_k=k, add_select=False, save_all=True, save_pred=True,
        regex=False, prefix=ref_prefix, do_lower_case=True,
    )
    ref_best = ref.predict(ref_args, FakeModel(), FakeLoader(), "cpu")

    # ---- our side: QATrainer.predict over the identical logits ----
    from proqa_tpu.models.reader import decode_spans
    from proqa_tpu.train.qa_trainer import QATrainer

    trainer = QATrainer.__new__(QATrainer)
    trainer.tcfg = types.SimpleNamespace(
        eval_k=k, do_lower_case=True, regex=False, prefetch_batches=0,
        max_answer_len=10,
    )
    trainer.state = types.SimpleNamespace(params=None)
    trainer.query_encoder = lambda: None

    def fake_eval_step(params, net):
        s, e, score = decode_spans(
            net["start_logits"], net["end_logits"], trainer.tcfg.max_answer_len
        )
        return {"start": s, "end": e, "span_score": score,
                "rank_score": net["rank_logits"]}

    trainer._eval_step = fake_eval_step

    our_batch = {
        "net_input": {
            "start_logits": jnp.asarray(w["start"]),
            "end_logits": jnp.asarray(w["end"]),
            "rank_logits": jnp.asarray(w["rank"]),
        },
        "id": [f"q{qi}" for qi in range(nq)],
        "q": w["qs"],
        "true_answers": w["golds"],
        "para_offset": w["offs"],
        "tok_to_orig_index": w["maps"],
        "doc_tokens": w["docs"],
        "wp_tokens": w["wps"],
    }
    sampler = types.SimpleNamespace(
        cfg=types.SimpleNamespace(question_batch=nq),
        eval_load=lambda enc, kk, B: iter([our_batch]),
    )
    our_prefix = str(tmp_path / "ours")
    our_best = trainer.predict(sampler, save_all_prefix=our_prefix)

    # ---- every candidate prediction identical ----
    ref_all = _json.load(open(f"{ref_prefix}_all.json"))
    our_all = _json.load(open(f"{our_prefix}_all.json"))
    assert set(ref_all) == set(our_all)
    for qid in ref_all:
        assert len(ref_all[qid]) == len(our_all[qid]) == k
        for rp, op in zip(ref_all[qid], our_all[qid]):
            # reference dumps namedtuples as lists:
            # [text, rank_score, passage, span_score, question]
            assert op["text"] == rp[0], qid
            assert op["passage"] == rp[2]
            assert op["question"] == rp[4]
            np.testing.assert_allclose(op["rank_score"], rp[1], rtol=1e-5)
            np.testing.assert_allclose(op["span_score"], rp[3], rtol=1e-5)
    ref_ground = _json.load(open(f"{ref_prefix}_ground.json"))
    our_ground = _json.load(open(f"{our_prefix}_ground.json"))
    assert ref_ground == our_ground

    # ---- per-alpha top-1 picks and EMs identical ----
    from proqa_tpu.train.qa_trainer import ALPHA_GRID

    for alpha in ALPHA_GRID:
        a_key = f"{alpha:g}" if alpha in (0, 1) else str(alpha)
        ref_rows = [_json.loads(l) for l in open(f"{ref_prefix}_{alpha}.json")]
        our_rows = [_json.loads(l) for l in open(f"{our_prefix}_{alpha}.json")]
        ref_by_q = {r["question"]: r for r in ref_rows}
        our_by_q = {r["question"]: r for r in our_rows}
        assert set(ref_by_q) == set(our_by_q), alpha
        for q in ref_by_q:
            assert our_by_q[q]["answer"] == ref_by_q[q]["answer"], (alpha, q)
            assert bool(our_by_q[q]["em"]) == bool(ref_by_q[q]["em"]), (alpha, q)
            assert our_by_q[q]["gold"] == ref_by_q[q]["gold"]

    # ---- best EM pick identical ----
    np.testing.assert_allclose(our_best, ref_best, rtol=1e-9)


# ---------------------------------------------------------------------------
# optimizer-trajectory parity: execute the reference's training update
# ---------------------------------------------------------------------------


def _make_reference_retriever(seed: int):
    """Reference BertForRetriever (/root/reference/retrieval/retriever.py:7-31)
    with tiny random towers (from_pretrained patched to local random init)."""
    import argparse
    from unittest import mock

    ref_mod = load_reference_module("retrieval", "retriever")
    hf_cfg = _tiny_hf_cfg()
    args = argparse.Namespace(bert_model_name="stub")
    torch.manual_seed(seed)
    with mock.patch.object(
        transformers.BertModel, "from_pretrained",
        classmethod(lambda cls, name: transformers.BertModel(hf_cfg)),
    ):
        model = ref_mod.BertForRetriever(hf_cfg, args)
    return model


def _retriever_batches(n_steps: int, b: int, tq: int, tc: int, seed: int):
    """Identical variable-length (zero-padded) batches for both sides."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_steps):
        ids_q = np.zeros((b, tq), np.int64)
        ids_c = np.zeros((b, tc), np.int64)
        for i in range(b):
            lq = int(rng.integers(4, tq + 1))
            lc = int(rng.integers(6, tc + 1))
            ids_q[i, :lq] = rng.integers(5, 127, lq)
            ids_c[i, :lc] = rng.integers(5, 127, lc)
        batches.append({
            "input_ids_q": ids_q, "input_mask_q": (ids_q != 0).astype(np.int64),
            "input_ids_c": ids_c, "input_mask_c": (ids_c != 0).astype(np.int64),
        })
    return batches


@pytest.mark.parametrize(
    "wd,clip", [(0.0, 5.0), (0.01, 0.02)], ids=["ref-defaults", "decay+clip-binds"]
)
def test_optimizer_trajectory_matches_reference_executed(wd, clip):
    """VERDICT r3 missing #3: step-for-step UPDATE parity. The reference's
    training update — AdamW over no-decay param groups (bias/LayerNorm.weight
    excluded, /root/reference/retrieval/train_retriever.py:140-148), global
    grad-norm clip before step (:224-231), constant LR, in-batch CE loss
    (:195-205) — executed with the reference's own BertForRetriever for
    several f32 steps from identical init on identical batches, vs
    `make_optimizer`'s optax chain driven by `make_train_step`. Catches
    eps-placement / decay-mask / clip-order drift no single-step test can.

    Oracle optimizer: torch.optim.AdamW (the installed 4.x removed the
    pinned transformers-2.5.1 AdamW; its one divergence — eps added to the
    UNcorrected sqrt(v) — is documented in docs/MIGRATION.md)."""
    import copy

    import jax
    import jax.numpy as jnp

    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.hf_convert import retriever_params_from_state_dict
    from proqa_tpu.train.optim import init_train_state, make_optimizer
    from proqa_tpu.train.retriever_trainer import make_train_step

    LR, EPS, N_STEPS, B = 5e-4, 1e-8, 6, 8
    model = _make_reference_retriever(seed=11)
    init_sd = copy.deepcopy(model.state_dict())
    batches = _retriever_batches(N_STEPS, B, tq=12, tc=16, seed=29)

    # ---- reference side: the verbatim update loop ----
    no_decay = ["bias", "LayerNorm.weight"]
    groups = [
        {"params": [p for n, p in model.named_parameters()
                    if not any(nd in n for nd in no_decay)], "weight_decay": wd},
        {"params": [p for n, p in model.named_parameters()
                    if any(nd in n for nd in no_decay)], "weight_decay": 0.0},
    ]
    opt = torch.optim.AdamW(groups, lr=LR, eps=EPS)
    loss_fct = torch.nn.CrossEntropyLoss()
    model.train()
    ref_losses, ref_gnorms = [], []
    for batch in batches:
        tb = {k: torch.tensor(v) for k, v in batch.items()}
        out = model(tb)
        product = torch.mm(out["q"], out["c"].t())
        target = torch.arange(product.size(0))
        loss = loss_fct(product, target)
        loss.backward()
        gn = torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
        opt.step()
        model.zero_grad()
        ref_losses.append(float(loss.detach()))
        ref_gnorms.append(float(gn))

    # ---- our side: same init, same batches, optax chain ----
    cfg = BertConfig.tiny(
        dtype=jnp.float32, hidden_dropout=0.0, attention_dropout=0.0
    )
    params0 = retriever_params_from_state_dict(init_sd, cfg)
    tx = make_optimizer(LR, weight_decay=wd, max_grad_norm=clip, adam_eps=EPS)
    state = init_train_state(jax.tree.map(jnp.asarray, params0), tx)
    step_fn = jax.jit(make_train_step(cfg, tx))
    our_losses = []
    for i, batch in enumerate(batches):
        dev = {k: jnp.asarray(v, jnp.int32) for k, v in batch.items()}
        state, m = step_fn(state, dev, jax.random.PRNGKey(i))  # dropout=0
        our_losses.append(float(m["loss"]))

    # when the clip is meant to bind, make sure the scenario exercises it
    if clip < 1.0:
        assert max(ref_gnorms) > clip

    # per-step losses track (loss at step t reflects all t-1 prior updates)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-4, atol=2e-6)

    # final parameters track leaf-for-leaf. One degenerate direction is
    # exempt from the tight tolerance: proj_c.bias's TRUE gradient is
    # identically zero (the in-batch CE is invariant to a constant shift of
    # every context logit column: d/d bias = sum_q (softmax_row - onehot)
    # summed over contexts = 0), so both frameworks feed Adam pure f32
    # roundoff there and its scale-invariant update amplifies that noise to
    # O(lr)/step — bounded by N_STEPS*LR, which is the tolerance it gets.
    ref_final = retriever_params_from_state_dict(model.state_dict(), cfg)
    flat_ours = jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, state.params))
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_final))
    assert len(flat_ours) == len(flat_ref)
    for path, ours in flat_ours:
        want = flat_ref[path]
        name = jax.tree_util.keystr(path)
        atol = N_STEPS * LR if name == "['proj_c']['bias']" else 5e-6
        np.testing.assert_allclose(ours, want, rtol=5e-4, atol=atol, err_msg=name)
