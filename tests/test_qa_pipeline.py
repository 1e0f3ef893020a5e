"""End-to-end QA pipeline on a synthetic world: corpus in sqlite, dense index
built with the actual tiny retriever, online sampler retrieval, joint train
steps, and α-sweep EM prediction. Exercises the full SURVEY.md §3.4 call
stack re-architected for TPU."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from proqa_tpu.data.docdb import DocDB
from proqa_tpu.index import DenseIndex, IdMap
from proqa_tpu.models.bert import BertConfig
from proqa_tpu.models.reader import QAConfig
from proqa_tpu.models.retriever import encode_context, init_retriever_params
from proqa_tpu.qa.prepro import hash_question, process_ground_paras
from proqa_tpu.qa.sampler import OnlineSampler, OnlineSamplerConfig
from proqa_tpu.text.wordpiece import BertTokenizer
from proqa_tpu.train.qa_trainer import QATrainer, QATrainerConfig

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [f"tok{i}" for i in range(60)] + [
    "what", "is", "the", "answer", "question", "about",
]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """50-paragraph corpus; question i asks about topic i, whose answer
    'tok<i+10>' appears in paragraph p<i>."""
    root = tmp_path_factory.mktemp("qa_world")
    vocab_path = root / "vocab.txt"
    vocab_path.write_text("\n".join(VOCAB) + "\n")
    tok = BertTokenizer.from_vocab_file(str(vocab_path))

    n_paras = 50
    paras = []
    for i in range(n_paras):
        words = [f"tok{(i + j) % 60}" for j in range(20)]
        paras.append((f"p{i}", " ".join(words)))
    db = DocDB.create(str(root / "docs.db"), paras)

    cfg = BertConfig.tiny(dtype=jnp.float32, hidden_dropout=0.0, attention_dropout=0.0,
                          initializer_range=0.1)
    params_r = init_retriever_params(jax.random.PRNGKey(0), cfg, embed_dim=16)

    # build the index with the real context tower
    ids_list = [tok.encode(text, max_length=64) for _, text in paras]
    from proqa_tpu.data.collate import pad_to
    ids = pad_to(ids_list, 64)
    mask = (ids != 0).astype(np.int32)
    embeds = np.asarray(encode_context(params_r, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    index = DenseIndex.from_embeddings(
        embeds, IdMap.from_doc_ids([pid for pid, _ in paras]),
        dtype=jnp.float32, pad_multiple=8,
    )

    qa_data = [
        {"question": f"what is about tok{i} tok{i+1}", "answer": [f"tok{i+10}"]}
        for i in range(12)
    ]
    qa_path = root / "qa.jsonl"
    with open(qa_path, "w") as f:
        for qa in qa_data:
            f.write(json.dumps(qa) + "\n")

    # matched-paras gold file: answers matched over the whole corpus
    matched_path = root / "matched.jsonl"
    with open(matched_path, "w") as f:
        for qa in qa_data:
            ans = qa["answer"][0]
            gold = {pid: ans for pid, text in paras if ans in text.split()}
            f.write(json.dumps({"question": qa["question"], "matched_paras": gold}) + "\n")

    return dict(
        root=root, tok=tok, db=db, cfg=cfg, params_r=params_r, index=index,
        qa_path=str(qa_path), matched_path=str(matched_path), paras=paras,
    )


@pytest.fixture(scope="module")
def scfg():
    return OnlineSamplerConfig(
        max_query_length=12, max_length=48, candidates=16, max_spans=8,
        question_batch=4, exact_search=True, num_workers=2,
    )


def _query_encoder(world):
    cfg, params = world["cfg"], world["params_r"]
    from proqa_tpu.models.retriever import encode_query

    def enc(ids, mask):
        return encode_query(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    return enc


def test_sampler_train_batches(world, scfg):
    sampler = OnlineSampler(
        world["qa_path"], world["tok"], world["db"], world["index"], scfg,
        matched_para_path=world["matched_path"],
    )
    batches = list(sampler.load(_query_encoder(world), k=3, questions_per_batch=4))
    assert batches, "no batches produced"
    b = batches[0]["net_input"]
    B = b["input_ids"].shape[0]
    assert b["input_ids"].shape == (B, 3, 48)
    assert b["segment_ids"].shape == (B, 3, 48)
    assert b["paragraph_mask"].shape == (B, 3, 48)
    assert b["start_positions"].shape == (B, 3, 8)
    assert b["para_rows"].shape == (B, 16)   # device-gather path (round 3)
    assert b["top5000_labels"].shape == (B, 16)

    # every annotated span must point at the actual answer token
    for qi in range(B):
        answer = batches[0]["true_answers"][qi][0]
        ans_id = world["tok"].vocab[answer]
        sp = b["start_positions"][qi]
        for pi in range(3):
            for s in sp[pi]:
                if s >= 0:
                    assert b["input_ids"][qi, pi, s] == ans_id
    # gold labels coverage: at least one positive somewhere
    assert b["top5000_labels"].sum() > 0


def test_underfilled_candidates_never_labeled_gold(world):
    """Under-filled searches pad candidate slots with (row 0, -inf). Those
    slots must NOT be counted gold by the sampler's isin labeling when the
    real row 0 is a gold paragraph (question 0's gold set includes p0 = row
    0 here). The sampler marks them row -1 at the retrieval boundary; the
    device gather clips -1 back to row 0 (same embedding as before)."""
    scfg2 = OnlineSamplerConfig(
        max_query_length=12, max_length=48, candidates=16, max_spans=8,
        question_batch=4, exact_search=False, num_workers=0,
    )
    # nlist=16, nprobe=1, cap factor 1: a probe sees ~cap+overflow slots,
    # far fewer than the 16 requested candidates -> padding tail guaranteed
    ivf_index = world["index"].to_ivf(
        nlist=16, nprobe=1, niter=5, capacity_factor=1.0,
    )
    sampler = OnlineSampler(
        world["qa_path"], world["tok"], world["db"], ivf_index, scfg2,
        matched_para_path=world["matched_path"],
    )
    batches = list(sampler.load(_query_encoder(world), k=3, questions_per_batch=4))
    assert batches, "no batches produced"
    saw_padding = False
    for batch in batches:
        rows = batch["net_input"]["para_rows"]
        labels = batch["net_input"]["top5000_labels"]
        pad = rows < 0
        saw_padding = saw_padding or bool(pad.any())
        assert (labels[pad] == 0).all(), "padding slot labeled gold"
    assert saw_padding, "test setup: expected under-filled candidate lists"


def test_sampler_failed_retrieval_counted(world, scfg):
    bad_qa = [{"question": "what is about tok1", "answer": ["zzzz_missing"]}]
    sampler = OnlineSampler(
        bad_qa, world["tok"], world["db"], world["index"], scfg, matched_para_path="",
    )
    sampler.qid2goldparas = {}
    batches = list(sampler.load(_query_encoder(world), k=2, questions_per_batch=1))
    assert batches == []
    assert sampler.failed_retrieval == 1


def test_sampler_eval_batches(world, scfg):
    sampler = OnlineSampler(world["qa_path"], world["tok"], world["db"], world["index"], scfg)
    batches = list(sampler.eval_load(_query_encoder(world), k=2, questions_per_batch=4))
    assert sum(len(b["id"]) for b in batches) == 12
    b = batches[0]["net_input"]
    assert b["input_ids"].shape[1:] == (2, 48)
    assert "start_positions" not in b
    assert len(batches[0]["tok_to_orig_index"][0]) == 2


def test_qa_trainer_end_to_end(world, scfg, tmp_path):
    tcfg = QATrainerConfig(
        learning_rate=1e-3, num_train_epochs=1, eval_k=2, train_k=2,
        questions_per_batch=4, output_dir=str(tmp_path / "qa_run"), seed=0,
        fix_para_encoder=True,
    )
    from proqa_tpu.models.reader import init_qa_params
    from proqa_tpu.parallel import make_mesh
    qcfg = QAConfig(shared_norm=True)
    # seed the retriever submodule with the index-building params so online
    # retrieval is consistent with the prebuilt index
    params = init_qa_params(jax.random.PRNGKey(5), world["cfg"], qcfg, embed_dim=16)
    params["retriever"] = world["params_r"]
    trainer = QATrainer(world["cfg"], qcfg, tcfg, mesh=make_mesh(4), params=params)
    trainer.set_corpus(world["index"])

    sampler = OnlineSampler(
        world["qa_path"], world["tok"], world["db"], world["index"], scfg,
        matched_para_path=world["matched_path"],
    )
    losses = []
    for batch in sampler.load(trainer.query_encoder(), tcfg.train_k, 4):
        from proqa_tpu.data.collate import batch_pad
        net, _ = batch_pad(batch["net_input"], 4)
        trainer.rng, r = jax.random.split(trainer.rng)
        trainer.state, comp = trainer._train_step(trainer.state, trainer._device_batch(net), r)
        losses.append(float(comp["loss"]))
    assert losses and all(np.isfinite(l) for l in losses)
    assert int(trainer.state.step) == len(losses)

    em = trainer.predict(sampler)
    assert 0.0 <= em <= 1.0

    # frozen context tower must be untouched
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        trainer.state.params["retriever"]["bert_c"], world["params_r"]["bert_c"],
    )


def _make_trainer(world, tmp_path, name, mesh_size=4, **tcfg_kw):
    from proqa_tpu.models.reader import init_qa_params
    from proqa_tpu.parallel import make_mesh

    tcfg_kw = {"num_train_epochs": 1, **tcfg_kw}
    tcfg = QATrainerConfig(
        learning_rate=1e-3, eval_k=2, train_k=2,
        questions_per_batch=4, output_dir=str(tmp_path / name), seed=0,
        fix_para_encoder=True, **tcfg_kw,
    )
    qcfg = QAConfig(shared_norm=True)
    params = init_qa_params(jax.random.PRNGKey(5), world["cfg"], qcfg, embed_dim=16)
    params["retriever"] = world["params_r"]
    return QATrainer(world["cfg"], qcfg, tcfg, mesh=make_mesh(mesh_size), params=params)


def test_qa_grad_accum_equivalence(world, scfg, tmp_path):
    """accum=2 over a [4, ...] batch must match one big accum=1 step
    (reference --accumulate_gradients, qa/train_retrieve_qa.py:196-217);
    dropout is zero in the tiny config so grads are deterministic."""
    from proqa_tpu.data.collate import batch_pad

    sampler = OnlineSampler(
        world["qa_path"], world["tok"], world["db"], world["index"], scfg,
        matched_para_path=world["matched_path"],
    )
    t1 = _make_trainer(world, tmp_path, "accum1", mesh_size=2, accumulate_gradients=1)
    t2 = _make_trainer(world, tmp_path, "accum2", mesh_size=2, accumulate_gradients=2)
    t1.set_corpus(world["index"])
    t2.set_corpus(world["index"])
    batch = next(iter(sampler.load(t1.query_encoder(), 2, 4)))
    net, rows = batch_pad(batch["net_input"], 4)
    assert rows == 4, "fixture must fill the batch for exact equivalence"
    net["question_mask"] = np.ones((4,), np.int32)
    rng = jax.random.PRNGKey(7)
    t1.state, c1 = t1._train_step(t1.state, t1._device_batch(net), rng)
    t2.state, c2 = t2._train_step(t2.state, t2._device_batch(net), rng)
    np.testing.assert_allclose(float(c1["loss"]), float(c2["loss"]), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        ),
        t1.state.params, t2.state.params,
    )


def test_qa_train_prefetched_end_to_end(world, scfg, tmp_path):
    """trainer.train with the prefetch thread on: host example-building
    overlaps device steps; donated state buffers never leak to the encoder."""
    trainer = _make_trainer(world, tmp_path, "prefetch", prefetch_batches=2)
    sampler = OnlineSampler(
        world["qa_path"], world["tok"], world["db"], world["index"], scfg,
        matched_para_path=world["matched_path"],
    )
    eval_sampler = OnlineSampler(
        world["qa_path"], world["tok"], world["db"], world["index"], scfg,
    )
    em = trainer.train(sampler, eval_sampler)
    assert 0.0 <= em <= 1.0
    assert int(trainer.state.step) >= 2

    # epoch-end full-state checkpoint exists and resume restores the step +
    # nonzero optimizer moments (true resume, unlike the reference's
    # params-only dumps)
    import os

    last = os.path.join(trainer.tcfg.output_dir, "checkpoint_last.msgpack")
    assert os.path.exists(last)
    t2 = _make_trainer(world, tmp_path, "prefetch_resume", prefetch_batches=2)
    t2.resume(last)
    assert int(t2.state.step) == int(trainer.state.step)
    mus = [np.asarray(x) for x in jax.tree.leaves(t2.state.opt_state)
           if hasattr(x, "shape") and getattr(x, "ndim", 0) > 0]
    assert any(np.abs(m).sum() > 0 for m in mus)
    # loop progress restored too: best_em must survive resume so the first
    # post-resume eval can't overwrite best-model with a worse checkpoint
    assert t2._resume_meta.get("best_em") == em
    assert t2._resume_meta.get("epoch") == trainer.tcfg.num_train_epochs


def test_query_encoder_tracks_live_params(world, scfg, tmp_path):
    """Retrieval must follow training: the encoder closure reads the CURRENT
    retriever params, not a snapshot from construction time."""
    trainer = _make_trainer(world, tmp_path, "live")
    enc = trainer.query_encoder()
    ids = np.array([[2, 5, 6, 3] + [0] * 8], np.int32)
    mask = (ids != 0).astype(np.int32)
    e1 = np.asarray(enc(ids, mask))
    trainer.state = trainer.state._replace(
        params=jax.tree.map(lambda x: x * 1.5, trainer.state.params)
    )
    e2 = np.asarray(enc(ids, mask))
    assert not np.allclose(e1, e2)


def test_predict_save_all(world, scfg, tmp_path):
    """--save-all parity (reference train_retrieve_qa.py:359-364,391-394):
    all candidates + ground truths + one top-1 file per alpha."""
    from proqa_tpu.train.qa_trainer import ALPHA_GRID

    trainer = _make_trainer(world, tmp_path, "saveall")
    sampler = OnlineSampler(world["qa_path"], world["tok"], world["db"], world["index"], scfg)
    prefix = str(tmp_path / "preds")
    best_path = str(tmp_path / "best.jsonl")
    trainer.predict(sampler, save_path=best_path, save_all_prefix=prefix)

    with open(f"{prefix}_all.json") as f:
        all_preds = json.load(f)
    with open(f"{prefix}_ground.json") as f:
        ground = json.load(f)
    assert len(all_preds) == 12 and len(ground) == 12
    some = next(iter(all_preds.values()))
    assert len(some) == 2  # eval_k candidates per question
    assert {"text", "rank_score", "span_score", "passage", "question"} <= set(some[0])
    for alpha in ALPHA_GRID:
        rows = [json.loads(l) for l in open(f"{prefix}_{alpha}.json")]
        assert len(rows) == 12
    best_rows = [json.loads(l) for l in open(best_path)]
    assert len(best_rows) == 12
    # first-alpha-wins tie-break: all EMs equal => saved alpha is ALPHA_GRID[0]
    ems_by_alpha = {}
    for alpha in ALPHA_GRID:
        rows = [json.loads(l) for l in open(f"{prefix}_{alpha}.json")]
        ems_by_alpha[alpha] = np.mean([r["em"] for r in rows])
    best = max(ems_by_alpha.values())
    first_best = next(a for a in ALPHA_GRID if ems_by_alpha[a] == best)
    assert all(r["alpha"] == first_best for r in best_rows)


def test_predict_em_excludes_goldless_rows(world, scfg, tmp_path):
    """Gold-less (serving-style) eval rows must not deflate the EM mean:
    predict over gold+gold-less == predict over the gold subset alone."""
    trainer = _make_trainer(world, tmp_path, "goldless")
    gold_path = str(tmp_path / "gold_only.jsonl")
    mixed_path = str(tmp_path / "mixed.jsonl")
    gold_rows = [json.loads(l) for l in open(world["qa_path"])][:4]
    with open(gold_path, "w") as f:
        for qa in gold_rows:
            f.write(json.dumps(qa) + "\n")
    with open(mixed_path, "w") as f:
        for qa in gold_rows:
            f.write(json.dumps(qa) + "\n")
        for i in range(4):
            f.write(json.dumps({"question": f"serving query tok{40+i}"}) + "\n")
    args = (world["tok"], world["db"], world["index"], scfg)
    em_gold = trainer.predict(OnlineSampler(gold_path, *args))
    save = str(tmp_path / "mixed_preds.jsonl")
    em_mixed = trainer.predict(OnlineSampler(mixed_path, *args), save_path=save)
    assert em_mixed == pytest.approx(em_gold)
    rows = [json.loads(l) for l in open(save)]
    assert len(rows) == 8
    assert all(r["em"] is None for r in rows if not r["gold"])
    assert all(r["em"] is not None for r in rows if r["gold"])


def test_sampler_interleaved_load_eval_load(world, scfg):
    """eval_load must be re-entrant with a concurrent train load on the same
    sampler (round-1 weak #10: cfg was mutated in place)."""
    sampler = OnlineSampler(
        world["qa_path"], world["tok"], world["db"], world["index"], scfg,
        matched_para_path=world["matched_path"],
    )
    enc = _query_encoder(world)
    train_it = sampler.load(enc, k=2, questions_per_batch=4)
    tb1 = next(train_it)
    eval_it = sampler.eval_load(enc, k=2, questions_per_batch=4)
    eb1 = next(eval_it)
    tb2 = next(train_it)  # train candidate pool must still be cfg.candidates
    assert tb1["net_input"]["para_rows"].shape[1] == scfg.candidates
    assert tb2["net_input"]["para_rows"].shape[1] == scfg.candidates
    assert eb1["net_input"]["para_embed"].shape[1] == 2


def test_process_ground_paras(world, tmp_path):
    retrieved_path = str(tmp_path / "retrieved.jsonl")
    with open(retrieved_path, "w") as f:
        for i in range(12):
            f.write(json.dumps({"para_id": [f"p{j}" for j in range(50)]}) + "\n")
    out_path = str(tmp_path / "matched_out.jsonl")
    coverage = process_ground_paras(
        retrieved_path, world["qa_path"], out_path, str(world["root"] / "docs.db"), k=50,
    )
    assert coverage == 1.0  # every answer is somewhere in the corpus
    rows = [json.loads(l) for l in open(out_path)]
    assert all(r["matched_paras"] for r in rows)
    qa0 = rows[0]
    assert any(qa0["answer"][0] in (v if isinstance(v, str) else " ".join(v))
               for v in qa0["matched_paras"].values())


def test_sampler_shuffle_deterministic(world, scfg):
    s1 = OnlineSampler(world["qa_path"], world["tok"], world["db"], world["index"], scfg)
    s2 = OnlineSampler(world["qa_path"], world["tok"], world["db"], world["index"], scfg)
    s1.shuffle(seed=5)
    s2.shuffle(seed=5)
    assert [q["question"] for q in s1.qa_data] == [q["question"] for q in s2.qa_data]
    s2.shuffle(seed=6)
    assert [q["question"] for q in s1.qa_data] != [q["question"] for q in s2.qa_data]


def test_qa_epoch_end_early_stopping(world, scfg, tmp_path):
    """Epoch-end evals must count toward wait_step (at the reference default
    eval_period=-1 its early stopping is dead code — reference
    train_retrieve_qa.py:244-255 never increments wait_step there)."""
    trainer = _make_trainer(
        world, tmp_path, "earlystop", num_train_epochs=6, wait_step=2,
    )
    calls = []
    trainer.predict = lambda sampler: calls.append(1) or 0.0  # never improves
    sampler = OnlineSampler(
        world["qa_path"], world["tok"], world["db"], world["index"], scfg,
        matched_para_path=world["matched_path"],
    )
    eval_sampler = OnlineSampler(
        world["qa_path"], world["tok"], world["db"], world["index"], scfg,
    )
    trainer.train(sampler, eval_sampler)
    # wait hits wait_step at the end of epoch 2 -> exactly 2 epoch-end evals
    assert len(calls) == 2, calls


def test_fused_encode_search_matches_two_dispatch(world, scfg, tmp_path):
    """query_encoder().encode_search (ONE jitted encode+search dispatch) must
    return the same rows as the separate encode -> index.search chain, for
    both the exact dense index and the IVF quantizer path."""
    trainer = _make_trainer(world, tmp_path, "fused", mesh_size=1)
    enc = trainer.query_encoder()
    ids = np.array(
        [[2, 5, 6, 3] + [0] * 8, [2, 7, 8, 9, 3] + [0] * 7], np.int32
    )
    mask = (ids != 0).astype(np.int32)
    embeds = np.asarray(enc(ids, mask), np.float32)

    # exact dense path
    res = enc.encode_search(ids, mask, world["index"], 7, True)
    assert res is not None, "fused path must engage on a single-device mesh"
    _, fused_idx = res
    _, want_idx = world["index"].search(embeds, 7, exact=True)
    np.testing.assert_array_equal(fused_idx, want_idx)

    # IVF path (reference online config shape: quantized candidate search)
    ivf_index = world["index"].to_ivf(nlist=4, nprobe=4, niter=3)
    res = enc.encode_search(ids, mask, ivf_index, 7, False)
    assert res is not None
    _, fused_idx = res
    _, want_idx = ivf_index.search(embeds, 7)
    np.testing.assert_array_equal(fused_idx, want_idx)


def test_fused_encode_search_in_sampler(world, scfg, tmp_path):
    """The sampler must produce identical batches through the fused
    single-dispatch retrieval and the plain two-dispatch encoder closure."""
    trainer = _make_trainer(world, tmp_path, "fused_sampler", mesh_size=1)
    trainer.state = trainer.state._replace(
        params={**trainer.state.params, "retriever": world["params_r"]}
    )
    kw = dict(matched_para_path=world["matched_path"])
    s_fused = OnlineSampler(world["qa_path"], world["tok"], world["db"], world["index"], scfg, **kw)
    s_plain = OnlineSampler(world["qa_path"], world["tok"], world["db"], world["index"], scfg, **kw)
    got = list(s_fused.load(trainer.query_encoder(), k=3, questions_per_batch=4))
    want = list(s_plain.load(_query_encoder(world), k=3, questions_per_batch=4))
    assert len(got) == len(want) and got, "same number of batches"
    for bg, bw in zip(got, want):
        assert bg["id"] == bw["id"]
        for key in bg["net_input"]:
            np.testing.assert_array_equal(bg["net_input"][key], bw["net_input"][key])


def test_fused_cache_hardening(world, scfg, tmp_path):
    """_encode_search's cache must (a) not serve an entry whose weakref no
    longer points at the index it is keyed by (CPython reuses addresses, so
    an id()-keyed hit can be a different index), (b) tolerate transient
    dispatch failures, disabling the fused path only after
    _FUSED_MAX_FAILURES consecutive errors and resetting the count on
    success, and (c) purge entries when their index is garbage-collected."""
    import gc
    import weakref

    trainer = _make_trainer(world, tmp_path, "fused_hard", mesh_size=1)
    enc = trainer.query_encoder()
    ids = np.array([[2, 5, 6, 3] + [0] * 8, [2, 7, 8, 9, 3] + [0] * 7], np.int32)
    mask = (ids != 0).astype(np.int32)
    index = world["index"]
    key = (id(index), getattr(index, "version", 0), 7, True, ids.shape)

    # (a) stale entry at a reused address: must be rebuilt, never dispatched
    class _Decoy:
        pass

    decoy = _Decoy()

    def _wrong_fn(*a, **kw):
        raise AssertionError("stale cache entry must not be dispatched")

    trainer._fused_cache[key] = (weakref.ref(decoy), (_wrong_fn, ()), 0)
    res = enc.encode_search(ids, mask, index, 7, True)
    assert res is not None, "rebuilt entry must engage"
    embeds = np.asarray(enc(ids, mask), np.float32)
    _, want_idx = index.search(embeds, 7, exact=True)
    np.testing.assert_array_equal(res[1], want_idx)

    # (b) transient failures fall back without poisoning, then disable
    ref, (real_fn, operands), _ = trainer._fused_cache[key]
    calls = {"n": 0}

    def _flaky(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("transient tunnel flake")

    trainer._fused_cache[key] = (ref, (_flaky, operands), 0)
    for _ in range(trainer._FUSED_MAX_FAILURES):
        assert enc.encode_search(ids, mask, index, 7, True) is None
    assert calls["n"] == trainer._FUSED_MAX_FAILURES
    assert enc.encode_search(ids, mask, index, 7, True) is None
    assert calls["n"] == trainer._FUSED_MAX_FAILURES, "disabled entry must not dispatch"
    # a success resets the consecutive-failure count
    trainer._fused_cache[key] = (
        ref, (real_fn, operands), trainer._FUSED_MAX_FAILURES - 1
    )
    assert enc.encode_search(ids, mask, index, 7, True) is not None
    assert trainer._fused_cache[key][2] == 0

    # (c) a collected index purges its cache entries (no pinned embeddings)
    tmp_index = DenseIndex.from_embeddings(
        np.asarray(index.embeddings, np.float32).copy(),
        dtype=jnp.float32, pad_multiple=8,
    )
    assert enc.encode_search(ids, mask, tmp_index, 5, True) is not None
    tkey = (id(tmp_index), tmp_index.version, 5, True, ids.shape)
    assert tkey in trainer._fused_cache

    # (d) an incremental mutation bumps version: the pre-mutation entry is
    # dropped (its operands pin the OLD embeddings buffer) and a fresh one
    # serves the post-mutation corpus
    tmp_index.add(np.asarray(tmp_index.take([0]), np.float32) * 3.0)
    res2 = enc.encode_search(ids, mask, tmp_index, 5, True)
    assert res2 is not None
    tkey2 = (id(tmp_index), tmp_index.version, 5, True, ids.shape)
    assert tkey2 in trainer._fused_cache and tkey not in trainer._fused_cache
    embeds = np.asarray(enc(ids, mask), np.float32)
    _, want_idx = tmp_index.search(embeds, 5, exact=True)
    np.testing.assert_array_equal(res2[1], want_idx)

    del tmp_index
    gc.collect()
    assert tkey2 not in trainer._fused_cache


def test_packed_batch_step_equivalence(world, scfg, tmp_path):
    """The single-transfer packed path (_pack_batch: one flat int32 buffer,
    masks re-derived on device) must produce bit-identical loss and params
    vs the per-array dict path, and must only engage when eligible."""
    from proqa_tpu.data.collate import batch_pad

    sampler = OnlineSampler(
        world["qa_path"], world["tok"], world["db"], world["index"], scfg,
        matched_para_path=world["matched_path"],
    )
    ta = _make_trainer(world, tmp_path, "packA", mesh_size=1)
    tb = _make_trainer(world, tmp_path, "packB", mesh_size=1)
    ta.set_corpus(world["index"])
    tb.set_corpus(world["index"])
    batch = next(iter(sampler.load(ta.query_encoder(), 2, 4)))
    net, rows = batch_pad(batch["net_input"], 4)
    net["question_mask"] = (np.arange(4) < rows).astype(np.int32)

    assert ta._pack_batch(net) is not None, "eligible host batch must pack"
    rng = jax.random.PRNGKey(7)
    ta.state, ca = ta._train_step(ta.state, net, rng)                   # packed
    tb.state, cb = tb._train_step(tb.state, tb._device_batch(net), rng)  # dict
    assert ta._packed_cache, "packed jit must have been built and used"
    np.testing.assert_array_equal(np.asarray(ca["loss"]), np.asarray(cb["loss"]))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ta.state.params, tb.state.params,
    )

    # ineligibility gates: multi-device mesh, float arrays, device arrays
    tmulti = _make_trainer(world, tmp_path, "packM", mesh_size=2)
    assert tmulti._pack_batch(net) is None
    assert ta._pack_batch({**net, "para_embed": np.zeros((4, 2, 16), np.float32)}) is None
    assert ta._pack_batch(ta._device_batch(net)) is None
    # a mask carrying extra information must not be re-derived away
    bad = {**net, "input_mask": net["input_mask"].copy()}
    bad["input_mask"][0, 0, -1] = 1 - bad["input_mask"][0, 0, -1]
    assert ta._pack_batch(bad) is None


def test_retrieval_batch_grouping_same_batches(world, scfg):
    """With a FIXED encoder, retrieving candidates for several train batches
    in one device dispatch (retrieval_batch > questions_per_batch) must yield
    exactly the same batches as per-batch retrieval."""
    import dataclasses

    kw = dict(matched_para_path=world["matched_path"])
    s_plain = OnlineSampler(world["qa_path"], world["tok"], world["db"], world["index"], scfg, **kw)
    grouped_cfg = dataclasses.replace(scfg, retrieval_batch=8)
    s_grouped = OnlineSampler(world["qa_path"], world["tok"], world["db"], world["index"], grouped_cfg, **kw)
    enc = _query_encoder(world)
    want = list(s_plain.load(enc, k=3, questions_per_batch=4))
    got = list(s_grouped.load(enc, k=3, questions_per_batch=4))
    assert len(got) == len(want) and got
    for bg, bw in zip(got, want):
        assert bg["id"] == bw["id"]
        for key in bg["net_input"]:
            np.testing.assert_array_equal(bg["net_input"][key], bw["net_input"][key])
    assert s_grouped.failed_retrieval == s_plain.failed_retrieval


def test_answer_pad_buckets_matches_full_pad(world, scfg, tmp_path):
    """pad_buckets=True (the `proqa serve` setting): a 3-question answer()
    runs its reader forward at the 4-row power-of-two bucket instead of the
    full question_batch=8, with rows identical to the always-full-pad path
    (padding is repeats of row 0, sliced off before decode)."""
    import dataclasses

    trainer = _make_trainer(world, tmp_path, "buckets", mesh_size=1)
    trainer.set_corpus(world["index"])
    qs = [{"question": f"what is about tok{i} tok{i+1}"} for i in range(3)]
    full_cfg = dataclasses.replace(scfg, question_batch=8)
    bucket_cfg = dataclasses.replace(full_cfg, pad_buckets=True)

    shapes = []
    orig = trainer._eval_step

    def spy(params, net):
        shapes.append(net["input_ids"].shape[0])
        return orig(params, net)

    trainer._eval_step = spy
    rows_full = trainer.answer(OnlineSampler(
        qs, world["tok"], world["db"], world["index"], full_cfg), topn=2)
    rows_bucketed = trainer.answer(OnlineSampler(
        qs, world["tok"], world["db"], world["index"], bucket_cfg), topn=2)
    assert shapes == [8, 4]
    assert rows_bucketed == rows_full

    # multi-device DP floor: the bucket may never undercut the data mesh
    # (_eval_step shards the batch dim over it)
    trainer4 = _make_trainer(world, tmp_path, "buckets4", mesh_size=4)
    trainer4.set_corpus(world["index"])
    shapes4 = []
    orig4 = trainer4._eval_step
    trainer4._eval_step = lambda p, net: (
        shapes4.append(net["input_ids"].shape[0]) or orig4(p, net))
    rows_one = trainer4.answer(OnlineSampler(
        qs[:1], world["tok"], world["db"], world["index"], bucket_cfg), topn=2)
    assert shapes4 == [4] and len(rows_one) == 1
