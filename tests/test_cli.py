"""CLI integration: the full minimum end-to-end slice (SURVEY.md §7) through
the `proqa` entry point — pretrain -> build-index -> encode-queries ->
eval-retrieval -> cluster-corpus -> match-paras — on a tiny synthetic world."""
import json
import os

import numpy as np
import pytest

from proqa_tpu.cli.main import main

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [f"tok{i}" for i in range(60)] + [
    "what", "is", "about",
]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_world")
    (root / "vocab.txt").write_text("\n".join(VOCAB) + "\n")

    # pretraining pairs (3 questions per paragraph, filter-passing lengths)
    with open(root / "pairs.jsonl", "w") as f:
        for i in range(30):
            pid = i // 3
            f.write(json.dumps({
                "Question": f"what is about tok{pid} variant {i % 3}",
                "Paragraph": " ".join([f"tok{(pid + j) % 60}" for j in range(25)]),
                "Answer": f"tok{pid + 10}",
            }) + "\n")

    # corpus + sqlite db
    from proqa_tpu.data.docdb import DocDB

    paras = [(f"p{i}", " ".join([f"tok{(i + j) % 60}" for j in range(20)])) for i in range(40)]
    DocDB.create(str(root / "docs.db"), paras).close()
    with open(root / "corpus.jsonl", "w") as f:
        for pid, text in paras:
            f.write(json.dumps({"text": text, "id": pid}) + "\n")

    # eval QA pairs
    with open(root / "qa.jsonl", "w") as f:
        for i in range(8):
            f.write(json.dumps({
                "question": f"what is about tok{i}", "answer": [f"tok{i + 5}"],
            }) + "\n")
    return root


def _common(world):
    return ["--vocab", str(world / "vocab.txt"), "--tiny",
            "--max-seq-length", "64", "--max-query-length", "12"]


def test_cli_pretrain_and_index_pipeline(world, capsys):
    out_dir = str(world / "retriever_run")
    main([
        "pretrain-retriever", *_common(world),
        "--train-file", str(world / "pairs.jsonl"),
        "--predict-file", str(world / "pairs.jsonl"),
        "--output-dir", out_dir,
        "--train-batch-size", "8",
        "--predict-batch-size", "8",
        "--num-train-epochs", "1",
        "--eval-period", "2",
        "--save-checkpoints-steps", "100",
        "--learning-rate", "1e-3",
        "--filter",
    ])
    assert os.path.exists(f"{out_dir}/checkpoint_last.msgpack")
    ckpt = f"{out_dir}/checkpoint_last.msgpack"

    main([
        "build-index", *_common(world),
        "--corpus", str(world / "corpus.jsonl"),
        "--init-checkpoint", ckpt,
        "--output-dir", str(world / "index"),
        "--predict-batch-size", "8",
    ])
    assert os.path.exists(world / "index" / "embeddings.npy")
    assert os.path.exists(world / "index" / "idx_id.json")
    emb = np.load(world / "index" / "embeddings.npy")
    assert emb.shape == (40, 128)

    main([
        "encode-queries", *_common(world),
        "--queries", str(world / "qa.jsonl"),
        "--init-checkpoint", ckpt,
        "--output", str(world / "q.npy"),
        "--predict-batch-size", "8",
    ])
    assert np.load(world / "q.npy").shape == (8, 128)

    main([
        "eval-retrieval",
        str(world / "qa.jsonl"), str(world / "index"), str(world / "q.npy"),
        str(world / "docs.db"), "--topk", "20",
    ])
    out = capsys.readouterr().out
    line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    recalls = json.loads(line)
    assert "recall@20" in recalls and 0.0 <= recalls["recall@20"] <= 1.0

    main([
        "cluster-corpus",
        "--embeddings", str(world / "index" / "embeddings.npy"),
        "--pairs", str(world / "corpus.jsonl"),
        "--output-dir", str(world / "splits"),
        "--ncentroids", "4", "--niter", "5", "--max-points-per-centroid", "1000",
    ])
    shards = os.listdir(world / "splits")
    assert 1 <= len(shards) <= 4
    total = sum(len(open(world / "splits" / s).readlines()) for s in shards)
    assert total == 40

    # ---- phase 2: progressive (cluster-batched) pretraining, the flagship
    # recipe of /root/reference/retrieval/train_retriever_cluster.sh: embed
    # the TRAIN PAIR paragraphs with the phase-1 model, k-means them,
    # re-batch cluster-pure, continue from checkpoint_last ----
    main([
        "build-index", *_common(world),
        "--corpus", str(world / "pairs.jsonl"),   # pair rows: Paragraph field
        "--init-checkpoint", ckpt,
        "--output-dir", str(world / "pair_index"),
        "--predict-batch-size", "8",
    ])
    assert np.load(world / "pair_index" / "embeddings.npy").shape == (30, 128)
    main([
        "cluster-corpus",
        "--embeddings", str(world / "pair_index" / "embeddings.npy"),
        "--pairs", str(world / "pairs.jsonl"),
        "--output-dir", str(world / "pair_splits"),
        "--ncentroids", "2", "--niter", "5", "--max-points-per-centroid", "1000",
    ])
    pair_shards = os.listdir(world / "pair_splits")
    assert sum(
        len(open(world / "pair_splits" / s).readlines()) for s in pair_shards
    ) == 30
    # every shard row is a pair the ClusterPairDataset can consume
    for s in pair_shards:
        for line in open(world / "pair_splits" / s):
            assert "Question" in json.loads(line)

    out2 = str(world / "retriever_run_phase2")
    capsys.readouterr()
    main([
        "pretrain-retriever", *_common(world),
        "--train-file", str(world / "pair_splits"),   # directory -> cluster path
        "--predict-file", str(world / "pairs.jsonl"),
        "--output-dir", out2,
        "--train-batch-size", "8",
        "--predict-batch-size", "8",
        "--num-train-epochs", "1",
        "--eval-period", "2",
        "--save-checkpoints-steps", "100",
        "--learning-rate", "1e-3",
        "--init-checkpoint", ckpt,
    ])
    out = capsys.readouterr().out
    best = json.loads(
        [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    )["best_in_batch_acc"]
    assert 0.0 <= best <= 1.0
    assert os.path.exists(f"{out2}/checkpoint_last.msgpack")

    # phase 2 actually trained starting FROM phase 1: params moved
    from proqa_tpu.cli.main import _load_params
    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.retriever import init_retriever_params

    import jax
    import jax.numpy as jnp

    template = init_retriever_params(
        jax.random.PRNGKey(0), BertConfig.tiny(dtype=jnp.float32)
    )
    p1 = _load_params(ckpt, template)
    p2 = _load_params(f"{out2}/checkpoint_last.msgpack", template)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), p1, p2
    ))
    assert max(diffs) > 0.0, "phase-2 training did not update the parameters"


def test_load_params_ensemble(tmp_path):
    """';'-joined checkpoint paths load as the uniform parameter average
    ("model soup") — the consistent interpretation of the reference's
    ensemble flag (train_retriever.py:123-128 builds a model LIST, but every
    consumer then crashes calling the list as a module)."""
    import jax
    import jax.numpy as jnp

    from proqa_tpu.cli.main import _load_params
    from proqa_tpu.models.bert import BertConfig
    from proqa_tpu.models.retriever import init_retriever_params
    from proqa_tpu.train.checkpoint import save_checkpoint

    cfg = BertConfig.tiny(dtype=jnp.float32)
    a = init_retriever_params(jax.random.PRNGKey(1), cfg)
    b = init_retriever_params(jax.random.PRNGKey(2), cfg)
    pa, pb = str(tmp_path / "a.msgpack"), str(tmp_path / "b.msgpack")
    save_checkpoint(pa, a)
    save_checkpoint(pb, b)

    template = init_retriever_params(jax.random.PRNGKey(0), cfg)
    soup = _load_params(f"{pa};{pb}", template)
    want = jax.tree.map(
        lambda x, y: (np.asarray(x, np.float32) + np.asarray(y, np.float32)) / 2, a, b
    )
    for got, exp in zip(jax.tree.leaves(soup), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(got, np.float32), exp, rtol=1e-6)
    # single path is unchanged by the ensemble machinery
    one = _load_params(pa, template)
    for got, exp in zip(jax.tree.leaves(one), jax.tree.leaves(a)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))


def test_cli_match_paras(world, capsys):
    with open(world / "retrieved.jsonl", "w") as f:
        for _ in range(8):
            f.write(json.dumps({"para_id": [f"p{j}" for j in range(40)]}) + "\n")
    main([
        "match-paras",
        "--retrieved", str(world / "retrieved.jsonl"),
        "--raw-data", str(world / "qa.jsonl"),
        "--output", str(world / "matched.jsonl"),
        "--db", str(world / "docs.db"),
        "--topk", "40",
    ])
    out = capsys.readouterr().out
    cov = json.loads(out.strip().splitlines()[-1])["topk_gold_coverage"]
    assert cov == 1.0


def test_cli_convert_hf(world, tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from proqa_tpu.models.bert import BertConfig

    cfg = BertConfig.tiny()
    hf_cfg = transformers.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
    )
    model = transformers.BertModel(hf_cfg)
    pt = str(tmp_path / "bert.pt")
    torch.save(model.state_dict(), pt)
    out = str(tmp_path / "bert.msgpack")
    main([
        "convert-hf", "--vocab", str(world / "vocab.txt"), "--tiny",
        "--torch-checkpoint", pt, "--kind", "bert", "--output", out,
    ])
    assert os.path.exists(out)


def test_cli_qa_eval_and_finetune(world, capsys):
    """finetune-qa/eval-qa wiring through the CLI on the tiny world (needs
    the index built by the pipeline test)."""
    import pytest as _pytest
    if not os.path.exists(world / "index" / "embeddings.npy"):
        _pytest.skip("index pipeline test must run first")
    ckpt = str(world / "retriever_run" / "checkpoint_last.msgpack")
    common = [
        *_common(world),
        "--predict-file", str(world / "qa.jsonl"),
        "--db", str(world / "docs.db"),
        "--index", str(world / "index"),
        "--retriever-path", ckpt,
        "--train-batch-size", "2",
        "--questions-per-batch", "8",
        "--candidates", "8",
        "--eval-k", "2",
        "--output-dir", str(world / "qa_run"),
    ]
    main(["eval-qa", *common, "--save-pred", str(world / "preds.jsonl")])
    em = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["em"]
    assert 0.0 <= em <= 1.0
    preds = [json.loads(l) for l in open(world / "preds.jsonl")]
    assert len(preds) == 8 and {"question", "answer", "gold", "em"} <= set(preds[0])

    # one-epoch finetune with gold matching over the whole corpus
    with open(world / "qa_matched.jsonl", "w") as f:
        corpus = [json.loads(l) for l in open(world / "corpus.jsonl")]
        for line in open(world / "qa.jsonl"):
            qa = json.loads(line)
            gold = {c["id"]: qa["answer"][0] for c in corpus
                    if qa["answer"][0] in c["text"].split()}
            f.write(json.dumps({"question": qa["question"], "matched_paras": gold}) + "\n")
    main([
        "finetune-qa", *common,
        "--train-file", str(world / "qa.jsonl"),
        "--matched-para-path", str(world / "qa_matched.jsonl"),
        "--num-train-epochs", "1",
        "--learning-rate", "1e-4",
        "--shared-norm", "--fix-para-encoder",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "best_em" in out


def test_cli_finetune_qa_shard_index(world, capsys):
    """finetune-qa over a row-sharded corpus: the rank-head para_rows gather
    runs inside the jitted train step against the MESH-SHARDED embedding
    matrix (DP batch x sharded corpus in one program)."""
    if not os.path.exists(world / "qa_matched.jsonl"):
        pytest.skip("finetune test must run first")
    main([
        "finetune-qa", *_common(world),
        "--predict-file", str(world / "qa.jsonl"),
        "--db", str(world / "docs.db"),
        "--index", str(world / "index"),
        "--retriever-path", str(world / "retriever_run" / "checkpoint_last.msgpack"),
        "--train-batch-size", "2",
        "--questions-per-batch", "8",
        "--candidates", "8",
        "--eval-k", "2",
        "--output-dir", str(world / "qa_run_shard"),
        "--train-file", str(world / "qa.jsonl"),
        "--matched-para-path", str(world / "qa_matched.jsonl"),
        "--num-train-epochs", "1",
        "--learning-rate", "1e-4",
        "--shared-norm", "--fix-para-encoder",
        "--shard-index",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "best_em" in out and 0.0 <= out["best_em"] <= 1.0


def test_cli_answer(world, capsys):
    """`proqa answer`: the inference-only serving path — questions in (no
    gold labels), one JSON line per question with the extracted span and
    ranked candidates out."""
    if not os.path.exists(world / "index" / "embeddings.npy"):
        pytest.skip("index pipeline test must run first")
    ckpt = str(world / "retriever_run" / "checkpoint_last.msgpack")
    common = [
        *_common(world),
        "--db", str(world / "docs.db"),
        "--index", str(world / "index"),
        "--retriever-path", ckpt,
        "--train-batch-size", "2",
        "--candidates", "8",
        "--eval-k", "2",
        "--output-dir", str(world / "qa_answer"),
    ]
    main([
        "answer", *common,
        "--question", "what is about tok3",
        "--question", "what is about tok7",
        "--topn", "2",
    ])
    lines = [l for l in capsys.readouterr().out.strip().splitlines()
             if l.startswith("{")]
    assert len(lines) == 2
    rows = [json.loads(l) for l in lines]
    assert rows[0]["question"] == "what is about tok3"
    assert {"question", "answer", "alpha", "candidates"} <= set(rows[0])
    assert 1 <= len(rows[0]["candidates"]) <= 2
    cand = rows[0]["candidates"][0]
    assert {"answer", "score", "span_score", "rank_score", "passage"} <= set(cand)
    # candidates come ranked by the combined score
    scores = [c["score"] for c in rows[0]["candidates"]]
    assert scores == sorted(scores, reverse=True)

    # file input without gold answers works too
    qfile = world / "serve_q.jsonl"
    with open(qfile, "w") as f:
        f.write(json.dumps({"question": "what is about tok9"}) + "\n")
    main(["answer", *common, "--predict-file", str(qfile)])
    lines = [l for l in capsys.readouterr().out.strip().splitlines()
             if l.startswith("{")]
    assert json.loads(lines[-1])["question"] == "what is about tok9"


def test_cli_answer_stdin_serving(world, capsys, monkeypatch):
    """`proqa answer --stdin`: the warm serving loop — one JSON line per
    stdin question line (raw text or {"question": ...})."""
    import io

    if not os.path.exists(world / "index" / "embeddings.npy"):
        pytest.skip("index pipeline test must run first")
    monkeypatch.setattr("sys.stdin", io.StringIO(
        "what is about tok4\n"
        "\n"  # blank lines are skipped
        "{not json\n"  # malformed json -> error row, loop continues
        + json.dumps({"q": "missing question key"}) + "\n"
        + json.dumps({"question": "what is about tok6"}) + "\n"
    ))
    main([
        "answer", *_common(world),
        "--db", str(world / "docs.db"),
        "--index", str(world / "index"),
        "--retriever-path", str(world / "retriever_run" / "checkpoint_last.msgpack"),
        "--train-batch-size", "2",
        "--candidates", "8",
        "--eval-k", "2",
        "--output-dir", str(world / "qa_serve"),
        "--stdin",
    ])
    lines = [l for l in capsys.readouterr().out.strip().splitlines()
             if l.startswith("{")]
    rows = [json.loads(l) for l in lines]
    answered = [r for r in rows if "question" in r]
    errors = [r for r in rows if "error" in r]
    assert [r["question"] for r in answered] == [
        "what is about tok4", "what is about tok6",
    ]
    assert all("answer" in r and "candidates" in r for r in answered)
    # bad producer lines yield error rows instead of killing the warm loop
    assert len(errors) == 2 and all("input" in e for e in errors)


def test_cli_serve_http(world):
    """The HTTP serving layer: GET/POST /answer against a warm model, batch
    POST, input validation, /healthz — over a real localhost socket."""
    import threading
    import urllib.request

    from proqa_tpu.cli.main import _qa_setup, build_parser
    from proqa_tpu.serving import make_qa_server

    if not os.path.exists(world / "index" / "embeddings.npy"):
        pytest.skip("index pipeline test must run first")
    args = build_parser().parse_args([
        "serve", *_common(world),
        "--db", str(world / "docs.db"),
        "--index", str(world / "index"),
        "--retriever-path", str(world / "retriever_run" / "checkpoint_last.msgpack"),
        "--train-batch-size", "2",
        "--candidates", "8",
        "--eval-k", "2",
        "--output-dir", str(world / "qa_http"),
        "--topn", "2",
    ])
    trainer, make_sampler = _qa_setup(args)
    from proqa_tpu.serving import IndexUpdater

    probe = make_sampler([])
    updater = IndexUpdater(trainer, probe.tokenizer, probe.db, probe.index,
                           max_seq_length=64)
    server = make_qa_server(trainer, make_sampler, port=0, topn=2,
                            updater=updater)
    host, port = server.server_address[:2]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://{host}:{port}"
    try:
        def get(path):
            with urllib.request.urlopen(f"{base}{path}") as r:
                return r.status, json.loads(r.read())

        def post(path, payload):
            req = urllib.request.Request(
                f"{base}{path}", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"}, method="POST",
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        assert get("/healthz") == (200, {"status": "ok"})

        status, row = get("/answer?q=what+is+about+tok3")
        assert status == 200
        assert row["question"] == "what is about tok3"
        assert {"answer", "candidates"} <= set(row)
        assert 1 <= len(row["candidates"]) <= 2

        status, row = post("/answer", {"question": "what is about tok5", "topn": 1})
        assert status == 200 and len(row["candidates"]) == 1

        status, rows = post(
            "/answer", {"questions": ["what is about tok1", "what is about tok2"]}
        )
        assert status == 200 and [r["question"] for r in rows] == [
            "what is about tok1", "what is about tok2",
        ]

        # every answered question rode the MicroBatcher; /stats exposes it
        status, stats = get("/stats")
        assert status == 200
        assert stats["items"] == 4 and stats["batches"] >= 1
        assert stats["max_batch_seen"] >= 2  # the batched POST shared a drain
        assert stats["index_rows"] == len(updater.index)

        assert post("/answer", {})[0] == 400
        assert post("/answer", {"questions": ["", "x"]})[0] == 400
        assert post("/answer", {"questions": []})[0] == 400
        # malformed option values and non-object bodies get structured 400s,
        # never a dropped connection
        assert post("/answer", {"question": "x", "alpha": "high"})[0] == 400
        assert post("/answer", {"question": "x", "topn": None})[0] == 400
        # out-of-range topn is a 400, not a silently-truncated candidate list
        assert post("/answer", {"question": "x", "topn": 0})[0] == 400
        assert post("/answer", {"question": "x", "topn": -1})[0] == 400
        assert post("/answer", 3)[0] == 400
        # GET validates emptiness like POST does
        try:
            get("/answer?q=%20")
            assert False, "blank GET question must 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        status = err = None
        try:
            get("/nope")
        except urllib.error.HTTPError as e:
            status, err = e.code, json.loads(e.read())
        assert status == 404 and "no route" in err["error"]

        # ---- live index updates: /add then /remove, no restart ----
        idx = updater.index
        rows_before = len(idx)
        new_text = "tok50 tok51 tok52 tok53 tok54"
        status, out = post("/add", {"paras": [{"id": "live0", "text": new_text}]})
        assert status == 200 and out["added"] == 1
        assert out["index_rows"] == rows_before + 1 and len(idx) == rows_before + 1
        assert probe.db.get_doc_text("live0") == new_text
        # the add landed the right embedding: the stored row equals a fresh
        # encode of the same text (post-bf16 quantization)
        import jax.numpy as jnp
        import numpy as np
        new_emb = np.asarray(idx.take([idx.n - 1]), np.float32)
        fresh = np.asarray(
            jnp.asarray(updater._encode_texts([new_text]))
            .astype(idx.embeddings.dtype),
            np.float32,
        )
        assert np.array_equal(new_emb, fresh)
        # SOUND retrievability contract (the one tests/test_index_updates.py
        # uses): the live post-add index searches bit-equal to an index
        # rebuilt from scratch that contains the new row. Self-retrieval by
        # the row's own stored embedding is NOT guaranteed under
        # un-normalized inner product — root-caused in round 4
        # (tools/diag_serve_add.py): on this tiny 1-epoch world a neighbor
        # paragraph legitimately outscores the new row's self-score in
        # exact f32, live and rebuilt searches agreeing bit-for-bit.
        from proqa_tpu.index.dense import DenseIndex
        from proqa_tpu.index.idmap import IdMap
        rebuilt = DenseIndex.from_embeddings(
            np.asarray(jnp.asarray(idx.embeddings[: idx.n], jnp.float32)),
            IdMap([idx.id_map[i] for i in range(idx.n)]),
            dtype=idx.embeddings.dtype,
        )
        lv, li = idx.search(new_emb, 5)
        rv, ri = rebuilt.search(new_emb, 5)
        assert np.array_equal(lv, rv) and np.array_equal(li, ri)
        # and the new row IS in the live candidate set at full depth
        fv, fi = idx.search(new_emb, len(idx))
        returned_ids = [idx.id_map[int(r)] for r in fi[0]]
        assert "live0" in returned_ids
        assert np.isfinite(fv[0, returned_ids.index("live0")])
        # the answer path still serves (fused cache re-keys on the new
        # index version rather than serving the pre-add corpus)
        status, row = get("/answer?q=what+is+about+tok50")
        assert status == 200 and row["candidates"]

        status, out = post("/remove", {"ids": ["live0"]})
        assert status == 200 and out["removed"] == 1
        assert len(idx) == rows_before
        assert probe.db.get_doc_text("live0") is None
        _, top = idx.search(new_emb, 1)
        assert idx.id_map[int(top[0, 0])] != "live0"
        status, row = get("/answer?q=what+is+about+tok3")
        assert status == 200 and row["candidates"]

        # validation: malformed bodies are 400s, unknown removals count 0
        assert post("/add", {"paras": []})[0] == 400
        assert post("/add", {"paras": [{"id": "x"}]})[0] == 400
        assert post("/remove", {"ids": []})[0] == 400
        assert post("/remove", {"ids": ["never-there"]})[1]["removed"] == 0
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=5)


def test_cli_build_db(world, capsys, tmp_path):
    main(["build-db", "--corpus", str(world / "corpus.jsonl"),
          "--db", str(tmp_path / "built.db")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["documents"] == 40
    from proqa_tpu.data.docdb import DocDB
    db = DocDB(str(tmp_path / "built.db"))
    assert db.get_doc_text("p3").startswith("tok3")


def test_cli_eval_retrieval_on_the_fly(world, capsys):
    if not os.path.exists(world / "index" / "embeddings.npy"):
        pytest.skip("pipeline test must run first")
    main([
        "eval-retrieval", str(world / "qa.jsonl"), str(world / "index"),
        str(world / "qa.jsonl"),  # jsonl -> on-the-fly encoding
        str(world / "docs.db"), "--topk", "10",
        "--vocab", str(world / "vocab.txt"), "--tiny", "--max-query-length", "12",
        "--init-checkpoint", str(world / "retriever_run" / "checkpoint_last.msgpack"),
    ])
    out = capsys.readouterr().out
    recalls = json.loads([l for l in out.strip().splitlines() if l.startswith("{")][-1])
    assert set(recalls) == {"recall@5", "recall@10"}


def test_cli_shard_index_matches_unsharded(world, capsys):
    """--shard-index (corpus rows sharded over the 8 virtual devices with a
    cross-chip top-k merge) must reproduce the single-device results exactly,
    through both the recall CLI and the one-shot retrieve CLI."""
    if not os.path.exists(world / "index" / "embeddings.npy"):
        pytest.skip("pipeline test must run first")

    def eval_retrieval(extra):
        main([
            "eval-retrieval", str(world / "qa.jsonl"), str(world / "index"),
            str(world / "qa.jsonl"), str(world / "docs.db"), "--topk", "10",
            "--vocab", str(world / "vocab.txt"), "--tiny",
            "--max-query-length", "12",
            "--init-checkpoint", str(world / "retriever_run" / "checkpoint_last.msgpack"),
            *extra,
        ])
        out = capsys.readouterr().out
        return json.loads([l for l in out.strip().splitlines() if l.startswith("{")][-1])

    assert eval_retrieval(["--shard-index"]) == eval_retrieval([])

    def retrieve(extra):
        main([
            "retrieve", *_common(world),
            "--question", "what is about tok7",
            "--index", str(world / "index"),
            "--init-checkpoint", str(world / "retriever_run" / "checkpoint_last.msgpack"),
            "--db", str(world / "docs.db"), "--topk", "4", *extra,
        ])
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert retrieve(["--shard-index"]) == retrieve([])


def test_cli_build_index_dp_encode(world, capsys):
    """--dp-encode (encode batches sharded over the 8 virtual devices) must
    reproduce the single-device index, and rounds the batch size up to a
    device multiple."""
    if not os.path.exists(world / "index" / "embeddings.npy"):
        pytest.skip("pipeline test must run first")
    main([
        "build-index", *_common(world),
        "--corpus", str(world / "corpus.jsonl"),
        "--init-checkpoint", str(world / "retriever_run" / "checkpoint_last.msgpack"),
        "--output-dir", str(world / "index_dp"),
        "--predict-batch-size", "9",  # not a device multiple: must round to 16
        "--dp-encode",
    ])
    out = capsys.readouterr().out
    assert "9 -> 16" in out
    got = np.load(world / "index_dp" / "embeddings.npy")
    want = np.load(world / "index" / "embeddings.npy")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # the bounded-RAM streaming build shards over the mesh too
    main([
        "build-index", *_common(world),
        "--corpus", str(world / "corpus.jsonl"),
        "--init-checkpoint", str(world / "retriever_run" / "checkpoint_last.msgpack"),
        "--output-dir", str(world / "index_dp_stream"),
        "--predict-batch-size", "16",
        "--stream-chunk", "13",  # deliberately ragged chunk boundary
        "--dp-encode",
    ])
    capsys.readouterr()
    got = np.load(world / "index_dp_stream" / "embeddings.npy")
    # the streaming writer stores raw f32 encodes while the in-memory path
    # saves through the bf16 device index — compare at bf16 quantization
    np.testing.assert_allclose(got, want, rtol=8e-3, atol=1e-4)


def test_cli_answer_shard_index(world, capsys):
    """The QA serving path on a sharded index: `proqa answer --shard-index`
    returns the same answers as the unsharded run (fused or fallback path)."""
    if not os.path.exists(world / "index" / "embeddings.npy"):
        pytest.skip("index pipeline test must run first")

    def answer(extra, outdir):
        main([
            "answer", *_common(world),
            "--db", str(world / "docs.db"),
            "--index", str(world / "index"),
            "--retriever-path", str(world / "retriever_run" / "checkpoint_last.msgpack"),
            "--train-batch-size", "2",
            "--candidates", "8",
            "--eval-k", "2",
            "--output-dir", str(world / outdir),
            "--question", "what is about tok8",
            "--topn", "2", *extra,
        ])
        lines = [l for l in capsys.readouterr().out.strip().splitlines()
                 if l.startswith("{")]
        return json.loads(lines[-1])

    sharded = answer(["--shard-index"], "qa_shard")
    plain = answer([], "qa_noshard")
    assert sharded == plain


def test_cli_convert_trec_and_msmarco(tmp_path, capsys):
    (tmp_path / "collection.tsv").write_text("0\tpassage a\n1\tpassage b\n")
    (tmp_path / "queries.tsv").write_text("5\thello?\n")
    (tmp_path / "qrels.tsv").write_text("5\t0\t1\t1\n")
    main([
        "convert-trec", "--collection", str(tmp_path / "collection.tsv"),
        "--corpus-out", str(tmp_path / "corpus.jsonl"),
        "--qrels", str(tmp_path / "qrels.tsv"), "--queries", str(tmp_path / "queries.tsv"),
        "--labels-out", str(tmp_path / "labels.jsonl"),
    ])
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[0])["corpus_rows"] == 2
    assert json.loads(out[1])["labeled_queries"] == 1

    marco = {"answers": {"0": ["yes"]}, "query": {"0": "q"},
             "passages": {"0": [{"is_selected": 1, "passage_text": "p"}]}}
    json.dump(marco, open(tmp_path / "m.json", "w"))
    main(["convert-msmarco", "--input", str(tmp_path / "m.json"),
          "--output", str(tmp_path / "m_out.jsonl")])
    assert json.loads(capsys.readouterr().out.strip())["qa_pairs"] == 1


def test_cli_retrieve_one_shot(world, capsys):
    if not os.path.exists(world / "index" / "embeddings.npy"):
        pytest.skip("pipeline test must run first")
    main([
        "retrieve", *_common(world),
        "--question", "what is about tok3",
        "--index", str(world / "index"),
        "--init-checkpoint", str(world / "retriever_run" / "checkpoint_last.msgpack"),
        "--db", str(world / "docs.db"), "--topk", "3",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["question"] == "what is about tok3"
    assert len(out["topk"]) == 3
    hit = out["topk"][0]
    assert {"row", "score", "id", "text"} <= set(hit)
    assert hit["id"].startswith("p") and hit["text"]
    # scores descending
    scores = [r["score"] for r in out["topk"]]
    assert scores == sorted(scores, reverse=True)
