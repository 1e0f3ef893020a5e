"""`proqa` CLI — one typed entry point replacing the reference's per-script
argparse files and shell recipes (retrieval/config.py, qa/config.py, the four
*.sh launchers).

Subcommands (mapping to SURVEY.md §3 workloads):
  pretrain-retriever   contrastive bi-encoder pretraining (§3.1)
  build-index          corpus -> dense index artifacts (§3.2)
  encode-queries       questions -> query embedding .npy (§3.2)
  eval-retrieval       recall@k over the index (§3.3)
  retrieve             one-shot question -> top-k paragraphs
  cluster-corpus       k-means + per-cluster pretraining shards (group_paras)
  match-paras          weak-supervision gold-para matching (prepro_dense)
  finetune-qa          joint retrieve+read training (§3.4)
  eval-qa              EM eval with the rank/span alpha sweep
  answer               inference-only QA: question(s) -> answer spans
  serve                warm HTTP QA serving (GET/POST /answer)
  convert-hf           torch BERT/retriever checkpoint -> our params
  convert-trec / convert-msmarco   dataset converters
  build-db             jsonl corpus -> sqlite document store
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _bert_cfg(args, flash_default: bool = False):
    import dataclasses

    import jax.numpy as jnp

    from proqa_tpu.models.bert import BertConfig

    dtype = jnp.float32 if getattr(args, "f32", False) else jnp.bfloat16
    cfg = BertConfig.tiny(dtype=dtype) if args.tiny else BertConfig(dtype=dtype)
    flash = getattr(args, "flash_attention", None)
    if flash is None:
        flash = flash_default
    remat = getattr(args, "remat", True)  # required for base-size training on v5e
    return dataclasses.replace(cfg, flash_attention=flash, remat=remat)


def _tokenizer(args):
    from proqa_tpu.text.wordpiece import BertTokenizer

    return BertTokenizer.from_vocab_file(args.vocab, do_lower_case=not args.cased)


def _load_params(path: str, template):
    """Load bare params or a full TrainState msgpack into a params template.

    A ';'-joined path list loads a checkpoint ENSEMBLE as the uniform
    parameter average ("model soup"). The reference accepts ';'-joined
    checkpoints too (train_retriever.py:123-128 builds a model list) but
    every consumer then crashes calling the list as a module
    (train_retriever.py:294-301, get_embed.py:143-149); parameter averaging
    is the one interpretation consistent with the rest of its pipeline
    (every downstream artifact — index, retrieval, QA — assumes ONE
    embedding space)."""
    import numpy as np
    from flax import serialization

    def _one(p):
        with open(p, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        if isinstance(raw, dict) and set(raw.keys()) == {"step", "params", "opt_state"}:
            raw = raw["params"]
        return serialization.from_state_dict(template, raw)

    paths = [p for p in path.split(";") if p]
    if len(paths) == 1:
        return _one(paths[0])
    import jax

    loaded = [_one(p) for p in paths]

    def _avg(*xs):
        first = np.asarray(xs[0])
        # ints/bools (e.g. step counters) can't be averaged; every float
        # family (incl. ml_dtypes bf16, whose kind isn't 'f' everywhere)
        # goes through an f32 mean and back to its own dtype
        if np.issubdtype(first.dtype, np.integer) or first.dtype == np.bool_:
            return xs[0]
        acc = np.mean(np.stack([np.asarray(x).astype(np.float32) for x in xs]), axis=0)
        return acc.astype(first.dtype)

    return jax.tree.map(_avg, *loaded)


def _save_params(path: str, params):
    from proqa_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(path, params)


def _dp_encode_mesh(args):
    """Mesh + adjusted batch size for --dp-encode: shard encode batches over
    all local devices (the index-build throughput axis on a v5e-8). The
    batch size is rounded up to a device multiple so pjit shards evenly."""
    if not getattr(args, "dp_encode", False):
        return None, args.predict_batch_size
    import jax

    from proqa_tpu.parallel import make_mesh

    mesh = make_mesh()
    n_dev = len(jax.devices())
    bsz = -(-args.predict_batch_size // n_dev) * n_dev
    if bsz != args.predict_batch_size:
        print(f"predict-batch-size {args.predict_batch_size} -> {bsz} "
              f"(multiple of {n_dev} devices)")
    return mesh, bsz


def _index_mesh(args):
    """Mesh for --shard-index: shard the corpus embedding matrix over all
    local devices (ICI at scale); None keeps the single-device layout."""
    if not getattr(args, "shard_index", False):
        return None
    from proqa_tpu.parallel import make_mesh

    return make_mesh()


def _shard_index_arg(p):
    p.add_argument("--shard-index", action="store_true",
                   help="shard the index rows over all local devices "
                        "(cross-chip top-k merge over ICI)")
    p.add_argument("--int8-index", action="store_true",
                   help="store the index block-int8-quantized: half the "
                        "HBM (67.2M rows/chip at D=128 on 16 GiB), search "
                        "exact w.r.t. the quantized scores")


def _index_dtype(args, default):
    """Index storage dtype: --int8-index wins over the f32/bf16 policy."""
    return "int8" if getattr(args, "int8_index", False) else default


def _add_common(p):
    p.add_argument("--vocab", required=True, help="wordpiece vocab file")
    p.add_argument("--cased", action="store_true")
    p.add_argument("--profile-dir", default="",
                   help="capture a jax.profiler device trace of a few warm "
                        "train steps into this directory (xprof/tensorboard)")
    p.add_argument("--tiny", action="store_true", help="tiny model (smoke tests)")
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--max-seq-length", type=int, default=512)
    p.add_argument("--max-query-length", type=int, default=30)
    p.add_argument("--flash-attention", action="store_true", default=None,
                   help="fused attention kernel (ops/pallas_attention.py; "
                        "default on for encode/index commands; supports "
                        "in-kernel attention-prob dropout for training)")
    p.add_argument("--no-remat", dest="remat", action="store_false", default=True)
    p.add_argument("--f32", action="store_true",
                   help="float32 activations + index scoring (bit-reproducible "
                        "parity runs; default bf16 is the TPU production path)")


def cmd_pretrain_retriever(args):
    import os

    import jax

    from proqa_tpu.data.datasets import (
        ClusterPairDataset, PairDataset, cluster_batch_order, grouped_shuffle_order,
    )
    from proqa_tpu.data.loader import BatchLoader
    from proqa_tpu.models.retriever import init_retriever_params
    from proqa_tpu.train.retriever_trainer import RetrieverTrainer, RetrieverTrainerConfig

    cfg = _bert_cfg(args, flash_default=True)  # fused kernel beats library flash AND applies attention dropout (446 vs 500 ms step)
    tok = _tokenizer(args)
    tcfg = RetrieverTrainerConfig(
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        max_grad_norm=args.max_grad_norm,
        adam_eps=args.adam_eps,
        accumulate_gradients=args.accumulate_gradients,
        num_train_epochs=args.num_train_epochs,
        eval_period=args.eval_period,
        save_checkpoints_steps=args.save_checkpoints_steps,
        wait_step=args.wait_step,
        warmup_steps=args.warmup_steps,
        seed=args.seed,
        output_dir=args.output_dir,
        profile_dir=args.profile_dir,
    )
    params = None
    if args.init_checkpoint:
        template = init_retriever_params(jax.random.PRNGKey(0), cfg)
        params = _load_params(args.init_checkpoint, template)
    trainer = RetrieverTrainer(cfg, tcfg, params=params)
    if args.resume:
        trainer.resume(args.resume)

    is_cluster = os.path.isdir(args.train_file)
    if is_cluster:
        train_ds = ClusterPairDataset(
            tok, args.train_file, args.max_query_length, args.max_seq_length, args.filter
        )
    else:
        train_ds = PairDataset(
            tok, args.train_file, args.max_query_length, args.max_seq_length, args.filter
        )
    eval_ds = PairDataset(tok, args.predict_file, args.max_query_length, args.max_seq_length)

    import random as _random

    def train_batches(epoch):
        rng = _random.Random(args.seed + epoch)
        order = (
            cluster_batch_order(train_ds, args.train_batch_size, rng)
            if is_cluster else grouped_shuffle_order(train_ds, rng)
        )
        return BatchLoader(
            train_ds.batches(order, args.train_batch_size, drop_last=True), prefetch=4
        )

    def eval_batches():
        return BatchLoader(
            eval_ds.batches(list(range(len(eval_ds))), args.predict_batch_size), prefetch=4
        )

    best = trainer.train(train_batches, eval_batches)
    print(json.dumps({"best_in_batch_acc": best}))


def cmd_build_index(args):
    import jax

    from proqa_tpu.index.build import build_index
    from proqa_tpu.models.retriever import init_retriever_params

    cfg = _bert_cfg(args, flash_default=True)
    tok = _tokenizer(args)
    template = init_retriever_params(jax.random.PRNGKey(0), cfg)
    params = _load_params(args.init_checkpoint, template)
    mesh, batch_size = _dp_encode_mesh(args)
    index = build_index(
        params, cfg, args.corpus,
        tokenizer=tok, max_length=args.max_seq_length,
        batch_size=batch_size, save_path=args.output_dir,
        dtype=cfg.dtype, stream_chunk=args.stream_chunk, mesh=mesh,
    )
    print(json.dumps({"rows": len(index), "dim": index.dim, "saved": args.output_dir}))


def cmd_encode_queries(args):
    import jax

    from proqa_tpu.data.datasets import EncodeDataset
    from proqa_tpu.index.build import encode_corpus
    from proqa_tpu.models.retriever import init_retriever_params

    cfg = _bert_cfg(args, flash_default=True)
    tok = _tokenizer(args)
    template = init_retriever_params(jax.random.PRNGKey(0), cfg)
    params = _load_params(args.init_checkpoint, template)
    ds = EncodeDataset(tok, args.queries, max_query_length=args.max_query_length, is_query=True)
    mesh, batch_size = _dp_encode_mesh(args)
    emb = encode_corpus(params, cfg, ds, batch_size=batch_size, is_query=True, mesh=mesh)
    np.save(args.output, emb)
    print(json.dumps({"queries": int(emb.shape[0]), "saved": args.output}))


def cmd_eval_retrieval(args):
    import jax

    from proqa_tpu.data.docdb import DocDB
    from proqa_tpu.index.dense import DenseIndex
    from proqa_tpu.index.recall import evaluate_retrieval

    import jax.numpy as jnp

    index = DenseIndex.load(
        args.index,
        dtype=_index_dtype(args, jnp.float32 if args.f32 else jnp.bfloat16),
        mesh=_index_mesh(args),
    )
    db = DocDB(args.db)
    if args.query_embed.endswith(".npy"):
        q = np.load(args.query_embed)
    else:
        # raw {"question"} jsonl: encode on the fly (needs --vocab/--init-checkpoint)
        assert args.vocab and args.init_checkpoint, (
            "encoding queries on the fly requires --vocab and --init-checkpoint"
        )
        from proqa_tpu.data.datasets import EncodeDataset
        from proqa_tpu.index.build import encode_corpus
        from proqa_tpu.models.retriever import init_retriever_params

        cfg = _bert_cfg(args, flash_default=True)
        params = _load_params(
            args.init_checkpoint, init_retriever_params(jax.random.PRNGKey(0), cfg)
        )
        ds = EncodeDataset(
            _tokenizer(args), args.query_embed,
            max_query_length=args.max_query_length, is_query=True,
        )
        q = encode_corpus(params, cfg, ds, batch_size=256, is_query=True, buckets=None)
    recalls = evaluate_retrieval(
        args.raw_data, index, q, db, topk=args.topk, num_workers=args.num_workers
    )
    for k, v in sorted(recalls.items()):
        print(f"Top {k} Recall: {v:.4f}")
    print(json.dumps({f"recall@{k}": v for k, v in recalls.items()}))


def cmd_retrieve(args):
    """One-shot interactive retrieval: encode a question, search the index,
    print the top-k paragraphs. (No reference analogue — quality-of-life on
    top of the same encode->search path eval-retrieval uses.)"""
    import jax

    from proqa_tpu.data.docdb import DocDB
    from proqa_tpu.index.dense import DenseIndex
    from proqa_tpu.models.retriever import encode_query, init_retriever_params

    import jax.numpy as jnp

    cfg = _bert_cfg(args, flash_default=True)
    tok = _tokenizer(args)
    params = _load_params(
        args.init_checkpoint, init_retriever_params(jax.random.PRNGKey(0), cfg)
    )
    index = DenseIndex.load(
        args.index,
        dtype=_index_dtype(args, jnp.float32 if args.f32 else jnp.bfloat16),
        mesh=_index_mesh(args),
    )
    db = DocDB(args.db) if args.db else None

    ids = tok.encode(args.question, max_length=args.max_query_length)
    ids = ids + [0] * (args.max_query_length - len(ids))
    q = encode_query(
        params, cfg, jnp.asarray([ids], jnp.int32),
        jnp.asarray([[1 if t else 0 for t in ids]], jnp.int32),
    )
    vals, rows = index.search(q, args.topk)  # search casts to scoring dtype
    vals, rows = np.asarray(vals)[0], np.asarray(rows)[0]
    results = []
    for score, row in zip(vals, rows):
        rec = {"row": int(row), "score": round(float(score), 4)}
        if index.id_map is not None:
            rec["id"] = index.id_map[int(row)]
            if db is not None:
                text = db.get_doc_text(rec["id"])
                rec["text"] = text[:300] if text else None
        results.append(rec)
    print(json.dumps({"question": args.question, "topk": results}, ensure_ascii=False))


def cmd_cluster_corpus(args):
    from proqa_tpu.index.cluster import cluster_corpus_embeddings, write_cluster_shards

    emb = np.load(args.embeddings)
    assignments = cluster_corpus_embeddings(
        emb, args.ncentroids, niter=args.niter,
        max_points_per_centroid=args.max_points_per_centroid,
        spherical=args.spherical, seed=args.seed,
    )
    n = write_cluster_shards(args.pairs, assignments, args.output_dir)
    # shard-size histogram: collapse visibility at scale (a handful of giant
    # clusters starves the cluster-pure batch sampler of negatives)
    sizes = np.bincount(assignments, minlength=args.ncentroids)
    nonzero = np.sort(sizes[sizes > 0])
    print(json.dumps({
        "shards": n, "ncentroids": args.ncentroids,
        "shard_sizes": {
            "min": int(nonzero[0]) if n else 0,
            "p50": int(np.median(nonzero)) if n else 0,
            "p99": int(np.percentile(nonzero, 99)) if n else 0,
            "max": int(nonzero[-1]) if n else 0,
            "empty": int((sizes == 0).sum()),
        },
    }))


def cmd_match_paras(args):
    from proqa_tpu.qa.prepro import process_ground_paras

    coverage = process_ground_paras(
        args.retrieved, args.raw_data, args.output, args.db,
        k=args.topk, match="regex" if args.regex else "string",
        num_workers=args.num_workers,
    )
    print(json.dumps({"topk_gold_coverage": coverage}))


def _qa_setup(args):
    import jax

    from proqa_tpu.data.docdb import DocDB
    from proqa_tpu.index.dense import DenseIndex
    from proqa_tpu.models.reader import QAConfig, init_qa_params
    from proqa_tpu.qa.sampler import OnlineSampler, OnlineSamplerConfig
    from proqa_tpu.train.qa_trainer import QATrainer, QATrainerConfig

    cfg = _bert_cfg(args, flash_default=True)  # in-kernel attention dropout: training parity at flash speed
    tok = _tokenizer(args)
    qcfg = QAConfig(
        shared_norm=args.shared_norm, separate=args.separate,
        add_select=args.add_select, drop_early=args.drop_early, qa_drop=args.qa_drop,
    )
    # the question batch shards over the data mesh and splits into grad-accum
    # microbatches: round up to a multiple of both
    n_dev = len(jax.devices())
    mult = n_dev * max(1, args.accumulate_gradients)
    qpb = -(-args.questions_per_batch // mult) * mult
    if qpb != args.questions_per_batch:
        print(f"questions-per-batch {args.questions_per_batch} -> {qpb} "
              f"(multiple of {n_dev} devices x {max(1, args.accumulate_gradients)} microbatches)")
    args.questions_per_batch = qpb
    tcfg = QATrainerConfig(
        learning_rate=args.learning_rate,
        accumulate_gradients=args.accumulate_gradients,
        prefetch_batches=args.prefetch,
        num_train_epochs=args.num_train_epochs,
        eval_period=args.eval_period,
        wait_step=args.wait_step,
        eval_k=args.eval_k,
        train_k=args.train_batch_size,
        questions_per_batch=args.questions_per_batch,
        fix_para_encoder=args.fix_para_encoder,
        freeze_retriever=args.fix_retriever,
        regex=args.regex,
        seed=args.seed,
        output_dir=args.output_dir,
        do_lower_case=not args.cased,
        weight_decay=args.weight_decay,
        max_grad_norm=args.max_grad_norm,
        adam_eps=args.adam_eps,
        max_answer_len=args.max_answer_len,
        profile_dir=args.profile_dir,
    )
    params = init_qa_params(jax.random.PRNGKey(args.seed), cfg, qcfg)
    if args.retriever_path:
        from proqa_tpu.models.retriever import init_retriever_params

        params["retriever"] = _load_params(
            args.retriever_path, init_retriever_params(jax.random.PRNGKey(0), cfg)
        )
    if args.reader_path:
        # pretrained reader tower (e.g. a converted SpanBERT — the reference's
        # --use-spanbert path, bert_retrieve_qa.py:24-25; pair with --cased)
        from proqa_tpu.models.bert import init_bert_params

        params["bert"] = _load_params(
            args.reader_path, init_bert_params(jax.random.PRNGKey(0), cfg)
        )
    if args.init_checkpoint:
        params = _load_params(args.init_checkpoint, params)
    trainer = QATrainer(cfg, qcfg, tcfg, params=params)

    db = DocDB(args.db)
    # dtype=cfg.dtype: --f32 must reach the index too (bit-reproducible
    # parity runs score in f32 end-to-end, like eval-retrieval/retrieve do)
    index = DenseIndex.load(
        args.index, mesh=_index_mesh(args), dtype=_index_dtype(args, cfg.dtype)
    )
    if args.use_ivf:
        # reference online-QA retrieval config (IVF nlist=100, nprobe=20)
        index = index.to_ivf(nlist=args.ivf_nlist, nprobe=args.ivf_nprobe)
    scfg = OnlineSamplerConfig(
        max_query_length=args.max_query_length,
        max_length=args.max_seq_length,
        candidates=args.candidates,
        regex=args.regex,
        question_batch=args.questions_per_batch,
        retrieval_batch=args.retrieval_batch,
        # IVF is a coarse-quantized (approximate) search by construction:
        # exact=True would bypass the quantizer entirely, silently turning
        # --use-ivf into a no-op (round-1 advisor finding)
        exact_search=not (args.approx_search or args.use_ivf),
    )
    make_sampler = lambda raw, matched="": OnlineSampler(
        raw, tok, db, index, scfg, matched_para_path=matched
    )
    return trainer, make_sampler


def cmd_finetune_qa(args):
    trainer, make_sampler = _qa_setup(args)
    if args.resume:
        trainer.resume(args.resume)
    train_sampler = make_sampler(args.train_file, args.matched_para_path)
    eval_sampler = make_sampler(args.predict_file)
    best = trainer.train(train_sampler, eval_sampler)
    print(json.dumps({"best_em": best}))


def cmd_eval_qa(args):
    trainer, make_sampler = _qa_setup(args)
    em = trainer.predict(
        make_sampler(args.predict_file),
        save_path=args.save_pred or None,
        save_all_prefix=args.save_all or None,
    )
    print(json.dumps({"em": em}))


def cmd_answer(args):
    """Open-domain QA serving: retrieve top paragraphs, read, extract the
    best answer span per question; one JSON line per question. The reference
    has no inference-only entry point (qa/train_retrieve_qa.py only batch-
    evals against gold answers); this drives the same retrieve->read->decode
    path for questions without labels."""
    if not (args.question or args.predict_file or args.stdin):
        raise SystemExit(
            "answer: provide --question (repeatable), --predict-file, or --stdin"
        )
    trainer, make_sampler = _qa_setup(args)
    if args.stdin:
        # warm serving loop: one JSON line out per question line in; params
        # and compiled encode/search/read dispatch caches stay warm across
        # questions (a fresh CLI invocation pays ~30s jax init + compiles)
        import sys

        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            try:
                q = json.loads(line)["question"] if line.startswith("{") else line
                if not isinstance(q, str) or not q.strip():
                    raise ValueError("question must be a non-empty string")
            except (ValueError, KeyError) as e:
                # one bad producer line must not kill the warm loop (it would
                # forfeit the ~30s jax init + compiles the loop amortizes)
                print(json.dumps({"error": f"{type(e).__name__}: {e}",
                                  "input": line[:200]}), flush=True)
                continue
            sampler = make_sampler([{"question": q}])
            for row in trainer.answer(sampler, alpha=args.alpha, topn=args.topn):
                print(json.dumps(row, ensure_ascii=False), flush=True)
        return
    data = (
        [{"question": q} for q in args.question]
        if args.question else args.predict_file
    )
    sampler = make_sampler(data)
    for row in trainer.answer(sampler, alpha=args.alpha, topn=args.topn):
        print(json.dumps(row, ensure_ascii=False))


def cmd_serve(args):
    """HTTP QA serving: model + device-resident index + compiled dispatches
    stay warm across requests (serving.py; the reference has no serving
    layer, SURVEY §1)."""
    from proqa_tpu.serving import IndexUpdater, make_qa_server, warmup_buckets

    import dataclasses

    from proqa_tpu.qa.sampler import OnlineSampler

    trainer, make_sampler = _qa_setup(args)
    # serving sampler: groups of up to --max-batch questions (one MicroBatcher
    # drain = one encode+search + one reader dispatch), padded to power-of-two
    # buckets so a lone request rides a 1-row dispatch
    sampler_probe = make_sampler([])
    serve_scfg = dataclasses.replace(
        sampler_probe.cfg, question_batch=max(args.max_batch, 1),
        pad_buckets=True,
    )
    serve_tok = _tokenizer(args)  # built once, reused by every drain
    make_serve_sampler = lambda raw: OnlineSampler(
        raw, serve_tok, sampler_probe.db, sampler_probe.index, serve_scfg,
    )
    if args.warmup:
        # pay jit compiles before accepting traffic — once per power-of-two
        # bucket the MicroBatcher can drain (each is a distinct signature)
        for b in warmup_buckets(serve_scfg.question_batch):
            trainer.answer(
                make_serve_sampler([{"question": args.warmup}] * b),
                alpha=args.alpha, topn=args.topn,
            )
    # live /add + /remove: mutations need the unsharded dense index (the
    # sampler closure holds it; reconstruct the handles the same way)
    updater = IndexUpdater(
        trainer, serve_tok, sampler_probe.db, sampler_probe.index,
        max_seq_length=args.max_seq_length,
    )
    server = make_qa_server(
        trainer, make_serve_sampler, host=args.host, port=args.port,
        alpha=args.alpha, topn=args.topn, logger=trainer.logger,
        updater=updater, max_batch=args.max_batch,
    )
    host, port = server.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}/answer"}), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


def cmd_convert_hf(args):
    from proqa_tpu.models.hf_convert import (
        bert_params_from_state_dict, load_torch_checkpoint,
        retriever_params_from_state_dict, strip_ddp_prefix,
    )

    cfg = _bert_cfg(args)
    state = load_torch_checkpoint(
        args.torch_checkpoint, allow_pickle=args.allow_pickle
    )
    if args.kind == "retriever":
        params = retriever_params_from_state_dict(state, cfg)
    else:
        params = bert_params_from_state_dict(strip_ddp_prefix(state), cfg)
    _save_params(args.output, params)
    print(json.dumps({"saved": args.output, "kind": args.kind}))


def cmd_convert_trec(args):
    from proqa_tpu.data.converters import trec_extract_labels, trec_prepare_corpus

    if args.collection:
        n = trec_prepare_corpus(args.collection, args.corpus_out)
        print(json.dumps({"corpus_rows": n}))
    if args.qrels:
        n = trec_extract_labels(args.qrels, args.queries, args.labels_out)
        print(json.dumps({"labeled_queries": n}))


def cmd_convert_msmarco(args):
    from proqa_tpu.data.converters import msmarco_extract_qa

    n = msmarco_extract_qa(args.input, args.output)
    print(json.dumps({"qa_pairs": n}))


def cmd_build_db(args):
    """{"text", ["id"]} jsonl corpus -> sqlite document store (the nq_paras.db
    artifact the reference assumes pre-built)."""
    import json as _json

    from proqa_tpu.data.docdb import DocDB

    def rows():
        with open(args.corpus) as f:
            for i, line in enumerate(f):
                if not line.strip():
                    continue
                row = _json.loads(line)
                yield str(row.get("id", i)), row["text"]

    db = DocDB.create(args.db, rows())
    print(json.dumps({"documents": len(db), "db": args.db}))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="proqa", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("pretrain-retriever")
    _add_common(sp)
    sp.add_argument("--train-file", required=True, help="pairs jsonl or cluster-shard dir")
    sp.add_argument("--predict-file", required=True)
    sp.add_argument("--output-dir", default="logs/retriever")
    sp.add_argument("--init-checkpoint", default="")
    sp.add_argument("--resume", default="")
    sp.add_argument("--train-batch-size", type=int, default=80)
    sp.add_argument("--predict-batch-size", type=int, default=100)
    sp.add_argument("--learning-rate", type=float, default=1e-5)
    sp.add_argument("--weight-decay", type=float, default=0.0)
    sp.add_argument("--max-grad-norm", type=float, default=5.0)
    sp.add_argument("--adam-eps", type=float, default=1e-8)
    sp.add_argument("--accumulate-gradients", type=int, default=1)
    sp.add_argument("--num-train-epochs", type=int, default=100)
    sp.add_argument("--eval-period", type=int, default=2500,
                    help="steps between dev evals; <=0: epoch end only")
    sp.add_argument("--save-checkpoints-steps", type=int, default=20000,
                    help="steps between numbered checkpoints; <=0: none")
    sp.add_argument("--wait-step", type=int, default=100)
    sp.add_argument("--warmup-steps", type=int, default=0)
    sp.add_argument("--filter", action="store_true")
    sp.set_defaults(fn=cmd_pretrain_retriever)

    sp = sub.add_parser("build-index")
    _add_common(sp)
    sp.add_argument("--corpus", required=True, help='{"text", ["id"]} jsonl')
    sp.add_argument("--init-checkpoint", required=True)
    sp.add_argument("--output-dir", required=True)
    sp.add_argument("--predict-batch-size", type=int, default=512)
    sp.add_argument("--stream-chunk", type=int, default=0,
                    help="rows per streaming chunk: bounded-RAM build writing "
                         "embeddings.npy incrementally (0 = in-memory build)")
    sp.add_argument("--dp-encode", action="store_true",
                    help="shard encode batches over all local devices")
    sp.set_defaults(fn=cmd_build_index)

    sp = sub.add_parser("encode-queries")
    _add_common(sp)
    sp.add_argument("--queries", required=True, help='{"question"} jsonl')
    sp.add_argument("--init-checkpoint", required=True)
    sp.add_argument("--output", required=True, help=".npy path")
    sp.add_argument("--predict-batch-size", type=int, default=512)
    sp.add_argument("--dp-encode", action="store_true",
                    help="shard encode batches over all local devices")
    sp.set_defaults(fn=cmd_encode_queries)

    sp = sub.add_parser("eval-retrieval")
    sp.add_argument("raw_data")
    sp.add_argument("index", help="index dir or embeddings .npy")
    sp.add_argument("query_embed",
                    help="query embeddings .npy, or a {'question'} jsonl to encode on the fly")
    sp.add_argument("db")
    sp.add_argument("--topk", type=int, default=80)
    sp.add_argument("--num-workers", type=int, default=0)
    sp.add_argument("--vocab", default="")
    sp.add_argument("--init-checkpoint", default="")
    sp.add_argument("--cased", action="store_true")
    sp.add_argument("--tiny", action="store_true")
    sp.add_argument("--max-query-length", type=int, default=30)
    sp.add_argument("--f32", action="store_true",
                    help="float32 index scoring (parity runs)")
    _shard_index_arg(sp)
    sp.set_defaults(fn=cmd_eval_retrieval)

    sp = sub.add_parser("retrieve", help="one-shot question -> top-k paragraphs")
    _add_common(sp)
    sp.add_argument("--question", required=True)
    sp.add_argument("--index", required=True)
    sp.add_argument("--init-checkpoint", required=True)
    sp.add_argument("--db", default="", help="sqlite doc store (adds text previews)")
    sp.add_argument("--topk", type=int, default=5)
    _shard_index_arg(sp)
    sp.set_defaults(fn=cmd_retrieve)

    sp = sub.add_parser("cluster-corpus")
    sp.add_argument("--embeddings", required=True, help="pair-paragraph embeds .npy")
    sp.add_argument("--pairs", required=True, help="pretraining pairs jsonl")
    sp.add_argument("--output-dir", required=True)
    sp.add_argument("--ncentroids", type=int, default=10000)
    sp.add_argument("--niter", type=int, default=250)
    sp.add_argument("--max-points-per-centroid", type=int, default=1000)
    sp.add_argument("--spherical", action="store_true")
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_cluster_corpus)

    sp = sub.add_parser("match-paras")
    sp.add_argument("--retrieved", required=True)
    sp.add_argument("--raw-data", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--db", required=True)
    sp.add_argument("--topk", type=int, default=10000)
    sp.add_argument("--regex", action="store_true")
    sp.add_argument("--num-workers", type=int, default=0)
    sp.set_defaults(fn=cmd_match_paras)

    _QA_HELP = {
        "answer": "question(s) -> extracted answer spans (inference only)",
        "serve": "warm HTTP QA serving (GET/POST /answer; see serving.py)",
    }
    for name, fn in (
        ("finetune-qa", cmd_finetune_qa),
        ("eval-qa", cmd_eval_qa),
        ("answer", cmd_answer),
        ("serve", cmd_serve),
    ):
        sp = sub.add_parser(name, help=_QA_HELP.get(name))
        _add_common(sp)
        sp.add_argument("--train-file", default="")
        sp.add_argument("--predict-file",
                        required=name not in ("answer", "serve"), default="",
                        help="jsonl of {question[, answer]}" if name == "answer" else None)
        sp.add_argument("--db", required=True)
        sp.add_argument("--index", required=True)
        sp.add_argument("--matched-para-path", default="")
        sp.add_argument("--output-dir", default="logs/qa")
        sp.add_argument("--init-checkpoint", default="")
        sp.add_argument("--retriever-path", default="")
        sp.add_argument("--reader-path", default="",
                        help="pretrained reader BERT (e.g. converted SpanBERT; use with --cased)")
        sp.add_argument("--train-batch-size", type=int, default=5, help="k paras/question")
        sp.add_argument("--questions-per-batch", type=int, default=1)
        sp.add_argument("--candidates", type=int, default=5000)
        sp.add_argument("--retrieval-batch", type=int, default=0,
                        help="questions retrieved per device dispatch during "
                             "training (0 = questions-per-batch); larger "
                             "amortizes dispatch latency, candidates go up "
                             "to retrieval-batch/questions-per-batch steps "
                             "stale")
        sp.add_argument("--eval-k", type=int, default=5)
        sp.add_argument("--learning-rate", type=float, default=1e-5)
        sp.add_argument("--weight-decay", type=float, default=0.0)
        sp.add_argument("--max-grad-norm", type=float, default=5.0)
        sp.add_argument("--adam-eps", type=float, default=1e-8)
        sp.add_argument("--max-answer-len", type=int, default=10,
                        help="max answer span in wordpieces at decode; the "
                             "reference hardcodes 10 despite its flag's "
                             "default 20 (train_retrieve_qa.py:301)")
        sp.add_argument("--accumulate-gradients", type=int, default=1,
                        help="grad-accum microbatches per optimizer step")
        sp.add_argument("--prefetch", type=int, default=2,
                        help="sampler batches built ahead of the device (0 off)")
        sp.add_argument("--num-train-epochs", type=int, default=20)
        sp.add_argument("--eval-period", type=int, default=-1)
        sp.add_argument("--wait-step", type=int, default=100)
        sp.add_argument("--shared-norm", action="store_true")
        sp.add_argument("--separate", action="store_true")
        sp.add_argument("--add-select", action="store_true")
        sp.add_argument("--drop-early", action="store_true")
        sp.add_argument("--qa-drop", type=float, default=0.0)
        sp.add_argument("--fix-para-encoder", action="store_true")
        sp.add_argument("--fix-retriever", action="store_true",
                        help="freeze the whole retriever submodule (reference "
                             "--fix-retriever/freeze_retriever, which its "
                             "entry point never actually wires up)")
        sp.add_argument("--regex", action="store_true")
        sp.add_argument("--approx-search", action="store_true")
        sp.add_argument("--use-ivf", action="store_true",
                        help="IVF coarse-quantized online retrieval (reference default)")
        sp.add_argument("--ivf-nlist", type=int, default=100)
        sp.add_argument("--ivf-nprobe", type=int, default=20)
        _shard_index_arg(sp)
        sp.add_argument("--save-pred", default="", help="write best-alpha predictions jsonl")
        sp.add_argument("--save-all", default="", metavar="PREFIX",
                        help="dump all candidate predictions + ground truths + "
                             "per-alpha top-1 files under PREFIX (reference --save-all)")
        if name in ("answer", "serve"):
            sp.add_argument("--alpha", type=float, default=0.8,
                            help="span-vs-rank score mix for candidate ranking")
            sp.add_argument("--topn", type=int, default=3,
                            help="candidate answers to include per question")
        if name == "answer":
            sp.add_argument("--question", action="append", default=[],
                            help="question text (repeatable; alternative to --predict-file)")
            sp.add_argument("--stdin", action="store_true",
                            help="serve a question per stdin line (text or "
                                 "{\"question\": ...} json), model kept warm")
        if name == "finetune-qa":
            sp.add_argument("--resume", default="",
                            help="full-state checkpoint (e.g. checkpoint_last"
                                 ".msgpack) to continue training from")
        if name == "serve":
            sp.add_argument("--host", default="127.0.0.1")
            sp.add_argument("--port", type=int, default=8080)
            sp.add_argument("--warmup", default="",
                            help="question used to pay jit compiles before "
                                 "accepting traffic (one compile per "
                                 "power-of-two batch bucket up to "
                                 "--max-batch)")
            sp.add_argument("--max-batch", type=int, default=16,
                            help="max concurrent /answer questions coalesced "
                                 "into one device dispatch (MicroBatcher)")
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("convert-hf")
    _add_common(sp)
    sp.add_argument("--torch-checkpoint", required=True)
    sp.add_argument("--kind", choices=["bert", "retriever"], default="retriever")
    sp.add_argument("--output", required=True)
    sp.add_argument("--allow-pickle", action="store_true",
                    help="permit full unpickling for legacy checkpoints that "
                         "fail the safe weights-only load (trusted files only)")
    sp.set_defaults(fn=cmd_convert_hf)

    sp = sub.add_parser("convert-trec")
    sp.add_argument("--collection", default="")
    sp.add_argument("--corpus-out", default="trec_corpus.jsonl")
    sp.add_argument("--qrels", default="")
    sp.add_argument("--queries", default="")
    sp.add_argument("--labels-out", default="trec_labels.jsonl")
    sp.set_defaults(fn=cmd_convert_trec)

    sp = sub.add_parser("convert-msmarco")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.set_defaults(fn=cmd_convert_msmarco)

    sp = sub.add_parser("build-db")
    sp.add_argument("--corpus", required=True, help='{"text", ["id"]} jsonl')
    sp.add_argument("--db", required=True, help="output sqlite path")
    sp.set_defaults(fn=cmd_build_db)

    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    try:
        args.fn(args)
    except FileNotFoundError as e:
        # argv is None only on real command-line use; under tests (explicit
        # argv) re-raise so pytest sees the original exception
        if argv is None:
            filename = e.filename or str(e)
            sys.exit(f"proqa: file not found: {filename}\n"
                     f"  (while running '{args.cmd}' — check the path arguments)")
        raise
    except IsADirectoryError as e:
        if argv is None:
            sys.exit(f"proqa: expected a file, got a directory: {e.filename}")
        raise


if __name__ == "__main__":
    main()
