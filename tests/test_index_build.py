"""Index building + recall evaluation library-level tests (the §3.2/§3.3
workloads without the CLI)."""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from proqa_tpu.data.datasets import EncodeDataset
from proqa_tpu.data.docdb import DocDB
from proqa_tpu.index import (
    DenseIndex,
    IdMap,
    build_index,
    encode_corpus,
    recall_at_k,
)
from proqa_tpu.models.bert import BertConfig
from proqa_tpu.models.retriever import encode_context, init_retriever_params


class FakeTok:
    def encode(self, text, max_length=None):
        # deterministic across processes (hash() is salted per interpreter,
        # which made token ids — and near-tie orderings — run-dependent)
        import zlib

        ids = [2] + [5 + (zlib.crc32(w.encode()) % 100) for w in text.split()] + [3]
        return ids[:max_length] if max_length else ids


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("build")
    with open(root / "corpus.jsonl", "w") as f:
        for i in range(23):
            f.write(json.dumps({"text": f"para {i} words here", "id": f"p{i}"}) + "\n")
    cfg = BertConfig.tiny(dtype=jnp.float32)
    params = init_retriever_params(jax.random.PRNGKey(0), cfg, embed_dim=8)
    return root, cfg, params


def test_encode_corpus_matches_direct(setup):
    root, cfg, params = setup
    ds = EncodeDataset(FakeTok(), str(root / "corpus.jsonl"), max_length=12)
    emb = encode_corpus(params, cfg, ds, batch_size=8)
    assert emb.shape == (23, 8)
    # row 0 equals a direct single encode
    from proqa_tpu.data.collate import pad_to

    ids = pad_to([ds[0]], 12)
    direct = np.asarray(encode_context(
        params, cfg, jnp.asarray(ids), jnp.asarray((ids != 0).astype(np.int32))
    ))
    np.testing.assert_allclose(emb[0], direct[0], atol=1e-5)


def test_build_index_stringifies_int_ids(setup, tmp_path):
    """jsonl int ids must become str in the IdMap like the streaming path and
    build-db do — an int id silently misses every sqlite text lookup and
    gold-row inverse lookup (no error, retrieval quality just collapses)."""
    root, cfg, params = setup
    path = tmp_path / "int_ids.jsonl"
    with open(path, "w") as f:
        for i in range(9):
            f.write(json.dumps({"text": f"para {i} words", "id": i}) + "\n")
    index = build_index(
        params, cfg, str(path), tokenizer=FakeTok(), max_length=12, batch_size=4,
        dtype=jnp.float32,
    )
    assert index.id_map.rows_to_ids([0, 8]) == ["0", "8"]


def test_build_index_roundtrip(setup, tmp_path):
    """build -> save -> load -> search parity, and search equals brute force."""
    root, cfg, params = setup
    index = build_index(
        params, cfg, str(root / "corpus.jsonl"),
        tokenizer=FakeTok(), max_length=12, batch_size=8,
        dtype=jnp.float32, save_path=str(tmp_path / "idx"),
    )
    assert len(index) == 23
    loaded = DenseIndex.load(str(tmp_path / "idx"), dtype=jnp.float32)
    assert len(loaded) == 23
    assert loaded.id_map[0] == "p0"
    q = np.asarray(index.embeddings[:2], np.float32)
    _, i1 = index.search(q, 3)
    _, i2 = loaded.search(q, 3)
    np.testing.assert_array_equal(i1, i2)
    # index equals brute-force numpy search
    emb = np.load(tmp_path / "idx" / "embeddings.npy")
    want = np.argsort(-(q @ emb.T), kind="stable", axis=1)[:, :3]
    np.testing.assert_array_equal(i1, want)


def test_recall_at_k(tmp_path):
    db = DocDB.create(str(tmp_path / "r.db"), [
        ("a", "the answer is paris"),
        ("b", "nothing relevant"),
        ("c", "paris again here"),
    ])
    qa = [{"question": "q1", "answer": ["Paris"]}, {"question": "q2", "answer": ["zurich"]}]
    retrieved = [["b", "a", "c"], ["a", "b", "c"]]
    out = recall_at_k(qa, retrieved, db, ks=(1, 2, 3))
    assert out[1] == 0.0      # q1 top-1 is 'b' (no), q2 has no match at all
    assert out[2] == 0.5      # q1 covered at rank 2
    assert out[3] == 0.5


def test_evaluate_retrieval_reports_full_depth(tmp_path):
    """recall@topk must always be reported, even when topk exceeds every
    default ks entry (the reference's get_score always prints
    'Top {topk} Recall') — otherwise --topk pays the deeper search without
    scoring it."""
    from proqa_tpu.index.recall import evaluate_retrieval

    db = DocDB.create(str(tmp_path / "f.db"), [
        (f"d{i}", f"text {'paris' if i == 2 else 'other'} words") for i in range(4)
    ])
    emb = np.eye(4, 8, dtype=np.float32)
    index = DenseIndex.from_embeddings(
        emb, IdMap.from_doc_ids([f"d{i}" for i in range(4)]), dtype=jnp.float32,
    )
    qa_path = tmp_path / "qa.jsonl"
    qa_path.write_text(json.dumps({"question": "q", "answer": ["paris"]}) + "\n")
    q = np.eye(1, 8, dtype=np.float32)  # nearest d0, gold at d2 (rank 3)
    out = evaluate_retrieval(str(qa_path), index, q, db, topk=3, ks=(1, 2))
    assert set(out) == {1, 2, 3}
    assert out[3] == 1.0 and out[1] == 0.0


def test_build_index_streaming_matches_inmemory(setup, tmp_path):
    """Bounded-RAM streaming build (chunked tokenize + incremental memmap
    write) must produce the identical index artifact and search results."""
    root, cfg, params = setup
    ref = build_index(
        params, cfg, str(root / "corpus.jsonl"),
        tokenizer=FakeTok(), max_length=12, batch_size=8,
        dtype=jnp.float32, save_path=str(tmp_path / "mem"),
    )
    streamed = build_index(
        params, cfg, str(root / "corpus.jsonl"),
        tokenizer=FakeTok(), max_length=12, batch_size=8,
        dtype=jnp.float32, save_path=str(tmp_path / "stream"),
        stream_chunk=7,  # forces several partial chunks over the 23 rows
    )
    a = np.load(tmp_path / "mem" / "embeddings.npy")
    b = np.load(tmp_path / "stream" / "embeddings.npy")
    np.testing.assert_allclose(b, a, atol=1e-5)
    assert len(streamed) == len(ref) == 23
    assert streamed.id_map[22] == "p22"
    q = a[:3]
    _, i1 = ref.search(q, 4)
    _, i2 = streamed.search(q, 4)
    np.testing.assert_array_equal(i2, i1)
    # reload path goes through the memmap (mmap_mode) branch incl. padding
    loaded = DenseIndex.load(str(tmp_path / "stream"), dtype=jnp.float32)
    _, i3 = loaded.search(q, 4)
    np.testing.assert_array_equal(i3, i1)


def test_encode_corpus_bucketed_order_preserved(setup):
    """Length-bucketed encoding must return embeddings in original row order
    and match the unbucketed path."""
    root, cfg, params = setup
    ds = EncodeDataset(FakeTok(), str(root / "corpus.jsonl"), max_length=12)
    plain = encode_corpus(params, cfg, ds, batch_size=8, buckets=None)
    bucketed = encode_corpus(params, cfg, ds, batch_size=8, buckets=(4, 8, 12))
    np.testing.assert_allclose(bucketed, plain, atol=1e-5)


def test_streaming_build_accepts_pair_rows(setup, tmp_path):
    """The progressive phase-2 recipe streams the PAIR file (Paragraph
    field); the bounded-RAM path must encode it identically to corpus rows
    with the same texts."""
    root, cfg, params = setup
    import json as _json

    pair_path = tmp_path / "pairs.jsonl"
    with open(root / "corpus.jsonl") as fin, open(pair_path, "w") as fout:
        for line in fin:
            row = _json.loads(line)
            fout.write(_json.dumps({
                "Question": "q", "Paragraph": row["text"], "Answer": "a",
                "id": row["id"],
            }) + "\n")
    ref = build_index(
        params, cfg, str(root / "corpus.jsonl"),
        tokenizer=FakeTok(), max_length=12, batch_size=8,
        dtype=jnp.float32, save_path=str(tmp_path / "mem"),
    )
    streamed = build_index(
        params, cfg, str(pair_path),
        tokenizer=FakeTok(), max_length=12, batch_size=8,
        dtype=jnp.float32, save_path=str(tmp_path / "stream_pairs"),
        stream_chunk=7,
    )
    np.testing.assert_allclose(
        np.load(tmp_path / "stream_pairs" / "embeddings.npy"),
        np.load(tmp_path / "mem" / "embeddings.npy"), atol=1e-5,
    )
    assert len(streamed) == len(ref)


def test_dense_index_take_clips_negative_rows():
    """DenseIndex.take must clip -1 padding slots to row 0 (the host-side
    np.maximum(rows, 0) contract) — default jnp.take would WRAP -1 to the
    last (zero-pad) row, desynchronizing rank scores from displayed text."""
    from proqa_tpu.index import DenseIndex

    rng = np.random.default_rng(5)
    emb = rng.standard_normal((10, 8)).astype(np.float32)
    idx = DenseIndex.from_embeddings(emb, dtype=jnp.float32, pad_multiple=16)
    got = idx.take(np.asarray([-1, 0, 9], np.int32))
    np.testing.assert_allclose(got[0], emb[0], rtol=1e-6)
    np.testing.assert_allclose(got[1], emb[0], rtol=1e-6)
    np.testing.assert_allclose(got[2], emb[9], rtol=1e-6)
