"""Data pipeline tests: DocDB, collation, pair/cluster datasets and their
batch-order invariants, prefetch loader, id map, dense index persistence."""
import json
import random

import numpy as np
import pytest

from proqa_tpu.data import (
    BatchLoader,
    ClusterPairDataset,
    DocDB,
    EncodeDataset,
    PairDataset,
    cluster_batch_order,
    collate_tokens,
    grouped_shuffle_order,
)
from proqa_tpu.data.collate import batch_pad
from proqa_tpu.index import IdMap


class FakeTokenizer:
    """Deterministic toy tokenizer: one id per word hash."""

    def encode(self, text, max_length=None):
        ids = [2] + [5 + (hash(w) % 50) for w in text.split()] + [3]
        if max_length and len(ids) > max_length:
            ids = ids[: max_length - 1] + [3]
        return ids


def _write_pairs(path, n, para_words=25):
    with open(path, "w") as f:
        for i in range(n):
            para_id = i // 3
            f.write(json.dumps({
                "Question": f"question {i} about topic {para_id}",
                "Paragraph": " ".join([f"w{para_id}"] * para_words),
                "Answer": f"ans{para_id}",
            }) + "\n")


def test_docdb_roundtrip(tmp_path):
    db = DocDB.create(str(tmp_path / "docs.db"), [("a", "text A"), ("b", "text B")])
    assert db.get_doc_text("a") == "text A"
    assert db.get_doc_text("missing") is None
    assert set(db.get_doc_ids()) == {"a", "b"}
    assert len(db) == 2
    db.close()


def test_collate_static_shape():
    out = collate_tokens([[1, 2], [3, 4, 5]], length=6)
    assert out.shape == (2, 6)
    np.testing.assert_array_equal(out[0], [1, 2, 0, 0, 0, 0])


def test_collate_buckets():
    out = collate_tokens([[1] * 10], buckets=[8, 16, 32])
    assert out.shape == (1, 16)
    out2 = collate_tokens([[1] * 40], buckets=[8, 16, 32])
    assert out2.shape == (1, 32)  # clamps to the largest bucket


def test_batch_pad():
    b, rows = batch_pad({"x": np.ones((3, 4))}, 8)
    assert b["x"].shape == (8, 4) and rows == 3


def test_pad_bucket():
    from proqa_tpu.data.collate import pad_bucket

    assert [pad_bucket(n, 16) for n in (1, 2, 3, 4, 5, 8, 9, 16)] == \
        [1, 2, 4, 4, 8, 8, 16, 16]
    assert pad_bucket(20, 16) == 16       # capped at the configured batch
    assert pad_bucket(3, 5) == 4          # non-power-of-two cap: pow2 below it
    assert pad_bucket(5, 5) == 5          # ...but full groups use the cap
    assert pad_bucket(1, 1) == 1


def test_pair_dataset_filter(tmp_path):
    path = str(tmp_path / "pairs.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({"Question": "q", "Paragraph": "short para", "Answer": "x"}) + "\n")
        f.write(json.dumps({
            "Question": "contains answer foo", "Paragraph": " ".join(["w"] * 30), "Answer": "foo",
        }) + "\n")
        f.write(json.dumps({
            "Question": "a real question", "Paragraph": " ".join(["w"] * 30), "Answer": "kept",
        }) + "\n")
    ds = PairDataset(FakeTokenizer(), path, filter=True)
    assert len(ds) == 1  # short para and answer-in-question dropped


def test_grouped_shuffle_no_shared_paragraph_in_batch(tmp_path):
    path = str(tmp_path / "pairs.jsonl")
    _write_pairs(path, 90)
    ds = PairDataset(FakeTokenizer(), path)
    order = grouped_shuffle_order(ds, random.Random(0))
    assert sorted(order) == list(range(90))
    bsz = 10
    for s in range(0, 90, bsz):
        batch = order[s : s + bsz]
        paras = [i // 3 for i in batch]  # same paragraph <=> same i//3
        # inside one residue group no two examples share a paragraph
        assert len(set(paras)) == len(paras), f"batch {batch} shares paragraphs"


def test_cluster_batch_order_invariants(tmp_path):
    d = tmp_path / "splits"
    d.mkdir()
    for c in range(4):
        with open(d / f"split_{c}.jsonl", "w") as f:
            for i in range(24):
                f.write(json.dumps({
                    "Question": f"q {c} {i}", "Paragraph": " ".join(["w"] * 30),
                    "Answer": f"a{c}",
                }) + "\n")
    ds = ClusterPairDataset(FakeTokenizer(), str(d))
    assert len(ds) == 96
    assert [len(c) for c in ds.index_clusters] == [24] * 4

    bsz = 8
    order = cluster_batch_order(ds, bsz, random.Random(0))
    assert sorted(order) == list(range(96))
    cluster_of = {}
    for c, idxs in enumerate(ds.index_clusters):
        for i in idxs:
            cluster_of[i] = c
    for s in range(0, 96, bsz):
        batch = order[s : s + bsz]
        assert len({cluster_of[i] for i in batch}) == 1, "batch crosses clusters"


def test_pair_batches_static(tmp_path):
    path = str(tmp_path / "pairs.jsonl")
    _write_pairs(path, 10)
    ds = PairDataset(FakeTokenizer(), path, max_query_length=12, max_length=64)
    batches = list(ds.batches(list(range(10)), batch_size=4))
    assert len(batches) == 3
    for b in batches:
        assert b["input_ids_q"].shape == (4, 12)
        assert b["input_ids_c"].shape == (4, 52)
    assert batches[-1]["__rows__"] == 2


def test_encode_dataset(tmp_path):
    path = str(tmp_path / "corpus.jsonl")
    with open(path, "w") as f:
        for i in range(5):
            f.write(json.dumps({"text": f"paragraph number {i}"}) + "\n")
    ds = EncodeDataset(FakeTokenizer(), path, max_length=16)
    bs = list(ds.batches(2))
    assert len(bs) == 3
    assert bs[0]["input_ids"].shape == (2, 16)


def test_batch_loader_propagates_and_orders():
    def gen():
        yield from range(5)
    assert list(BatchLoader(gen(), prefetch=2)) == [0, 1, 2, 3, 4]

    def bad():
        yield 1
        raise ValueError("boom")
    loader = BatchLoader(bad())
    with pytest.raises(ValueError):
        list(loader)


def test_batch_loader_close_unblocks_producer():
    """Abandoning iteration must not leave the producer parked forever in a
    full queue (it would pin the source iterator + prefetched batches)."""
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    loader = BatchLoader(gen(), prefetch=2)
    it = iter(loader)
    assert next(it) == 0
    it.close()  # generator finally -> loader.close()
    loader._thread.join(timeout=5)
    assert not loader._thread.is_alive()
    assert len(produced) < 1000  # producer stopped early, not drained


def test_batch_loader_is_single_use():
    """A second pass would block forever on a sentinel the first pass ate —
    must raise instead of deadlocking."""
    loader = BatchLoader(iter(range(3)), prefetch=2)
    assert list(loader) == [0, 1, 2]
    with pytest.raises(RuntimeError, match="single-use"):
        list(loader)


def test_idmap_roundtrip(tmp_path):
    m = IdMap.from_doc_ids(["d3", "d1", "d9"])
    p = str(tmp_path / "idx_id.json")
    m.save(p)
    m2 = IdMap.load(p)
    assert m2.rows_to_ids([2, 0]) == ["d9", "d3"]
    # reference format: string keys of row indices
    raw = json.load(open(p))
    assert raw["0"] == "d3"


def test_docdb_thread_safety(tmp_path):
    """Concurrent reads from many threads must be correct (thread-local
    connections; the reference relied on fork-pool initializers)."""
    from concurrent.futures import ThreadPoolExecutor

    db = DocDB.create(
        str(tmp_path / "mt.db"), [(f"d{i}", f"text {i}") for i in range(200)]
    )
    def read(i):
        return db.get_doc_text(f"d{i % 200}")
    with ThreadPoolExecutor(8) as pool:
        results = list(pool.map(read, range(2000)))
    assert all(r == f"text {i % 200}" for i, r in enumerate(results))


def test_step_timer_and_metric_logger(tmp_path):
    import time as _time
    from proqa_tpu.utils.logging import MetricLogger
    from proqa_tpu.utils.profiling import StepTimer

    t = StepTimer()
    for _ in range(3):
        with t:
            _time.sleep(0.001)
    s = t.summary()
    assert s["mean_s"] > 0 and s["steps_per_s"] > 0

    ml = MetricLogger(str(tmp_path / "m.jsonl"))
    ml.scalar("x", 1.5, 3)
    ml.close()
    row = json.loads(open(tmp_path / "m.jsonl").read().strip())
    assert row == {**row, "tag": "x", "value": 1.5, "step": 3}
