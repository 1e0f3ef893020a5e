"""MicroBatcher (serving.py): concurrent /answer requests coalesce into one
dispatch with no artificial wait (the in-flight dispatch is the batching
window), per-item alpha/topn survive batching, oversize requests split
across drains, and a failing dispatch propagates to exactly its batch's
waiters. Pure unit tests against a fake answer function — the HTTP-level
integration (incl. /stats) lives in tests/test_cli.py::test_cli_serve_http."""
import threading
import time

import pytest

from proqa_tpu.serving import MicroBatcher


class Gate:
    """An answer_batch fake that records call batches and can block."""

    def __init__(self, fail_batches=()):
        self.calls = []
        self.entered = threading.Event()
        self.release = threading.Event()
        self.release.set()
        self.fail_batches = set(fail_batches)

    def __call__(self, items):
        self.calls.append(list(items))
        self.entered.set()
        assert self.release.wait(timeout=10)
        if len(self.calls) - 1 in self.fail_batches:
            raise RuntimeError("device fell over")
        return [
            {"question": q, "alpha": a, "topn": n} for q, a, n in items
        ]


def _submit_async(b, item):
    out = {}

    def run():
        try:
            out["row"] = b.submit(*item)
        except Exception as e:  # noqa: BLE001 - recorded for assertions
            out["err"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t, out


def test_coalesces_requests_queued_during_dispatch():
    g = Gate()
    b = MicroBatcher(g, max_batch=16)
    try:
        g.release.clear()
        t0, r0 = _submit_async(b, ("q0", 0.8, 3))
        assert g.entered.wait(timeout=5)  # worker is inside dispatch 0
        pending = [_submit_async(b, (f"q{i}", 0.5, 1)) for i in range(1, 6)]
        # the five arrivals during the in-flight dispatch must share ONE
        # follow-up dispatch, not five
        g.release.set()
        for t, _ in [(t0, r0)] + pending:
            t.join(timeout=10)
            assert not t.is_alive()
        assert r0["row"]["question"] == "q0" and r0["row"]["alpha"] == 0.8
        for i, (_, out) in enumerate(pending, start=1):
            assert out["row"] == {"question": f"q{i}", "alpha": 0.5, "topn": 1}
        assert [len(c) for c in g.calls] == [1, 5]
        assert b.stats["batches"] == 2 and b.stats["items"] == 6
        assert b.stats["max_batch_seen"] == 5
    finally:
        b.close()


def test_lone_request_dispatches_immediately():
    g = Gate()
    b = MicroBatcher(g, max_batch=16)
    try:
        t0 = time.perf_counter()
        row = b.submit("solo", 0.8, 2)
        assert time.perf_counter() - t0 < 1.0  # no batching-window sleep
        assert row["question"] == "solo" and g.calls == [[("solo", 0.8, 2)]]
    finally:
        b.close()


def test_max_batch_splits_and_reassembles_in_order():
    g = Gate()
    b = MicroBatcher(g, max_batch=2)
    try:
        g.release.clear()
        t0, _ = _submit_async(b, ("head", 0.8, 3))
        assert g.entered.wait(timeout=5)
        items = [(f"q{i}", 0.1 * i, i + 1) for i in range(5)]
        big = {}

        def run_many():
            big["rows"] = b.submit_many(items)

        tm = threading.Thread(target=run_many, daemon=True)
        tm.start()
        g.release.set()
        tm.join(timeout=10)
        t0.join(timeout=10)
        assert not tm.is_alive()
        # 5 items through max_batch=2 -> drains of 2, 2, 1; the caller gets
        # one ordered result list regardless of the split
        assert [len(c) for c in g.calls] == [1, 2, 2, 1]
        assert [r["question"] for r in big["rows"]] == [q for q, _, _ in items]
        assert [r["topn"] for r in big["rows"]] == [n for _, _, n in items]
    finally:
        b.close()


def test_error_propagates_to_its_batch_only():
    g = Gate(fail_batches={1})
    b = MicroBatcher(g, max_batch=16)
    try:
        g.release.clear()
        t0, r0 = _submit_async(b, ("ok", 0.8, 3))
        assert g.entered.wait(timeout=5)
        doomed = [_submit_async(b, (f"bad{i}", 0.8, 3)) for i in range(2)]
        g.release.set()
        t0.join(timeout=10)
        for t, _ in doomed:
            t.join(timeout=10)
        assert r0["row"]["question"] == "ok"
        for _, out in doomed:
            assert isinstance(out["err"], RuntimeError)
        # the batcher survives a failed dispatch
        assert b.submit("after", 0.8, 3)["question"] == "after"
    finally:
        b.close()


def test_closed_batcher_rejects_submits():
    b = MicroBatcher(lambda items: [{}] * len(items))
    b.close()
    with pytest.raises(RuntimeError):
        b.submit("late", 0.8, 3)


def test_warmup_buckets_ladder():
    from proqa_tpu.serving import warmup_buckets

    assert warmup_buckets(16) == [1, 2, 4, 8, 16]
    assert warmup_buckets(1) == [1]
    assert warmup_buckets(5) == [1, 2, 4, 5]  # non-pow2 cap ends the ladder
    assert warmup_buckets(0) == [1]           # degenerate cap clamps to 1


def test_submit_many_empty_returns_empty():
    b = MicroBatcher(lambda items: [{}] * len(items))
    try:
        assert b.submit_many([]) == []
    finally:
        b.close()
