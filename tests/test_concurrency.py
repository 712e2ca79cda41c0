"""Concurrent serving + W5 admission control (r4 verdict #4).

The reference serves at most 64 concurrent searches, then responds
HTTP 429 with Retry-After 2^(n/64) s capped at 512
(search.cpp:686-696). SearchIndex.search() enforces the same gate
(TooManyRequestsError); these tests pin that concurrent callers get
IDENTICAL results to single-stream, that the gate actually fires under
real concurrent load (and recovers), and that the bench harness's
concurrency driver reports sane numbers.
"""

import threading
import time

import pandas as pd
import pytest

from tlgs_spark.query.engine import SearchIndex, TooManyRequestsError

QUERIES = [
    ("tok0000", "and"),
    ("tok0001 tok0002", "and"),
    ("tok0000 tok0003", "or"),
    ("marker000", "and"),
    ("tok0002 role:user", "and"),
]


def test_concurrent_results_identical_to_single_stream(spark, index_dir):
    si = SearchIndex(spark, index_dir)
    expected = {(q, m): si.search(q, k=10, mode=m) for q, m in QUERIES}
    results: dict = {}
    errors: list = []
    lock = threading.Lock()

    def worker(tid: int):
        try:
            for i in range(6):
                q, m = QUERIES[(tid + i) % len(QUERIES)]
                r = si.search(q, k=10, mode=m)
                with lock:
                    results.setdefault((q, m), []).append(r)
        except Exception as e:  # surfaced below
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:2]
    for key, frames in results.items():
        for fr in frames:
            pd.testing.assert_frame_equal(fr, expected[key])
    assert si._in_flight == 0  # gate fully released


def test_admission_fires_past_cap_and_recovers(spark, index_dir, monkeypatch):
    si = SearchIndex(spark, index_dir)
    si.max_in_flight = 2
    inner = si._search_inner
    barrier = threading.Barrier(3, timeout=10)

    def slow_inner(*a, **kw):
        # hold both admitted slots until a third caller has been turned
        # away — makes the overload window deterministic
        try:
            barrier.wait()
        except threading.BrokenBarrierError:
            pass
        time.sleep(0.2)
        return inner(*a, **kw)

    monkeypatch.setattr(si, "_search_inner", slow_inner)
    outcomes: list = []
    lock = threading.Lock()

    def caller():
        try:
            si.search("tok0000", k=5)
            with lock:
                outcomes.append("ok")
        except TooManyRequestsError as e:
            # reference backoff shape: 2^(n/64) seconds, capped at 512
            assert 1.0 <= e.retry_after <= 512.0
            with lock:
                outcomes.append("429")
            try:
                barrier.wait()  # release the two held slots
            except threading.BrokenBarrierError:
                pass

    threads = [threading.Thread(target=caller) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert outcomes.count("429") == 1 and outcomes.count("ok") == 2
    assert si._in_flight == 0
    # gate recovered: a fresh request is admitted
    monkeypatch.setattr(si, "_search_inner", inner)
    assert len(si.search("tok0000", k=5)) > 0


def test_concurrency_bench_reports_and_admission_burst(spark, index_dir):
    from tlgs_spark.bench import concurrency_bench

    out = concurrency_bench(
        spark, index_dir, levels=(4,), per_thread=3,
        admission_threads=8, admission_cap=1,
    )
    for tier in ("warm4", "nocache4"):
        assert out[tier]["completed"] == 4 * 3
        assert out[tier]["rejected"] == 0
        assert out[tier]["qps"] > 0
        assert out[tier]["p95_ms"] >= out[tier]["p50_ms"] >= 0
    adm = out["admission"]
    assert adm["max_in_flight"] == 1
    assert adm["completed"] + adm["rejected"] == 8 * 4
    # the 429 path demonstrably fired under the lowered cap
    assert adm["rejected"] > 0
    assert all(1.0 <= r <= 512.0 for r in adm["retry_after_sample"])
