"""Gates for ml.fit_pool — the r14 concurrent-fit single-flight (guide §2.6).

No Spark needed: the pool orchestrates arbitrary callables; the ML wiring
is exercised by the existing entry tests (test_rules_ml / test_ann_horizon),
which now route their fits through it.
"""

from __future__ import annotations

import threading
import time

import pytest

from market_data_mining_project_spark.ml import fit_pool


def _key(tag: str) -> tuple:
    # unique per test invocation: the pool memoizes for the process lifetime
    return ("test", tag, time.monotonic_ns())


def test_shared_runs_once_and_memoizes():
    calls = []
    k = _key("once")
    assert fit_pool.shared(k, lambda: calls.append(1) or 41 + 1) == 42
    assert fit_pool.shared(k, lambda: calls.append(1) or -1) == 42
    assert calls == [1]


def test_prefetch_then_shared_joins_same_cell():
    started = threading.Event()
    release = threading.Event()
    k = _key("join")

    def slow():
        started.set()
        release.wait(10)
        return "fitted"

    fit_pool.prefetch(k, slow)
    assert started.wait(10)  # the pool picked it up
    fit_pool.prefetch(k, lambda: "other")  # dedup: second registration no-ops
    release.set()
    assert fit_pool.shared(k, lambda: "loser") == "fitted"


def test_consumer_not_serialized_behind_queued_keys():
    """The consumer path must run its own cell INLINE when no pool thread
    has started it — never wait behind other keys saturating the 2-thread
    pool (the q_horizon single-entry case: its MLP fit must not queue
    behind a prefetched ALS + churn fit)."""
    release = threading.Event()
    running = []

    def blocker(tag):
        def fn():
            running.append(tag)
            release.wait(10)
            return tag

        return fn

    # saturate both pool workers + queue a third
    for tag in ("a", "b", "c"):
        fit_pool.prefetch(_key(tag), blocker(tag))
    deadline = time.monotonic() + 10
    while len(running) < 2 and time.monotonic() < deadline:
        time.sleep(0.01)
    assert len(running) == 2  # two in flight, one queued
    t0 = time.monotonic()
    got = fit_pool.shared(_key("mine"), lambda: "inline")
    elapsed = time.monotonic() - t0
    release.set()
    assert got == "inline"
    assert elapsed < 5  # returned while the blockers still held the pool


def test_exception_is_memoized_and_reraised():
    k = _key("boom")
    calls = []

    def bad():
        calls.append(1)
        raise ValueError("fit failed")

    with pytest.raises(ValueError, match="fit failed"):
        fit_pool.shared(k, bad)
    with pytest.raises(ValueError, match="fit failed"):
        fit_pool.shared(k, lambda: "never")
    assert calls == [1]
