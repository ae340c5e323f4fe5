"""Fair task execution (TaskExecutor + MultilevelSplitQueue analog)."""

import threading
import time

from presto1_tpu.server.task_executor import (
    FairTaskExecutor, level_of,
)


def test_levels_match_reference_thresholds():
    assert level_of(0.0) == 0
    assert level_of(0.5) == 0
    assert level_of(1.5) == 1
    assert level_of(30.0) == 2
    assert level_of(100.0) == 3
    assert level_of(1000.0) == 4


def test_fresh_query_overtakes_heavy_one():
    """With one runner busy, a heavy query's queued fragment must yield
    to a fresh query that arrives later (lower level wins)."""
    ex = FairTaskExecutor(concurrency=1)
    try:
        # charge 'heavy' with accumulated CPU
        ex.run("heavy", lambda: time.sleep(0.05))
        with ex._lock:
            ex._acc["heavy"] = 30.0  # level 2

        order = []
        release = threading.Event()
        started = threading.Event()

        def blocker():
            started.set()
            release.wait(5)

        t0 = threading.Thread(target=lambda: ex.run("warmup", blocker))
        t0.start()
        started.wait(5)  # runner now busy; queue is empty

        ts = []
        for q, name in (("heavy", "heavy1"), ("fresh", "fresh1"),
                        ("heavy", "heavy2")):
            t = threading.Thread(
                target=lambda q=q, name=name: ex.run(
                    q, lambda: order.append(name)))
            t.start()
            ts.append(t)
        time.sleep(0.2)  # all three enqueued behind the blocker
        release.set()
        for t in ts:
            t.join(5)
        t0.join(5)
        assert order[0] == "fresh1", order  # level 0 beats level 2
    finally:
        ex.stop()


def test_errors_propagate_and_accounting_accumulates():
    ex = FairTaskExecutor(concurrency=2)
    try:
        try:
            ex.run("q", lambda: (_ for _ in ()).throw(ValueError("boom")))
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
        ex.run("q", lambda: time.sleep(0.02))
        assert ex.accumulated("q") > 0.0
    finally:
        ex.stop()
