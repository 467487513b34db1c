"""Regression guard for the test-gate runner itself.

Round 4's conftest implemented pytest_runtest_call as a plain
(tryfirst) hook — which is NOT firstresult — so pluggy also invoked the
default runner and every test body executed TWICE (doubling suite wall
time and deterministically failing side-effectful tests on the second
pass). The r05 conftest is a wrapper that swaps item.runtest; these two
tests prove each body runs exactly once, and on the big-stack worker
thread (the reason the threading exists at all)."""

import threading

_COUNTER = {"n": 0}


def test_body_executes_once_part1():
    _COUNTER["n"] += 1
    # the call phase must be on the preallocated-stack worker thread, not
    # the main thread whose stack VMA can't grow late in a long run
    assert threading.current_thread() is not threading.main_thread()


def test_body_executes_once_part2():
    # runs after part1 in file order: if the runner double-executes test
    # bodies, part1's counter would be 2 by now
    assert _COUNTER["n"] == 1, (
        f"test body executed {_COUNTER['n']}x — the conftest "
        "pytest_runtest_call hook is double-running tests again"
    )
