"""Relay-resilient bench execution (VERDICT r3 #2).

The development TPU is reached through a tunneled relay that sometimes
fails transiently: backend init returns UNAVAILABLE, or the remote compile
server SIGKILLs a compile (HTTP 500 "tpu_compile_helper subprocess exit
signal SIGKILL"). CLAUDE.md documents both as retry-and-it-works. Round 3
lost its entire perf record to one such blip because bench.py had no
retry; this module makes every bench entry point bounded-retry past
transient relay failures and — if they persist — emit a parseable JSON
line with an "error" field so the driver artifact distinguishes "repo
broken" (a traceback, no JSON) from "tunnel down" (JSON with error).
"""

from __future__ import annotations

import json
import time
import traceback

# substrings of transient relay/tunnel failures (observed in BENCH_r03 and
# documented in CLAUDE.md); anything else is treated as a real bug and
# re-raised so the driver sees the traceback
RETRYABLE_MARKERS = (
    "UNAVAILABLE",
    "Unable to initialize backend",
    "SIGKILL",
    "tpu_compile_helper",
    "DEADLINE_EXCEEDED",
    "Socket closed",
    "Connection reset",
    "failed to connect",
    "RESOURCE_EXHAUSTED: Attempting to reserve",
)


def is_retryable_backend_error(exc: BaseException) -> bool:
    msg = f"{type(exc).__name__}: {exc}"
    return any(m in msg for m in RETRYABLE_MARKERS)


def run_with_backend_retry(fn, attempts: int = 4, base_delay: float = 20.0,
                           sleep=time.sleep, log=print):
    """Run fn(); on a transient relay failure, back off and retry.

    Delays double per attempt (20/40/80 s by default — the relay usually
    recovers within a minute). Non-retryable exceptions propagate
    immediately. Returns fn()'s value; re-raises the last retryable error
    once attempts are exhausted.
    """
    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered by marker below
            if not is_retryable_backend_error(e):
                raise
            last = e
            if i < attempts - 1:
                delay = base_delay * (2 ** i)
                log(f"transient backend failure (attempt {i + 1}/{attempts}),"
                    f" retrying in {delay:.0f}s: {e}")
                sleep(delay)
    raise last


def bench_guard(main, metric: str, unit: str = "frames/sec",
                attempts: int = 4, base_delay: float = 20.0,
                sleep=time.sleep, emit=print):
    """Entry-point wrapper for bench scripts.

    main() is expected to print its own JSON line on success. On persistent
    transient failure, emits {"metric", "value": 0.0, "error", ...} and
    returns 1 (the JSON still reaches the driver artifact); on a
    non-transient exception, re-raises so the traceback is the record.
    """
    try:
        run_with_backend_retry(main, attempts=attempts,
                               base_delay=base_delay, sleep=sleep)
        return 0
    except Exception as e:  # noqa: BLE001
        if not is_retryable_backend_error(e):
            raise
        emit(json.dumps({
            "metric": metric,
            "value": 0.0,
            "unit": unit,
            "vs_baseline": 0.0,
            "error": f"transient backend failure after {attempts} attempts: "
                     f"{type(e).__name__}: {e}",
        }))
        traceback.print_exc()
        return 1
