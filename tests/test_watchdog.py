"""Launch watchdog — the hang-mode guard on device calls.

The production fault's hang mode (docs/PERF_NOTES round 4) blocks a
device call forever; the SIGALRM watchdog must convert that into an
exception that the posterior crash ladder recognizes as a worker crash
(so the batch is dumped and the supervisor restarts the process)."""

import time

import pytest

from dbgphmm_tpu.multi_dbg.posterior import _is_worker_crash
from dbgphmm_tpu.ops.pallas_mapped import (
    PackedLaunchTimeout,
    _launch_watchdog,
)


def test_watchdog_fires_on_blocked_call():
    with pytest.raises(PackedLaunchTimeout) as ei:
        with _launch_watchdog(1):
            time.sleep(5)
    # the message must route through the crash ladder
    assert _is_worker_crash(ei.value)


def test_watchdog_noop_on_fast_call():
    with _launch_watchdog(5):
        x = sum(range(100))
    assert x == 4950


def test_watchdog_disabled_when_zero():
    with _launch_watchdog(0):
        time.sleep(0.01)


def test_watchdog_restores_previous_handler():
    import signal

    seen = []
    old = signal.signal(signal.SIGALRM, lambda s, f: seen.append(s))
    try:
        with _launch_watchdog(5):
            pass
        assert signal.getsignal(signal.SIGALRM).__name__ == "<lambda>"
    finally:
        signal.signal(signal.SIGALRM, old)
