"""Preemption-safe checkpointing (SURVEY.md §5.3).

The reference's only resilience is the `.old` backup before overwrite
(train.lua:250-252) and 'run until ctrl+c' (README.md:102). On TPU pools,
preemption arrives as SIGTERM: this handler latches the signal so training
loops can finish the current step, checkpoint, and exit cleanly.

Usage (the train CLIs do this):
    guard = PreemptionGuard()
    while ...:
        ...train step...
        if guard.should_stop:
            save(); break
"""
from __future__ import annotations

import signal
import threading


class PreemptionGuard:
    """Latches SIGTERM/SIGINT into a flag; second signal restores default
    behavior (so a stuck save can still be killed)."""

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self._stop = threading.Event()
        self._signals = signals
        self._previous = {}
        for sig in signals:
            try:
                self._previous[sig] = signal.signal(sig, self._handler)
            except ValueError:
                # not the main thread (e.g. under a test runner) — inert
                pass

    def _handler(self, signum, frame):
        if self._stop.is_set():
            # second signal: give up gracefully-stopping, restore default
            signal.signal(signum, signal.SIG_DFL)
            raise KeyboardInterrupt
        print(f"<trainer> received signal {signum}: finishing step, "
              "checkpointing, exiting", flush=True)
        self._stop.set()

    @property
    def should_stop(self) -> bool:
        return self._stop.is_set()

    def trigger(self):
        """For tests: simulate a preemption signal."""
        self._stop.set()

    def restore(self):
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
