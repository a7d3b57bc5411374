"""Preemption-aware training (SURVEY.md §5.3).

The reference has no failure detection or elastic recovery — recovery is
manual `--resume True --resume_step N` (reference vla-scripts/
finetune.py:111-112) plus the `run_finetune*.py` restart wrappers. On TPU
VMs preemption is routine (spot/preemptible capacity sends SIGTERM with a
short grace window), so the TPU build makes it first-class: install a
`PreemptionGuard`, poll `guard.should_stop` once per step, and when set,
save a checkpoint and exit cleanly. Paired with `run_finetune.py`'s
restart loop and Orbax resume this gives automatic recovery with at most
`save_freq` steps of lost work — and usually zero, because the guard
checkpoints at the preemption boundary itself.

Usage::

    with PreemptionGuard() as guard:
        for step, batch in enumerate(batches):
            state = train_step(state, batch)
            if guard.should_stop:
                save_checkpoint(...)
                break
"""

from __future__ import annotations

import signal
import threading
from types import FrameType
from typing import List, Optional


class PreemptionGuard:
    """Latches SIGTERM/SIGINT into a flag the training loop can poll.

    Signal handlers must do almost nothing (they can run between any two
    bytecodes); the guard only sets an event, and the loop decides when to
    act — after the in-flight step completes, so the checkpoint is a
    consistent post-step state. A second signal of the same kind re-raises
    the default behaviour so a stuck save can still be interrupted.
    """

    def __init__(self, signals: Optional[List[int]] = None):
        self.signals = list(signals) if signals is not None else [
            signal.SIGTERM, signal.SIGINT]
        self._event = threading.Event()
        self._prev: dict = {}
        self._received: Optional[int] = None

    # -- context manager -------------------------------------------------
    def __enter__(self) -> "PreemptionGuard":
        for sig in self.signals:
            try:
                self._prev[sig] = signal.signal(sig, self._handle)
            except (ValueError, OSError):
                # Not the main thread / unsupported signal: degrade to a
                # manually-settable flag rather than failing training.
                pass
        return self

    def __exit__(self, *exc) -> None:
        for sig, prev in self._prev.items():
            try:
                # None = prior handler installed from C (not restorable)
                signal.signal(sig, prev if prev is not None else signal.SIG_DFL)
            except (ValueError, OSError, TypeError):
                pass
        self._prev.clear()

    # -- signal path ------------------------------------------------------
    def _handle(self, signum: int, frame: Optional[FrameType]) -> None:
        if self._event.is_set():
            # Second signal: restore default and re-deliver so the user can
            # kill a save that hangs.
            prev = self._prev.get(signum)
            if prev is None:
                # signal.signal returned None when the prior handler was
                # installed from C — not restorable from Python; fall back
                # to the default disposition instead of TypeError'ing
                prev = signal.SIG_DFL
            signal.signal(signum, prev)
            signal.raise_signal(signum)
            return
        self._received = signum
        self._event.set()

    # -- loop-facing API ----------------------------------------------------
    @property
    def should_stop(self) -> bool:
        return self._event.is_set()

    @property
    def received_signal(self) -> Optional[int]:
        return self._received

    def request_stop(self) -> None:
        """Programmatic trigger (tests, wall-clock limits, host agents)."""
        self._event.set()
