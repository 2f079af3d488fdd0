"""Graceful-preemption handling for training runs.

Batch schedulers (SLURM, Borg/GKE, spot/preemptible TPU VMs) deliver
SIGTERM and grant a grace window before the hard kill. The reference has no
failure-recovery story beyond rerunning from scratch (SURVEY.md §5); this
framework already restart-resumes from orbax checkpoints — GracefulShutdown
closes the remaining gap by turning the signal into a REQUEST: the training
loop finishes the in-flight epoch chunk, saves a checkpoint at the epoch
boundary, writes its logs/results, and exits cleanly, so the follow-up run
loses zero completed work.

    stop = GracefulShutdown().install()
    try:
        while epoch < epochs:
            ...train...
            if stop.requested:
                ckpt.save(epoch, state, tracker)
                break
    finally:
        stop.restore()

A SECOND signal restores the previous handler's behavior (normally: kill),
so a stuck run can still be terminated by signalling twice. Signals can only
be installed from the main thread (CPython rule); install() is a documented
no-op elsewhere — the flag then simply never trips.
"""

from __future__ import annotations

import signal
import threading


class GracefulShutdown:
    """Latches termination signals into a ``requested`` flag."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self.signals = tuple(signals)
        self.requested = False
        self._previous: dict = {}

    def _handler(self, signum, frame):
        self.requested = True
        # a second signal must be able to kill a stuck run: restore the
        # previous disposition now that the request is latched
        self.restore()
        print(f"\n[preemption] caught signal {signum}: finishing the "
              "current epoch chunk, then checkpointing and exiting "
              "(signal again to kill)", flush=True)

    def install(self) -> "GracefulShutdown":
        if threading.current_thread() is not threading.main_thread():
            return self  # signal.signal is main-thread-only (CPython)
        for s in self.signals:
            self._previous[s] = signal.signal(s, self._handler)
        return self

    def restore(self) -> None:
        """Put the previous handlers back (idempotent)."""
        while self._previous:
            s, prev = self._previous.popitem()
            signal.signal(s, prev)
