"""Graceful-preemption guard for long training runs.

Preemptible/spot TPU VMs deliver SIGTERM shortly before eviction. The
reference relies on Lightning's KeyboardInterrupt handling plus
`ModelCheckpoint(save_last=True)` (/root/reference/train.py:155-162) —
an interrupted run loses everything since the last periodic checkpoint.
Here the trainers poll a signal-set flag once per step and exit the fit
loop cleanly, which lands in the existing end-of-fit "save + flush async
writes" path — so the resume point is the *interrupted* step, not the
last `ckpt_every` multiple.

    with PreemptionGuard() as guard:
        for step, batch in ...:
            ...
            if guard.should_stop(step):
                break        # fit's tail saves the checkpoint

Multi-host: every host of a preempted slice receives SIGTERM, but delivery
is not synchronized — if hosts broke out of the loop at different steps,
the next collective would desync. `should_stop` therefore ORs the local
flags across processes at a fixed step cadence (`sync_every`), so all
hosts agree on the same stop step. The allgather is one uint8 but it
BLOCKS the host until the queued device work drains, so a per-step
cadence would serialize dispatch with compute — trainers use
sync_every=10 (stop latency ≤10 steps, no steady-state stall).
Single-process runs check the local flag every call regardless.
"""

from __future__ import annotations

import signal
import threading

import jax
import numpy as np

# Module-level so nested/successive guards (trainer inside trainer, or
# fit() called twice) share one flag: a signal that arrives between two
# fit() calls must still stop the next one.
_flag = threading.Event()


class PreemptionGuard:
    """Context manager installing SIGTERM/SIGINT-compatible handlers.

    Handlers chain: the previously installed handler (if any) runs after
    the flag is set, so external machinery (e.g. a cluster agent's own
    handler) still fires. On exit the previous handlers are restored.
    """

    def __init__(self, signals=(signal.SIGTERM,), sync_every: int = 1):
        self._signals = tuple(signals)
        self.sync_every = max(int(sync_every), 1)
        self._prev: dict[int, object] = {}
        self._stopped = False  # latched result of the global agreement

    def __enter__(self) -> "PreemptionGuard":
        for sig in self._signals:
            prev = signal.getsignal(sig)

            def _handler(signum, frame, _prev=prev):
                _flag.set()
                if callable(_prev):
                    _prev(signum, frame)

            try:
                signal.signal(sig, _handler)
            except ValueError:
                # fit() running on a non-main thread: signal.signal is
                # main-thread-only. The guard stays inert (should_stop
                # still honors a flag set by a main-thread guard).
                continue
            self._prev[sig] = prev
        return self

    def __exit__(self, *exc) -> None:
        for sig, prev in self._prev.items():
            if prev is None:
                # getsignal() returns None for handlers installed by
                # non-Python code (embedding host / C extension);
                # signal.signal rejects None — leave ours in place.
                continue
            signal.signal(sig, prev)
        self._prev.clear()

    @staticmethod
    def signalled() -> bool:
        """This process's local flag (no cross-host agreement)."""
        return _flag.is_set()

    def should_stop(self, step: int | None = None) -> bool:
        """True once training should stop, identically on every host.

        Single-process: just the flag. Multi-process: flags are OR-ed
        across hosts via an allgather, evaluated when ``step`` is a
        multiple of ``sync_every`` (or every call when ``step`` is None).
        Once True, stays True.
        """
        if self._stopped:
            return True
        if jax.process_count() == 1:
            self._stopped = _flag.is_set()
            return self._stopped
        if step is not None and step % self.sync_every != 0:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(_flag.is_set(), np.uint8)
        )
        self._stopped = bool(np.any(flags))
        return self._stopped


def reset_for_tests() -> None:
    _flag.clear()
