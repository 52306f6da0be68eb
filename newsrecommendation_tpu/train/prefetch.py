"""Background host->device staging for the training loop.

The host side of a train step — the numpy feature gather in
`TrainSamples.iter_batches` (news_features[hist] materializes ~0.5 MB per
batch) plus the `shard_batch` device_put — runs on the same Python thread
that dispatches the jitted step. JAX's async dispatch overlaps device
compute with the *dispatch* of the next step, but every millisecond the
host spends building batch N+1 is a millisecond the dispatch queue drains:
the round-3 hardware runs measured ~10% between device-only step time and
in-loop throughput (docs/PERF.md "Hardware integration runs").

`stage_ahead` moves that host work onto one worker thread with a bounded
queue, so batch construction and the host->device transfer for step N+1
overlap the device executing step N. One worker, FIFO queue: batch order
(and therefore the training trajectory) is exactly that of the plain
iterator. The reference has no analogue (its DataLoader is synchronous,
reference src/main.py:95-142); this is the TPU-idiomatic equivalent of
torch's `DataLoader(num_workers=...)` + `prefetch_to_device`.

device_put is thread-safe in JAX; the worker only *stages* transfers and
never dispatches compute, so there is no interleaving hazard with the main
thread's `train_step` calls.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")
U = TypeVar("U")

_DONE = object()


class _Raised:
    __slots__ = ("exc",)

    def __init__(self, exc: BaseException):
        self.exc = exc


def stage_ahead(items: Iterable[T], stage: Callable[[T], U],
                depth: int = 2) -> Iterator[U]:
    """Yield ``stage(item)`` for each item, staged up to `depth` ahead.

    `stage` runs on a single background thread (FIFO — output order is the
    input order). Exceptions from the iterator or from `stage` re-raise at
    the consumer's next pull. ``depth <= 0`` degrades to the inline
    generator (no thread), so callers can expose it as a config knob.
    """
    if depth <= 0:
        for item in items:
            yield stage(item)
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        try:
            for item in items:
                if stop.is_set():
                    break
                staged = stage(item)
                # Bounded put that aborts promptly if the consumer left:
                # a plain blocking put would deadlock close() (consumer
                # waits on the drain, worker waits on a full queue).
                while not stop.is_set():
                    try:
                        q.put(staged, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # noqa: BLE001 — relayed to the consumer
            # Stop-aware retry loop (same shape as the _DONE put below): a
            # one-shot timed put could drop the error when the bounded queue
            # is full — the normal steady state when prefetch keeps ahead —
            # and the iterator would then end early, silently truncating
            # every remaining epoch.
            raised = _Raised(e)
            while not stop.is_set():
                try:
                    q.put(raised, timeout=0.1)
                    break
                except queue.Full:
                    continue
        finally:
            stop_or_done = _DONE
            while not stop.is_set():
                try:
                    q.put(stop_or_done, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, name="newsrec-prefetch", daemon=True)
    t.start()
    try:
        while True:
            out = q.get()
            if out is _DONE:
                return
            if isinstance(out, _Raised):
                raise out.exc
            yield out
    finally:
        stop.set()
        # Drain so a worker blocked on put() can observe stop and exit.
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5.0)
