"""Bucket-stream scheduler: full, shape-homogeneous device batches from a
ragged read stream.

The reference's dispatcher (reference scripts/STRique.py:733-830) hands
each worker one read at a time, so batching is not its concern.  Here a
device batch is only efficient when it is (a) full and (b) shape-
homogeneous — a short read grouped with a long one pads to the long
read's jit bucket and pays its full alignment cost.  Slicing the stream
into fixed windows (round-1 behavior) violates both: each window splits
by target/strand into half-empty groups of mixed lengths.

``StreamScheduler`` instead queues decoded reads by
``(target, strand, signal_bucket(len))`` and flushes a queue when it
holds a full batch, so every device invocation is a full batch of
same-bucket reads hitting an already-compiled pipeline.  Flushed
batches ride the counter's submit/finish pipeline ``depth`` deep
(device compute overlaps the host's prep of the next batch).  A global
cap bounds memory/latency: when the total queued reads exceed it, the
longest queue flushes early.  End-of-stream flushes the remainders.

Results surface through a callback in completion order — the same
unordered-collector contract as the reference (:778-802).
"""
from __future__ import annotations

import sys
import traceback
from collections import deque

from ..utils.logging import LogLevel, log
from .counter import signal_bucket


class StreamScheduler:
    """Groups (target, strand, signal) submissions into full device batches.

    on_result(ctx, out) fires once per submitted read, where ``out`` is
    the counter's 7-tuple or ``None`` when the read's batch failed
    (per-batch fault isolation, reference STRique.py:764-768).
    """

    def __init__(self, counter, on_result, batch_size: int = 64,
                 depth: int = 2, max_queued: int | None = None):
        self.counter = counter
        self.on_result = on_result
        self.batch_size = max(int(batch_size), 1)
        self.depth = max(int(depth), 1)
        self.max_queued = max_queued if max_queued is not None else 4 * self.batch_size
        self.queues: dict[tuple, list] = {}
        self.n_queued = 0
        self.inflight: deque = deque()

    # -- submission ----------------------------------------------------------
    def add(self, ctx, target_name: str, strand: str, raw) -> None:
        key = (target_name, strand, signal_bucket(len(raw)))
        self.queues.setdefault(key, []).append((ctx, raw))
        self.n_queued += 1
        if len(self.queues[key]) >= self.batch_size:
            self._flush(key)
        elif self.n_queued > self.max_queued:
            self._flush(max(self.queues, key=lambda k: len(self.queues[k])))

    def close(self) -> None:
        """Flush all partial queues and drain every in-flight batch."""
        # largest first: the tail partial batches overlap each other's work
        for key in sorted(self.queues, key=lambda k: -len(self.queues[k])):
            self._flush(key)
        while self.inflight:
            self._drain_one()

    # -- internals -----------------------------------------------------------
    def _flush(self, key) -> None:
        target_name, strand, _bucket = key
        items = self.queues.pop(key)
        self.n_queued -= len(items)
        try:
            state = self.counter.detect_submit(
                target_name, [raw for _, raw in items], strand)
        except KeyboardInterrupt:
            raise
        except Exception:
            log("Factory: Unexpected error in batch submit, proceeding.\n"
                + "".join(traceback.format_exception(*sys.exc_info())), LogLevel.Warning)
            state = None
        self.inflight.append((items, state))
        while len(self.inflight) > self.depth:
            self._drain_one()

    def _drain_one(self) -> None:
        items, state = self.inflight.popleft()
        outs = None
        if state is not None:
            try:
                outs = self.counter.detect_finish(state)
            except KeyboardInterrupt:
                raise
            except Exception:
                log("Factory: Unexpected error in batch, proceeding with remaining reads.\n"
                    + "".join(traceback.format_exception(*sys.exc_info())), LogLevel.Warning)
        for i, (ctx, _raw) in enumerate(items):
            self.on_result(ctx, outs[i] if outs is not None else None)
