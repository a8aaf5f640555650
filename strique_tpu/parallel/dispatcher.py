"""Host-side pipeline runner.

Replaces the reference's fork-based ``mt_dispatcher`` worker pool
(reference scripts/STRique.py:733-830).  In the TPU design a single
process owns the device; parallelism comes from (a) a thread pool that
overlaps fast5 IO + CPU preprocessing with device compute, and (b) data
parallelism over reads across chips (:mod:`strique_tpu.parallel.mesh`).

Per-read fault isolation matches the reference: any exception in a
worker is logged and the pipeline continues (reference :764-768).
"""
from __future__ import annotations

import sys
import traceback
from concurrent.futures import ThreadPoolExecutor

from ..utils.logging import LogLevel, log


def run_pipeline(sam_lines, detector, writer, io_threads: int = 1,
                 batch_size: int = 1) -> int:
    """Stream SAM lines through detection into the writer.

    ``batch_size > 1`` groups lines and uses the detector's batched path
    (one device invocation per read group).  With ``io_threads > 1`` the
    per-read path overlaps fast5 IO + preprocessing across threads.
    Output order follows completion order (like the reference's
    collector).
    """
    n_processed = 0

    import time

    t_start = time.perf_counter()

    def log_rate(n):
        dt = time.perf_counter() - t_start
        if n and dt > 0:
            log(f"Factory: Processed {n} alignments in {dt:.1f}s "
                f"({n / dt:.2f} reads/s).", LogLevel.Info)

    if batch_size > 1:
        from collections import deque

        buf = []
        pending = deque()  # (n_lines, handle) — depth-2 pipeline

        def submit(lines):
            try:
                return detector.detect_batch_submit(lines, io_threads)
            except KeyboardInterrupt:
                raise
            except Exception:
                log("Factory: Unexpected error in batch submit, proceeding.\n"
                    + "".join(traceback.format_exception(*sys.exc_info())), LogLevel.Warning)
                return None

        def collect(n_lines, handle):
            nonlocal n_processed
            n_processed += n_lines
            if handle is None:
                return
            try:
                results = detector.detect_batch_finish(handle)
            except KeyboardInterrupt:
                raise
            except Exception:
                log("Factory: Unexpected error in batch, proceeding with remaining reads.\n"
                    + "".join(traceback.format_exception(*sys.exc_info())), LogLevel.Warning)
                return
            for result in results:
                if result:
                    writer.write_line(**result)

        for line in sam_lines:
            buf.append(line)
            if len(buf) >= batch_size:
                pending.append((len(buf), submit(buf)))
                buf = []
                if len(pending) >= 2:
                    collect(*pending.popleft())
        if buf:
            pending.append((len(buf), submit(buf)))
        while pending:
            collect(*pending.popleft())
        log_rate(n_processed)
        return n_processed

    def work(line):
        try:
            return detector.detect(line)
        except KeyboardInterrupt:
            raise
        except Exception:
            log("Factory: Unexpected error in worker, proceeding with remaining reads.\n"
                + "".join(traceback.format_exception(*sys.exc_info())), LogLevel.Warning)
            return None

    if io_threads <= 1:
        for line in sam_lines:
            result = work(line)
            n_processed += 1
            if result:
                writer.write_line(**result)
        log_rate(n_processed)
        return n_processed

    with ThreadPoolExecutor(max_workers=io_threads) as pool:
        # bounded in-flight window to cap memory
        window = io_threads * 4
        pending = []
        for line in sam_lines:
            pending.append(pool.submit(work, line))
            if len(pending) >= window:
                fut = pending.pop(0)
                result = fut.result()
                n_processed += 1
                if result:
                    writer.write_line(**result)
        for fut in pending:
            result = fut.result()
            n_processed += 1
            if result:
                writer.write_line(**result)
    log_rate(n_processed)
    return n_processed
