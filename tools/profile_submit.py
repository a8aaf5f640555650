"""Break detect_submit into prep / upload / dispatch for the ragged batches.

Times, per ragged close()-time batch: native prep fan-out, host->device
transfer (jnp.asarray of the packed byte buffer), and pipeline dispatch.
Directly instruments the counter internals via monkeypatch so the
production code path is unchanged.

Usage: python tools/profile_submit.py   (real TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/strique_tpu_cache"))
    import jax.numpy as jnp

    from bench import MODEL_FILE, PREFIX, SUFFIX
    from strique_tpu.detect.counter import RepeatCounter, signal_bucket
    from strique_tpu.detect.stream import StreamScheduler
    from tools.adjudicate_ragged import build_ragged_reads

    pm, ragged = build_ragged_reads()
    counter = RepeatCounter(MODEL_FILE)
    counter.add_target("c9orf72", "GGCCCC", PREFIX, SUFFIX)

    events = []

    real_asarray = jnp.asarray

    orig_submit = counter.detect_submit

    def timed_submit(target, raws, strand, preps=None):
        rec = {"B": len(raws), "bucket": signal_bucket(max(len(r) for r in raws))}
        marks = {}

        def patched_asarray(x, *a, **k):
            if isinstance(x, np.ndarray) and x.dtype == np.uint8 and x.ndim == 2:
                marks["up0"] = time.perf_counter()
                out = real_asarray(x, *a, **k)
                out.block_until_ready()
                marks["up1"] = time.perf_counter()
                rec["MB"] = x.nbytes / 1e6
                return out
            return real_asarray(x, *a, **k)

        t0 = time.perf_counter()
        jnp.asarray = patched_asarray
        try:
            state = orig_submit(target, raws, strand, preps)
        finally:
            jnp.asarray = real_asarray
        t1 = time.perf_counter()
        rec["submit_ms"] = (t1 - t0) * 1e3
        if "up0" in marks:
            rec["prep_ms"] = (marks["up0"] - t0) * 1e3
            rec["upload_ms"] = (marks["up1"] - marks["up0"]) * 1e3
            rec["dispatch_ms"] = (t1 - marks["up1"]) * 1e3
        events.append(rec)
        return state

    counter.detect_submit = timed_submit

    def ragged_pass():
        res = {}
        sched = StreamScheduler(counter, lambda ctx, out: res.__setitem__(ctx, out),
                                batch_size=int(os.environ.get("BENCH_BATCH", "64")))
        for i, (strand, nrep, sig) in enumerate(ragged):
            sched.add(i, "c9orf72", strand, sig)
        sched.close()
        return res

    ragged_pass()  # warm/compile
    events.clear()
    t0 = time.perf_counter()
    ragged_pass()
    wall = time.perf_counter() - t0

    print(f"{'B':>3s} {'bucket':>7s} {'MB':>6s} {'submit':>7s} {'prep':>6s} "
          f"{'upload':>7s} {'disp':>6s}")
    for e in events:
        print(f"{e['B']:3d} {e['bucket']:7d} {e.get('MB', 0):6.1f} "
              f"{e['submit_ms']:7.1f} {e.get('prep_ms', 0):6.1f} "
              f"{e.get('upload_ms', 0):7.1f} {e.get('dispatch_ms', 0):6.1f}")
    tot = lambda k: sum(e.get(k, 0) for e in events)
    print(f"\nwall {wall*1e3:.0f} ms  submit {tot('submit_ms'):.0f}  "
          f"prep {tot('prep_ms'):.0f}  upload {tot('upload_ms'):.0f} "
          f"({tot('MB'):.1f} MB)  dispatch {tot('dispatch_ms'):.0f}")


if __name__ == "__main__":
    main()
