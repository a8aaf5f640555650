"""Feed-rate stress: can this host feed 8 chips at full speed?

The multi-chip scaling claim (NOTES.md "Host ceiling") rests on
arithmetic: 1.28 core-ms/read of host work vs 8 x 265 reads/s of device
throughput.  This harness MEASURES the only part of that claim this
single-chip environment can exercise at scale: the complete host path —
native preprocessing, the 4-stage stream scheduler, result decode,
row formatting — driven flat-out against a zero-latency device stub
(recorded real device outputs returned instantly), i.e. the feed rate an
infinitely fast device array would see.

Outputs one JSON line and STRESS_FEED.json:
    host_feed_reads_per_sec   achieved end-to-end host rate
    target_reads_per_sec      8 chips x measured single-chip rate
    margin                    achieved / target

Run on the CPU backend (the device stub never dispatches):
    JAX_PLATFORM_NAME=cpu python tools/stress_feed.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODEL = "/root/reference/models/r9_4_450bps.model"
PREFIX = ("CGGCAGCCGAACCCCAAACAGCCACCCGCCAGGATGCCGCCTCCTCACTCACCCACTCGCCACCGCCTGCGCC"
          "TCCGCCGCCGCGGGCGCAGGCACCGCAACCGCAGCCCCGCCCCGGGCCCGCCCCCGGGCCCGCCCCGACCACGCCCC")
SUFFIX = ("TAGCGCGCGACTCCTGAGTTCCAGAGCTTGCTACAGGCTGCGGTTGTTTCCCTCCTTGTTTTCTTCTGGTTAA"
          "TCTTTATCAGGTCTTTTCTTGTTCACCCTCAGCGAGTACTGTGAGAGCAAGTAGTGGGGAGAGAGGGTGGGAAAAAC")


def main():
    target_per_chip = float(os.environ.get("STRESS_CHIP_READS_PER_SEC", "265"))
    n_chips = int(os.environ.get("STRESS_CHIPS", "8"))
    n_stream = int(os.environ.get("STRESS_READS", "4096"))
    batch = int(os.environ.get("STRESS_BATCH", "64"))

    from strique_tpu.detect.counter import RepeatCounter
    from strique_tpu.detect.stream import StreamScheduler
    from strique_tpu.detect.writer import OutputWriter
    from strique_tpu.pore_model import PoreModel

    pm = PoreModel(MODEL)
    counter = RepeatCounter(MODEL)
    counter.add_target("c9orf72", "GGCCCC", PREFIX, SUFFIX)
    tc = counter.targets["c9orf72"][0]

    rng = np.random.default_rng(42)
    backbone = "".join(rng.choice(list("ACTG"), 2000))
    seq = backbone[:1000] + PREFIX + "GGCCCC" * 100 + SUFFIX + backbone[-1000:]
    base = pm.generate_signal(seq, samples=8, noise=True, rng=rng)
    # distinct signals (fresh noise) so per-read host work is not
    # degenerately cacheable; one shared length keeps one jit bucket
    uniq = [pm.generate_signal(seq, samples=8, noise=True, rng=rng) for _ in range(batch)]
    n = min(len(base), min(len(s) for s in uniq))
    uniq = [s[:n] for s in uniq]

    # --- record one REAL device batch, then stub the device ------------
    state = counter.detect_submit("c9orf72", uniq, "+")
    state = counter.detect_middle(state)
    recorded_meta = np.asarray(state["bounds_dev"])
    recorded_paths = np.asarray(state["vit"]["paths"]) if state.get("vit") else None
    outs = counter.detect_finish(state)
    assert all(o[0] == 100 for o in outs), "stress workload must count exactly"

    counter._dev_cache[("bounds", id(tc))] = lambda buf, n_sigs: recorded_meta
    if recorded_paths is not None:
        counter._dev_cache[("vitpipe", id(tc.repeat_hmm))] = (
            lambda obs, lens: recorded_paths)

    # --- drive the full host path flat out -----------------------------
    import tempfile

    out_tsv = os.path.join(tempfile.mkdtemp(prefix="stress_feed"), "counts.tsv")
    writer = OutputWriter(out_tsv)
    done = [0]

    def on_result(ctx, out):
        if out is not None:
            writer.write_line([(f"read{ctx}", "c9orf72", "+", *out)])
            done[0] += 1

    def stream_pass():
        done[0] = 0
        sched = StreamScheduler(counter, on_result, batch_size=batch)
        for i in range(n_stream):
            sched.add(i, "c9orf72", "+", uniq[i % batch])
        sched.close()
        return done[0]

    stream_pass()  # warm pools/caches
    t0 = time.perf_counter()
    completed = stream_pass()
    dt = time.perf_counter() - t0
    rate = completed / dt
    target = target_per_chip * n_chips
    cores = os.cpu_count() or 1
    per_core = rate / cores
    result = {
        "host_feed_reads_per_sec": round(rate, 1),
        "target_reads_per_sec": round(target, 1),
        "chips": n_chips,
        "per_chip_reads_per_sec": target_per_chip,
        "margin": round(rate / target, 3),
        "reads": completed,
        "wall_s": round(dt, 3),
        "host_cores": cores,
        "feed_reads_per_sec_per_core": round(per_core, 1),
        "cores_needed_for_target": round(target / per_core, 2),
        "note": "zero-latency device stub (recorded real outputs); measures the "
                "complete host path: native prep, 4-stage scheduler, decode, writer",
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "STRESS_FEED.json"), "w") as fp:
        json.dump(result, fp, indent=1)


if __name__ == "__main__":
    main()
