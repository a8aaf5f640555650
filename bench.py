"""End-to-end throughput benchmark: synthetic c9orf72 reads/sec.

Workload: full detection path (host preprocessing + flank alignment DP +
HMM Viterbi + decode) on synthetic noisy reads of ~23k samples with 100
repeat units — the same per-read work the reference pipeline does
(reference scripts/STRique.py:581-616) at a typical read scale.

Baseline model (no published reference throughput exists; see
BASELINE.md): the reference's per-read cost on this workload is estimated
from its engines' characteristic rates — SeqAn AVX2 affine DP ~2.5e8
cells/s and pomegranate Cython Viterbi ~1e8 edge-ops/s on a desktop CPU
core — giving ~0.4 s/read, i.e. ~2.5 reads/s single-threaded.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_READS_PER_SEC = 2.5

MODEL_FILE = "/root/reference/models/r9_4_450bps.model"
PREFIX = ("CGGCAGCCGAACCCCAAACAGCCACCCGCCAGGATGCCGCCTCCTCACTCACCCACTCGCCACCGCCTGCGCC"
          "TCCGCCGCCGCGGGCGCAGGCACCGCAACCGCAGCCCCGCCCCGGGCCCGCCCCCGGGCCCGCCCCGACCACGCCCC")
SUFFIX = ("TAGCGCGCGACTCCTGAGTTCCAGAGCTTGCTACAGGCTGCGGTTGTTTCCCTCCTTGTTTTCTTCTGGTTAA"
          "TCTTTATCAGGTCTTTTCTTGTTCACCCTCAGCGAGTACTGTGAGAGCAAGTAGTGGGGAGAGAGGGTGGGAAAAAC")


def main():
    import jax

    # persistent kernel cache: first run pays ~2-4 min of Mosaic compiles,
    # subsequent runs start hot
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/strique_tpu_cache"))

    from strique_tpu.detect.counter import RepeatCounter
    from strique_tpu.pore_model import PoreModel

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    n_warm = batch  # warm with one full-size batch so all shapes compile
    n_reads = int(os.environ.get("BENCH_READS", "128"))
    repeats = 100

    pm = PoreModel(MODEL_FILE)
    counter = RepeatCounter(MODEL_FILE)
    counter.add_target("c9orf72", "GGCCCC", PREFIX, SUFFIX)

    rng = np.random.default_rng(1234)
    backbone = "".join(rng.choice(list("ACTG"), 2000))
    seq = backbone[:1000] + PREFIX + "GGCCCC" * repeats + SUFFIX + backbone[-1000:]
    # same sequence, fresh noise per read; identical length -> one jit bucket
    sigs = [pm.generate_signal(seq, samples=8, noise=True, rng=rng) for _ in range(n_warm + n_reads)]
    max_len = max(len(s) for s in sigs)
    sigs = [np.pad(s, (0, max_len - len(s)), mode="edge") for s in sigs]

    correct = 0
    counter.detect_many("c9orf72", sigs[:n_warm], "+")
    counter.detect_many("c9orf72", sigs[:n_warm], "+")
    t0 = time.perf_counter()
    # depth-2 pipeline: next batch's preprocessing+alignment overlaps this
    # batch's transfers and Viterbi
    pending = []
    for b0 in range(n_warm, n_warm + n_reads, batch):
        pending.append(counter.detect_submit("c9orf72", sigs[b0:b0 + batch], "+"))
        if len(pending) >= 2:
            for res in counter.detect_finish(pending.pop(0)):
                correct += int(res[0] == repeats)
    for state in pending:
        for res in counter.detect_finish(state):
            correct += int(res[0] == repeats)
    dt = time.perf_counter() - t0

    rps = n_reads / dt
    result = {
        "metric": "reads_per_sec",
        "value": round(rps, 3),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 3),
    }
    print(json.dumps(result))
    print(f"# {n_reads} reads in {dt:.2f}s; count accuracy {correct}/{n_reads}; "
          f"read length {max_len}", file=sys.stderr)


if __name__ == "__main__":
    main()
