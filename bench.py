"""End-to-end throughput benchmark: synthetic c9orf72 reads/sec.

Workload: full detection path (host preprocessing + flank alignment DP +
HMM Viterbi + decode) on synthetic noisy reads of ~23k samples with 100
repeat units — the same per-read work the reference pipeline does
(reference scripts/STRique.py:581-616) at a typical read scale.

Baseline (no published reference throughput exists; see BASELINE.md):
MEASURED on this host by tools/measure_baseline.py — the repo's own
single-threaded CPU implementations of the reference's engines on this
exact workload, with conservative credit factors for SeqAn AVX2 and
pomegranate's edge sparsity (BASELINE_MEASURED.json, 2.78 reads/s).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} plus a
"ragged_reads_per_sec" field measured on a realistic mixed-length
read stream (multiple pad buckets, partial batches, both strands).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

def _baseline_reads_per_sec() -> float:
    """Measured reference-engine baseline (tools/measure_baseline.py)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    try:
        with open(path) as fp:
            return float(json.load(fp)["reference_reads_per_sec_derived"])
    except (OSError, KeyError, ValueError):
        return 2.78


BASELINE_READS_PER_SEC = _baseline_reads_per_sec()

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

    from strique_tpu.ops.align import kernel_stats, reset_kernel_stats

    counter.detect_many("c9orf72", sigs[:n_warm], "+")
    counter.detect_many("c9orf72", sigs[:n_warm], "+")

    def uniform_pass():
        # three-stage pipeline (submit -> middle -> finish): batch k's
        # Viterbi and decodes overlap batch k+1's prep and alignment
        ok = 0
        pending = []
        for b0 in range(n_warm, n_warm + n_reads, batch):
            pending.append(counter.detect_submit("c9orf72", sigs[b0:b0 + batch], "+"))
            if len(pending) >= 2:
                pending[-2] = counter.detect_middle(pending[-2])
            if len(pending) >= 3:
                for res in counter.detect_finish(pending.pop(0)):
                    ok += int(res[0] == repeats)
        for state in pending:
            for res in counter.detect_finish(state):
                ok += int(res[0] == repeats)
        return ok

    # best of two timed passes: the tunnel link's bandwidth fluctuates
    # run to run, and a transfer hiccup should not masquerade as a
    # regression in a compute benchmark.  Both passes are reported
    # (value = best, plus mean and spread) so cross-round comparisons
    # can tell link noise from real regressions.
    n_timed = int(os.environ.get("BENCH_PASSES", "3"))
    correct = uniform_pass()
    dts = []
    reset_kernel_stats()
    for _ in range(n_timed):
        t0 = time.perf_counter()
        correct = uniform_pass()
        dts.append(time.perf_counter() - t0)
    # issued DP cells per wall second (BASELINE.md north-star metric:
    # cell-updates/s separates kernel regressions from link noise).
    # Cells are identical across passes; rate uses the best pass.
    ustats = kernel_stats()
    cells_per_pass = ustats["cells"] // len(dts)
    dt = min(dts)
    rps = n_reads / dt
    rps_mean = n_reads / (sum(dts) / len(dts))
    # ragged phase: realistic stream — mixed read lengths spanning several
    # pad buckets, mixed repeat counts (different Viterbi segment buckets),
    # both strands (separate device pipelines), partial batches
    n_ragged = int(os.environ.get("BENCH_RAGGED_READS", "192"))
    from strique_tpu.detect.counter import reverse_complement

    ragged = []
    for i in range(n_ragged):
        nrep = (50, 100, 150)[i % 3]
        bb_n = int(rng.choice((500, 2000, 6000)))
        bb = "".join(rng.choice(list("ACTG"), max(2 * bb_n, 2)))
        rseq = bb[:bb_n] + PREFIX + "GGCCCC" * nrep + SUFFIX + bb[-bb_n:]
        strand = "+" if i % 2 == 0 else "-"
        if strand == "-":
            rseq = reverse_complement(rseq)
        ragged.append((strand, nrep, pm.generate_signal(rseq, samples=8, noise=True, rng=rng)))
    import random

    random.Random(5).shuffle(ragged)

    def ragged_pass():
        # the production stream path: reads queue by (target, strand, jit
        # bucket) and flush as full shape-homogeneous batches
        from strique_tpu.detect.stream import StreamScheduler

        res = {}
        sched = StreamScheduler(counter, lambda ctx, out: res.__setitem__(ctx, out),
                                batch_size=batch)
        for i, (strand, nrep, sig) in enumerate(ragged):
            sched.add(i, "c9orf72", strand, sig)
        sched.close()
        return sum(int(res.get(i) is not None and res[i][0] == nrep)
                   for i, (_, nrep, _) in enumerate(ragged))

    # mod phase: methylation calling throughput (the reference paper's
    # headline use case, scripts/STRique.py:605-609).  Canonical- and
    # mCpG-generated reads stream through the 4-stage scheduler (mod
    # Viterbi dispatches overlapped, not as a post-batch tail); counts
    # must stay exact and the two populations must separate.
    MOD_MODEL_FILE = "/root/reference/models/r9_4_450bps_mCpG.model"
    n_mod = int(os.environ.get("BENCH_MOD_READS", "96"))
    pm_mod = PoreModel(MOD_MODEL_FILE)
    mod_counter = RepeatCounter(MODEL_FILE, mod_model_file=MOD_MODEL_FILE)
    mod_counter.add_target("c9orf72", "GGCCCC", PREFIX, SUFFIX)
    mod_repeats = 50
    mseq = backbone[:1000] + PREFIX + "GGCCCC" * mod_repeats + SUFFIX + backbone[-1000:]
    mod_sigs = []
    for i in range(n_mod):
        gen = pm if i % 2 == 0 else pm_mod
        mod_sigs.append(gen.generate_signal(mseq, samples=8, noise=True, rng=rng))
    mlen = max(len(s) for s in mod_sigs)
    mod_sigs = [np.pad(s, (0, mlen - len(s)), mode="edge") for s in mod_sigs]

    def mod_pass():
        from strique_tpu.detect.stream import StreamScheduler

        res = {}
        sched = StreamScheduler(mod_counter, lambda ctx, out: res.__setitem__(ctx, out),
                                batch_size=batch)
        for i, sig in enumerate(mod_sigs):
            sched.add(i, "c9orf72", "+", sig)
        sched.close()
        ok = sep = 0
        for i in range(n_mod):
            r = res.get(i)
            if r is None or r[0] != mod_repeats or not r[6] or r[6] == "-":
                continue
            ok += 1
            frac1 = r[6].count("1") / len(r[6])
            sep += int(frac1 > 0.5 if i % 2 else frac1 < 0.5)
        return ok, sep

    mod_pass()  # warm/compile the mod pipelines
    dts_mod = []
    for _ in range(n_timed):
        t0 = time.perf_counter()
        mod_ok, mod_sep = mod_pass()
        dts_mod.append(time.perf_counter() - t0)
    mod_rps = n_mod / min(dts_mod)

    ragged_pass()  # compile the bucket set + warm

    # per-stage host-blocking wall split for the ragged stream: submit =
    # native prep + upload + align dispatch (async thread), middle =
    # bounds D2H + Viterbi dispatch, finish = path D2H + decode.  The
    # stages overlap (4-deep pipeline), so they need not sum to the wall;
    # the split tells a kernel regression from link noise in-artifact.
    stage_ms = {"submit": 0.0, "middle": 0.0, "mod": 0.0, "finish": 0.0}

    def _wrap_stage(name, fn):
        def wrapped(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            stage_ms[name] += (time.perf_counter() - t0) * 1e3
            return out
        return wrapped

    counter.detect_submit = _wrap_stage("submit", counter.detect_submit)
    counter.detect_middle = _wrap_stage("middle", counter.detect_middle)
    counter.detect_mod_submit = _wrap_stage("mod", counter.detect_mod_submit)
    counter.detect_finish = _wrap_stage("finish", counter.detect_finish)

    dts_ragged = []
    stage_runs = []
    ragged_cells = 0
    for _ in range(n_timed):
        for k in stage_ms:
            stage_ms[k] = 0.0
        reset_kernel_stats()
        t0 = time.perf_counter()
        ragged_ok = ragged_pass()
        dts_ragged.append(time.perf_counter() - t0)
        stage_runs.append(dict(stage_ms))
        ragged_cells = kernel_stats()["cells"]
    dt_ragged = min(dts_ragged)
    ragged_stage_ms = stage_runs[dts_ragged.index(dt_ragged)]
    ragged_rps = n_ragged / dt_ragged
    ragged_rps_mean = n_ragged / (sum(dts_ragged) / len(dts_ragged))

    def spread_pct(ts):
        return round((max(ts) - min(ts)) / min(ts) * 100, 1)

    result = {
        "metric": "reads_per_sec",
        "value": round(rps, 3),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 3),
        "ragged_reads_per_sec": round(ragged_rps, 3),
        "mod_reads_per_sec": round(mod_rps, 3),
        "baseline_reads_per_sec": BASELINE_READS_PER_SEC,
        # value/ragged are best-of-2 (link noise suppression); the means
        # and pass-to-pass spreads keep cross-round comparisons honest
        "timing": f"best_of_{n_timed}",
        "mean_reads_per_sec": round(rps_mean, 3),
        "ragged_mean_reads_per_sec": round(ragged_rps_mean, 3),
        "spread_pct": spread_pct(dts),
        "ragged_spread_pct": spread_pct(dts_ragged),
        # DP cell-updates/s (issued cells / wall of the best pass) — the
        # BASELINE.md:19 north-star kernel metric
        "align_cell_updates_per_sec": round(cells_per_pass / dt, 0),
        "ragged_cell_updates_per_sec": round(ragged_cells / dt_ragged, 0),
        # ragged host-blocking wall per pipeline stage (stages overlap)
        "ragged_stage_ms": {k: round(v, 1) for k, v in ragged_stage_ms.items()},
    }
    print(json.dumps(result))
    print(f"# {n_reads} reads in {dt:.2f}s; count accuracy {correct}/{n_reads}; "
          f"read length {max_len}", file=sys.stderr)
    print(f"# ragged: {n_ragged} reads in {dt_ragged:.2f}s; accuracy {ragged_ok}/{n_ragged}",
          file=sys.stderr)
    print(f"# mod: {n_mod} reads in {min(dts_mod):.2f}s; count accuracy {mod_ok}/{n_mod}; "
          f"separation {mod_sep}/{n_mod}", file=sys.stderr)


if __name__ == "__main__":
    main()
