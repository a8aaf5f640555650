"""Ultra-long-read stream benchmark (VERDICT r4 item 3).

Two regimes on the real chip, full detection path (prep + align +
Viterbi + decode) through the production counter:

  * "long"  — 32 reads x ~0.5M samples (500 GGCCCC units): the one-pass
    kernel at a narrowed width (pointer budget shrinks the call batch);
  * "ultra" — 8 reads x ~1.2M samples (1200 units): past the pointer
    budget, the exact checkpointed two-pass route; under multiple
    devices its 8-wide groups round-robin across chips.

Reports reads/s, size-adjusted reads/s (vs the 22k-sample bench read),
and exact-count accuracy; writes ULTRALONG.json.  The reference's
full-matrix SeqAn DP exhausts host RAM in the ultra regime
(reference src/align_raw.h:117-158) — there is no baseline number to
compare against, only exactness.

Usage: python tools/bench_ultralong.py [--regimes long,ultra]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

MODEL_FILE = "/root/reference/models/r9_4_450bps.model"
BENCH_READ_SAMPLES = 21857  # bench.py's uniform read length


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regimes", default="long,ultra")
    ap.add_argument("--out", default=os.path.join(REPO, "ULTRALONG.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/strique_tpu_cache"))

    from bench import PREFIX, SUFFIX
    from strique_tpu.detect.counter import RepeatCounter
    from strique_tpu.pore_model import PoreModel

    pm = PoreModel(MODEL_FILE)
    counter = RepeatCounter(MODEL_FILE)
    counter.add_target("c9orf72", "GGCCCC", PREFIX, SUFFIX)

    regimes = {
        "long": {"reads": 32, "repeats": 500, "backbone": 28000},
        "ultra": {"reads": 8, "repeats": 1200, "backbone": 70000},
    }
    results = {}
    rng = np.random.default_rng(4242)
    for name in args.regimes.split(","):
        cfg = regimes[name]
        bb = "".join(rng.choice(list("ACTG"), 2 * cfg["backbone"]))
        seq = (bb[: cfg["backbone"]] + PREFIX + "GGCCCC" * cfg["repeats"]
               + SUFFIX + bb[-cfg["backbone"]:])
        sigs = [pm.generate_signal(seq, samples=8, noise=True, rng=rng)
                for _ in range(cfg["reads"])]
        mlen = max(len(s) for s in sigs)
        sigs = [np.pad(s, (0, mlen - len(s)), mode="edge") for s in sigs]
        print(f"[{name}] {cfg['reads']} reads x {mlen} samples", flush=True)

        outs = counter.detect_many("c9orf72", sigs, "+")  # compile + warm
        t0 = time.perf_counter()
        outs = counter.detect_many("c9orf72", sigs, "+")
        dt = time.perf_counter() - t0
        ok = sum(int(o[0] == cfg["repeats"]) for o in outs)
        rps = cfg["reads"] / dt
        adj = rps * mlen / BENCH_READ_SAMPLES
        results[name] = {
            "reads": cfg["reads"], "samples_per_read": int(mlen),
            "repeats": cfg["repeats"], "reads_per_sec": round(rps, 3),
            "size_adjusted_reads_per_sec": round(adj, 1),
            "accuracy": f"{ok}/{cfg['reads']}", "wall_s": round(dt, 2),
            "n_devices": len(jax.local_devices()),
            "backend": jax.default_backend(),
        }
        print(json.dumps(results[name]), flush=True)

    with open(args.out, "w") as fp:
        json.dump(results, fp, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
