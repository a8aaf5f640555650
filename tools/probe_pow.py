"""Probe cheaper Mosaic lowerings for the score's |d|^1.2 transcendental.

WAVE_FLOOR.json's ablation puts jnp.power(d, 1.2) at ~0.37 us/step of
the wave kernel's ~1.0 us/step (the largest single issue cost; the
score sc is off the serial chain, so this is pure VPU issue pressure).
This tool times the production wave kernel with the pow expression
swapped via the ``pow_impl`` static arg of align_forward_wave, and
checks each candidate's full kernel outputs (pointer plane + bottom
row) BITWISE against the production kernel:

  power      jnp.power(d, 1.2)                      (production)
  exp-log    jnp.exp(1.2 * jnp.log(d))
  exp2-log2  jnp.exp2(1.2 * jnp.log2(d))
  x*exp2     d * jnp.exp2(0.2 * jnp.log2(d))

Timing amortizes the tunnel's drifting flat D2H sync latency over K
deferred-sync calls (per-call subtraction produced negative times).  A
candidate is a free swap only when bit-identical AND faster.  Writes
POW_PROBE.json.

Usage: python tools/probe_pow.py    (real TPU)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODEL_FILE = "/root/reference/models/r9_4_450bps.model"
PREFIX = ("CGGCAGCCGAACCCCAAACAGCCACCCGCCAGGATGCCGCCTCCTCACTCACCCACTCGCCACCGCCTGCGCC"
          "TCCGCCGCCGCGGGCGCAGGCACCGCAACCGCAGCCCCGCCCCGGGCCCGCCCCCGGGCCCGCCCCGACCACGCCCC")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/strique_tpu_cache"))
    import jax.numpy as jnp

    from strique_tpu.ops import align_pallas as AP
    from strique_tpu.ops.reference import AlignParams
    from strique_tpu.pore_model import PoreModel

    pm = PoreModel(MODEL_FILE)
    tmpl = pm.generate_signal(PREFIX, samples=6).astype(np.float32)
    params = AlignParams()
    B, N = AP.BATCH_TPU_WAVE, 24576
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.uniform(70, 110, (B, N)).astype(np.float32))
    na = jnp.asarray(np.full(B, N - 64, np.int32))
    tmpl_padded, m = AP.pad_template(tmpl)
    tp = jnp.asarray(tmpl_padded)
    mp = tmpl_padded.shape[1]
    nd = N + mp

    def timed(name, call, reps=3, k=4):
        np.asarray(call())  # compile + warm + sync
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(k - 1):
                call()
            np.asarray(call())
            ts.append((time.perf_counter() - t0) / k)
        per_step = min(ts) / nd * 1e6
        print(f"{name:16s} {min(ts)*1e3:8.2f} ms   {per_step:7.3f} us/step")
        return per_step

    results = {"shape": {"B": B, "N": N, "MP": mp, "ND": nd},
               "timing": "amortized_k4"}

    variants = {
        "power": None,  # production expression
        "exp-log": lambda d: jnp.exp(np.float32(1.2) * jnp.log(d)),
        "exp2-log2": lambda d: jnp.exp2(np.float32(1.2) * jnp.log2(d)),
        "x*exp2": lambda d: d * jnp.exp2(np.float32(0.2) * jnp.log2(d)),
    }

    ref_ptr = ref_bot = None
    for name, impl in variants.items():
        def call(impl=impl):
            ptr, bottom = AP.align_forward_wave(sig, na, tp, params, m, True,
                                                pow_impl=impl)
            return jnp.sum(bottom)

        ptr, bottom = AP.align_forward_wave(sig, na, tp, params, m, True,
                                            pow_impl=impl)
        ptr, bottom = np.asarray(ptr), np.asarray(bottom)
        if name == "power":
            ref_ptr, ref_bot = ptr, bottom
            same = True
        else:
            same = bool((ptr == ref_ptr).all()) and bool((bottom == ref_bot).all())
            print(f"  {name}: bit-identical={same}")
        results[f"{name}_us_step"] = timed(name, call)
        results[f"{name}_bit_identical"] = same

    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "POW_PROBE.json")
    with open(out_path, "w") as fp:
        json.dump(results, fp, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
