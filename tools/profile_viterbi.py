"""Split Viterbi fwd/bwd timing and align per-call timing on the bench shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODEL_FILE = "/root/reference/models/r9_4_450bps.model"
PREFIX = ("CGGCAGCCGAACCCCAAACAGCCACCCGCCAGGATGCCGCCTCCTCACTCACCCACTCGCCACCGCCTGCGCC"
          "TCCGCCGCCGCGGGCGCAGGCACCGCAACCGCAGCCCCGCCCCGGGCCCGCCCCCGGGCCCGCCCCGACCACGCCCC")
SUFFIX = ("TAGCGCGCGACTCCTGAGTTCCAGAGCTTGCTACAGGCTGCGGTTGTTTCCCTCCTTGTTTTCTTCTGGTTAA"
          "TCTTTATCAGGTCTTTTCTTGTTCACCCTCAGCGAGTACTGTGAGAGCAAGTAGTGGGGAGAGAGGGTGGGAAAAAC")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/strique_tpu_cache")
    import jax.numpy as jnp

    from strique_tpu.detect.counter import RepeatCounter
    from strique_tpu.hmm.models import build_flanked_repeat
    from strique_tpu.ops.viterbi_pallas import (CHUNK_T, PaddedHMM,
                                                viterbi_forward_pallas_multi,
                                                viterbi_backward_batch)
    from strique_tpu.pore_model import PoreModel

    pm = PoreModel(MODEL_FILE)
    chm = build_flanked_repeat("GGCCCC", PREFIX[-50:], SUFFIX[:50], pm, None)
    ph = PaddedHMM(chm)
    print(f"n_states={chm.n_states} sp={ph.sp}")

    B = 64
    T = 24576
    seg = 5263
    rng = np.random.default_rng(0)
    obs = jnp.asarray(rng.normal(90, 10, (B, T)).astype(np.float32))
    tact = jnp.full((B,), seg, jnp.int32)

    def fwd_one(o, t):
        return viterbi_forward_pallas_multi(
            o[None], t[None], ph.trans, ph.transT, ph.start_col,
            ph.mu, ph.sigma, ph.uni, ph.luni,
            ph.mu_col, ph.sigma_col, ph.uni_col, ph.luni_col, R=1)

    fwd = jax.jit(lambda o, t: jax.vmap(fwd_one)(o, t))
    bwd = jax.jit(lambda sc, last, tact, mt: viterbi_backward_batch(
        sc, last, tact, mt, ph.transT))

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return np.asarray(s)

    r = fwd(obs, tact)
    sync(r)
    sc = r[0].reshape(B, T, ph.sp)
    last = jnp.zeros((B,), jnp.int32)
    pr = bwd(sc, last, tact, jnp.int32(seg))
    sync(pr)

    for _ in range(3):
        t0 = time.perf_counter()
        r = fwd(obs, tact)
        sync(r)
        t1 = time.perf_counter()
        pr = bwd(sc, last, tact, jnp.int32(seg))
        sync(pr)
        t2 = time.perf_counter()
        print(f"fwd {1e3*(t1-t0):7.1f} ms   bwd {1e3*(t2-t1):7.1f} ms"
              f"   ({1e9*(t1-t0)/(B*seg):5.0f} / {1e9*(t2-t1)/(B*seg):5.0f} ns/read-step)")

    # align per-call
    from strique_tpu.ops import align as align_ops
    counter = RepeatCounter(MODEL_FILE)
    counter.add_target("c9", "GGCCCC", PREFIX, SUFFIX)
    tc = counter.targets["c9"][0]
    n_sigs = np.full((B,), 21855, np.int32)
    morph = obs
    pre = align_ops.align_batch(morph, n_sigs, tc.prefix_ext, counter.align_params)
    sync({k: v for k, v in pre.items()})
    for _ in range(3):
        t0 = time.perf_counter()
        pre = align_ops.align_batch(morph, n_sigs, tc.prefix_ext, counter.align_params)
        sync({k: v for k, v in pre.items()})
        t1 = time.perf_counter()
        cells = B * T * len(tc.prefix_ext)
        print(f"align one flank: {1e3*(t1-t0):7.1f} ms  ({cells/(t1-t0)/1e9:.1f} Gcells/s, M={len(tc.prefix_ext)})")


if __name__ == "__main__":
    main()
