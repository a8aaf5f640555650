"""Split align forward vs traceback cost on bench-like morph signals."""
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

    from strique_tpu import native as native_lib
    from strique_tpu.detect.counter import RepeatCounter, pad_bucket
    from strique_tpu.ops import align as align_ops
    from strique_tpu.ops.align_pallas import (CHUNK as ALIGN_CHUNK,
                                              align_forward_pallas, pad_template)
    from strique_tpu.ops.prep import model_const
    from strique_tpu.pore_model import PoreModel

    B = 32
    repeats = 100
    pm = PoreModel(MODEL_FILE)
    counter = RepeatCounter(MODEL_FILE)
    counter.add_target("c9", "GGCCCC", PREFIX, SUFFIX)
    tc = counter.targets["c9"][0]

    rng = np.random.default_rng(1234)
    backbone = "".join(rng.choice(list("ACTG"), 2000))
    seq = backbone[:1000] + PREFIX + "GGCCCC" * repeats + SUFFIX + backbone[-1000:]
    sigs = [pm.generate_signal(seq, samples=8, noise=True, rng=rng) for _ in range(B)]
    max_len = max(len(s) for s in sigs)
    sigs = [np.pad(s, (0, max_len - len(s)), mode="edge") for s in sigs]
    npad = pad_bucket(max_len)
    npad = (npad + ALIGN_CHUNK - 1) // ALIGN_CHUNK * ALIGN_CHUNK

    mc = model_const(pm)
    morphs = np.zeros((B, npad), np.float32)
    for i, s in enumerate(sigs):
        m, f = native_lib.preprocess_read(np.asarray(s, np.float64), mc)
        morphs[i, : len(m)] = m
    morph_dev = jnp.asarray(morphs)
    n_sigs = jnp.asarray(np.full((B,), max_len, np.int32))

    tmpl_padded, m_actual = pad_template(np.asarray(tc.prefix_ext))
    tmpl_dev = jnp.asarray(tmpl_padded)

    fwd = jax.jit(lambda s, n: align_forward_pallas(s, n, tmpl_dev,
                                                    counter.align_params, m_actual))

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return np.asarray(s)

    ptr, bottom = fwd(morph_dev, n_sigs)
    sync((ptr, bottom))

    b0 = jnp.float32(counter.align_params.gap_open_v) + jnp.float32(
        counter.align_params.gap_extension_v) * (m_actual - 1)
    bot = jnp.concatenate([jnp.full((B, 1), b0), bottom], axis=1)
    j_end = jnp.argmax(bot, axis=1).astype(jnp.int32)

    tb = jax.jit(lambda p, je: jax.vmap(
        lambda pp, jj: align_ops.traceback_pointers(pp, jj, m_actual, packed=True),
        in_axes=(1, 0))(p, je))
    r = tb(ptr, j_end)
    sync(r)

    for _ in range(3):
        t0 = time.perf_counter()
        ptr, bottom = fwd(morph_dev, n_sigs)
        sync((ptr, bottom))
        t1 = time.perf_counter()
        r = tb(ptr, j_end)
        sync(r)
        t2 = time.perf_counter()
        print(f"fwd {1e3*(t1-t0):7.1f} ms   tb {1e3*(t2-t1):7.1f} ms (B={B})")

    jb = np.asarray(r["j_begin"])
    je = np.asarray(j_end)
    print(f"walk span: j_end-j_begin min={int((je-jb).min())} max={int((je-jb).max())}"
          f" mean={float((je-jb).mean()):.0f}; steps ~ span+{m_actual}")


if __name__ == "__main__":
    main()
