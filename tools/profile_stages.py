"""Per-stage timing of the bench workload (host prep / align / viterbi /
pack+D2H / host decode) to direct optimization effort.

Timing on axon: only D2H synchronizes, so each device stage is timed by
materializing its output via np.asarray after a warmup, interleaved.
Stages are re-jitted standalone here; the production path fuses them
into one dispatch (counter._pipeline), timed as `pipeline_total`.
"""
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
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/strique_tpu_cache"))
    import jax.numpy as jnp

    from strique_tpu.detect.counter import (RepeatCounter, _buf_bytes,
                                            _unpack_upload, _LUT_LEVELS, pad_bucket)
    from strique_tpu.detect.packed import pack_results
    from strique_tpu import native as native_lib
    from strique_tpu.ops import align as align_ops
    from strique_tpu.ops.align_pallas import CHUNK as ALIGN_CHUNK
    from strique_tpu.ops.bounds import segment_bounds
    from strique_tpu.ops.prep import model_const
    from strique_tpu.ops.viterbi_pallas import CHUNK_T, viterbi_pallas_batch
    from strique_tpu.pore_model import PoreModel

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    repeats = 100
    pm = PoreModel(MODEL_FILE)
    counter = RepeatCounter(MODEL_FILE)
    counter.add_target("c9orf72", "GGCCCC", PREFIX, SUFFIX)
    tc = counter.targets["c9orf72"][0]

    rng = np.random.default_rng(1234)
    backbone = "".join(rng.choice(list("ACTG"), 2000))
    seq = backbone[:1000] + PREFIX + "GGCCCC" * repeats + SUFFIX + backbone[-1000:]
    sigs = [pm.generate_signal(seq, samples=8, noise=True, rng=rng) for _ in range(batch)]
    max_len = max(len(s) for s in sigs)
    sigs = [np.pad(s, (0, max_len - len(s)), mode="edge") for s in sigs]

    raws = [np.asarray(r, dtype=np.float64) for r in sigs]
    n_sigs = np.array([len(r) for r in raws], dtype=np.int32)
    npad = pad_bucket(int(n_sigs.max()))
    npad = (npad + ALIGN_CHUNK - 1) // ALIGN_CHUNK * ALIGN_CHUNK
    npad = (npad + CHUNK_T - 1) // CHUNK_T * CHUNK_T
    mc = model_const(pm)
    print(f"B={batch} npad={npad} read_len={max_len}")

    def t_host_prep():
        buf = np.zeros((batch, _buf_bytes(npad)), dtype=np.uint8)
        for i, raw in enumerate(raws):
            n = len(raw)
            row = buf[i]
            flt32 = row[: 4 * npad].view(np.float32)[:n]
            lut = row[4 * npad : 4 * npad + 4 * _LUT_LEVELS].view(np.float32)
            q = row[4 * npad + 4 * _LUT_LEVELS :][:n]
            native_lib.preprocess_read_lut(raw, mc, flt32, q, lut)
        return buf

    buf = t_host_prep()
    unpack_jit = jax.jit(_unpack_upload)

    def t_upload():
        return unpack_jit(jnp.asarray(buf))

    morph_dev, flt_dev = t_upload()
    n_dev = jnp.asarray(n_sigs)

    def t_align():
        pre = align_ops.align_batch(morph_dev, n_sigs, tc.prefix_ext, counter.align_params)
        suf = align_ops.align_batch(morph_dev, n_sigs, tc.suffix_ext, counter.align_params)
        return pre, suf

    pre, suf = t_align()
    trim_prefix = len(tc.prefix_ext) - len(tc.prefix)
    trim_suffix = len(tc.suffix_ext) - len(tc.suffix)
    bounds_jit = jax.jit(segment_bounds, static_argnames=("trim_prefix", "trim_suffix"))

    def t_bounds():
        return bounds_jit({k: pre[k] for k in ("score", "is_gap", "jpos")},
                          {k: suf[k] for k in ("score", "is_gap", "jpos")},
                          n_dev, trim_prefix=trim_prefix, trim_suffix=trim_suffix)

    b = t_bounds()
    roll_jit = jax.jit(lambda f, s: jax.vmap(lambda x, sh: jnp.roll(x, -sh))(f, s))

    def t_roll():
        return roll_jit(flt_dev, b["prefix_begin"])

    rolled = t_roll()
    ph = counter._padded_hmm(tc.repeat_hmm)

    def t_viterbi():
        return viterbi_pallas_batch(rolled, b["seg_len"], ph)

    _, paths = t_viterbi()
    n_states = tc.repeat_hmm.n_states
    pack_jit = jax.jit(lambda bb, pp: pack_results(bb, pp, n_states))

    def t_pack():
        return pack_jit(b, paths)

    packed = t_pack()

    def t_d2h():
        return np.asarray(packed)

    pipeline = counter._pipeline(tc, use_buf=True)

    def t_pipeline_total():
        return np.asarray(pipeline(jnp.asarray(buf), n_dev))

    def sync(x):
        # materialize a tiny reduction: forces execution on axon
        leaves = jax.tree_util.tree_leaves(x)
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
                if hasattr(l, "astype"))
        return np.asarray(s)

    stages = [
        ("host_prep", t_host_prep, False),
        ("upload+unpack", t_upload, True),
        ("align(x2)", t_align, True),
        ("bounds", t_bounds, True),
        ("roll", t_roll, True),
        ("viterbi", t_viterbi, True),
        ("pack", t_pack, True),
        ("d2h_packed", t_d2h, False),
        ("pipeline_total", t_pipeline_total, False),
    ]
    # warmup all
    for name, fn, dev in stages:
        r = fn()
        if dev:
            sync(r)
    reps = 3
    for _ in range(reps):
        for name, fn, dev in stages:
            t0 = time.perf_counter()
            r = fn()
            if dev:
                sync(r)
            dt = (time.perf_counter() - t0) * 1e3
            print(f"  {name:>14}: {dt:8.1f} ms  ({dt/batch*1000:7.0f} us/read)")
        print("  ---")
    seg = np.asarray(b["seg_len"])
    print(f"seg_len: max={seg.max()} mean={seg.mean():.0f}")


if __name__ == "__main__":
    main()
