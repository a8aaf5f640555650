"""Time the detection pipeline's phases on bench-like reads (real TPU)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/strique_tpu_cache")
import numpy as np
from strique_tpu.detect.counter import RepeatCounter
from strique_tpu.pore_model import PoreModel

MODEL = "/root/reference/models/r9_4_450bps.model"
PREFIX = ("CGGCAGCCGAACCCCAAACAGCCACCCGCCAGGATGCCGCCTCCTCACTCACCCACTCGCCACCGCCTGCGCC"
          "TCCGCCGCCGCGGGCGCAGGCACCGCAACCGCAGCCCCGCCCCGGGCCCGCCCCCGGGCCCGCCCCGACCACGCCCC")
SUFFIX = ("TAGCGCGCGACTCCTGAGTTCCAGAGCTTGCTACAGGCTGCGGTTGTTTCCCTCCTTGTTTTCTTCTGGTTAA"
          "TCTTTATCAGGTCTTTTCTTGTTCACCCTCAGCGAGTACTGTGAGAGCAAGTAGTGGGGAGAGAGGGTGGGAAAAAC")
B = 64
pm = PoreModel(MODEL)
counter = RepeatCounter(MODEL)
counter.add_target("c9orf72", "GGCCCC", PREFIX, SUFFIX)
rng = np.random.default_rng(1234)
backbone = "".join(rng.choice(list("ACTG"), 2000))
seq = backbone[:1000] + PREFIX + "GGCCCC" * 100 + SUFFIX + backbone[-1000:]
sigs = [pm.generate_signal(seq, samples=8, noise=True, rng=rng) for _ in range(B)]
mx = max(len(s) for s in sigs)
sigs = [np.pad(s, (0, mx - len(s)), mode="edge") for s in sigs]

# warm
counter.detect_many("c9orf72", sigs, "+")

import strique_tpu.detect.counter as C
import jax.numpy as jnp

for rep in range(2):
    t0 = time.time()
    st = counter.detect_submit("c9orf72", sigs, "+")
    t1 = time.time()
    packed = np.asarray(st["packed"])   # D2H align
    t2 = time.time()
    st["packed"] = jnp.asarray(packed) if False else st["packed"]
    res = counter.detect_finish(st)
    t3 = time.time()
    print(f"rep{rep}: submit(prep+align dispatch)={t1-t0:.3f}s  D2H align={t2-t1:.3f}s  "
          f"finish(bounds+viterbi+decode)={t3-t2:.3f}s  total={t3-t0:.3f}s")

# split finish further: time viterbi batch alone
st = counter.detect_submit("c9orf72", sigs, "+")
packed = np.asarray(st["packed"])
tc = st["tc"]
# reproduce bounds quickly via detect_finish path: just time _viterbi_batch
from strique_tpu.ops import align as align_ops
flts = st["flts"]; n_sigs = st["n_sigs"]
segs = [f[2000:8000].astype(np.float32) for f in flts]
t0 = time.time(); paths = counter._viterbi_batch(tc.repeat_hmm, segs); t1 = time.time()
print(f"viterbi batch (64 reads, T=6000->pad): {t1-t0:.3f}s  pathshape={paths.shape}")
t0 = time.time(); paths = counter._viterbi_batch(tc.repeat_hmm, segs); t1 = time.time()
print(f"viterbi batch hot: {t1-t0:.3f}s")
