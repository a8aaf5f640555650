"""Slope-based kernel timing: per-call cost without the flat D2H term."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/strique_tpu_cache")
import jax.numpy as jnp
import numpy as np
import strique_tpu.ops.align_pallas as ap
from strique_tpu.ops.reference import AlignParams

params = AlignParams()
N, M, B = 24576, 870, 32
rng = np.random.default_rng(0)
sigs = jnp.asarray(rng.normal(0, 1, (B, N)).astype(np.float32))
tmpl = rng.normal(0, 1, M).astype(np.float32)
tp_np, m = ap.pad_template(tmpl)
tp = jnp.asarray(tp_np)
nact = jnp.full((B,), N, jnp.int32)

def run(k):
    acc = None
    for i in range(k):
        ptr, bot = ap.align_forward_pallas(sigs + np.float32(i) * 0, nact, tp, params, m)
        s = jnp.sum(ptr.astype(jnp.int32)) + jnp.sum(bot)
        acc = s if acc is None else acc + s
    return float(np.asarray(acc))

run(1)  # warm
for k in (1, 5):
    t0 = time.time(); run(k); t1 = time.time()
    if k == 1: t_one = t1 - t0
    else: t_five = t1 - t0
per_call = (t_five - t_one) / 4
cells = B * N * M
print(f"t(1)={t_one:.3f}s t(5)={t_five:.3f}s  per-call={per_call*1e3:.1f}ms  "
      f"{cells/per_call/1e9:.2f} Gcells/s  flat~{t_one-per_call:.3f}s")
