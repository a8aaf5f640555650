"""Latency probe: can two independent DP chains hide each other's latency?

The wave align kernel is latency-bound (~600 ns/step of width-independent
overhead on top of issue time; NOTES.md round 4).  If that overhead is
dependency-chain latency, interleaving TWO independent half-width chains
in one kernel should cost far less than 2x a single chain — pointing to
a pairs-of-half-batches production shape.  If it is per-step bookkeeping,
dual-chain costs ~2x and the idea dies here.

Measures, on the real chip (score-only bodies, same op structure as the
production kernel):  single chain B=64  vs  dual chain 2 x B=32.

Usage: python tools/probe_dual_chain.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/strique_tpu_cache"))

    NEG = -1e30
    CHUNK = 128
    go_h, go_v, ge_h, ge_v = -1.0, -16.0, -1.0, -16.0
    off, g = 16.0, -16.0

    def make_kernel(n_chains):
        def kern(*refs):
            sig_refs = refs[:n_chains]
            tmpl_refs = refs[n_chains : 2 * n_chains]
            out_refs = refs[2 * n_chains : 3 * n_chains]
            scratch = refs[3 * n_chains :]
            # scratch per chain: S1, S2, Ih, C, R
            batch, mp = scratch[0].shape
            lane_ii = jax.lax.broadcasted_iota(jnp.int32, (batch, mp), 1)
            lane_i = lane_ii.astype(jnp.float32)
            chunk = pl.program_id(0)

            @pl.when(chunk == 0)
            def _init():
                for c in range(n_chains):
                    scratch[5 * c + 0][:, :] = jnp.full((batch, mp), NEG)
                    scratch[5 * c + 1][:, :] = jnp.full((batch, mp), NEG)
                    scratch[5 * c + 2][:, :] = jnp.full((batch, mp), NEG)
                    scratch[5 * c + 3][:, :] = jnp.full((batch, mp), NEG)
                    scratch[5 * c + 4][:, :] = jnp.full((batch, mp), NEG)

            def shift1(x, fill):
                return jnp.concatenate(
                    [jnp.full((batch, 1), fill, x.dtype), x[:, :-1]], axis=1)

            def step(tmpl, carry):
                S1, S2, Ih, C, R, rot, bt = carry
                aj = rot[:, 0:1]
                rot = jnp.concatenate([rot[:, 1:], rot[:, :1]], axis=1)
                R = jnp.concatenate([jnp.broadcast_to(aj, (batch, 1)), R[:, :-1]], axis=1)
                sc = jnp.maximum(off - jnp.power(jnp.abs(R - tmpl), np.float32(1.2)), 0.0)
                newIh = jnp.maximum(Ih + ge_h, S1 + go_h)
                newM = shift1(S2, 0.0) + sc
                Q = jnp.maximum(newM, newIh)
                cvec = Q + go_v - (lane_i + 1.0) * g
                C_sh = shift1(C, NEG)
                newC = jnp.maximum(C_sh, cvec)
                newIv = C_sh + lane_i * g
                newS = jnp.maximum(Q, newIv)
                bt = jnp.concatenate([bt[:, 1:], newS[:, 8:9]], axis=1)
                return (S2, newS, newIh, newC, R, rot, bt)

            def body8(q, carrys):
                out = []
                for c in range(n_chains):
                    carry = carrys[c]
                    for u in range(8):
                        carry = step(tmpl_refs[c][:, :], carry)
                    out.append(carry)
                return tuple(out)

            carrys = tuple(
                (scratch[5 * c + 0][:, :], scratch[5 * c + 1][:, :],
                 scratch[5 * c + 2][:, :], scratch[5 * c + 3][:, :],
                 scratch[5 * c + 4][:, :], sig_refs[c][:, :],
                 jnp.zeros((batch, CHUNK), jnp.float32))
                for c in range(n_chains))
            carrys = jax.lax.fori_loop(0, CHUNK // 8, body8, carrys)
            for c in range(n_chains):
                S1, S2, Ih, C, R, rot, bt = carrys[c]
                scratch[5 * c + 0][:, :] = S1
                scratch[5 * c + 1][:, :] = S2
                scratch[5 * c + 2][:, :] = Ih
                scratch[5 * c + 3][:, :] = C
                scratch[5 * c + 4][:, :] = R
                out_refs[c][:, :] = bt
        return kern

    def run(n_chains, B, N, mp):
        rng = np.random.default_rng(0)
        sigs = [jnp.asarray(rng.uniform(60, 120, (B, N)).astype(np.float32))
                for _ in range(n_chains)]
        tmpls = [jnp.asarray(rng.uniform(60, 120, (1, mp)).astype(np.float32))
                 for _ in range(n_chains)]
        grid = (N // CHUNK,)
        fn = pl.pallas_call(
            make_kernel(n_chains),
            grid=grid,
            in_specs=[pl.BlockSpec((B, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM)
                      for _ in range(n_chains)]
                     + [pl.BlockSpec((1, mp), lambda i: (0, 0), memory_space=pltpu.VMEM)
                        for _ in range(n_chains)],
            out_specs=[pl.BlockSpec((B, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM)
                       for _ in range(n_chains)],
            out_shape=[jax.ShapeDtypeStruct((B, N), jnp.float32)
                       for _ in range(n_chains)],
            scratch_shapes=[pltpu.VMEM((B, mp), jnp.float32)
                            for _ in range(5 * n_chains)],
            interpret=jax.default_backend() != "tpu",
        )

        @jax.jit
        def probe(*args):
            outs = fn(*args)
            return sum(jnp.sum(o) for o in outs)

        args = sigs + tmpls
        np.asarray(probe(*args))
        res = {}
        for K in (1, 5):
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                rs = [probe(*args) for _ in range(K)]
                for r in rs:
                    np.asarray(r)
                ts.append(time.perf_counter() - t0)
            res[K] = sum(sorted(ts)[:3]) / 3
        return (res[5] - res[1]) / 4 * 1000

    N, mp = 24576, 896
    for n_chains, B in ((1, 64), (2, 32), (1, 32), (4, 16)):
        try:
            v = run(n_chains, B, N, mp)
            rows = n_chains * B
            print(f"chains={n_chains} B={B} ({rows} rows): {v:.1f} ms/call "
                  f"= {v / rows * 1000:.0f} us/row", flush=True)
        except Exception as e:
            print(f"chains={n_chains} B={B}: FAILED {type(e).__name__} {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
