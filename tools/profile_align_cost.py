"""Decompose the align kernel's per-column cost by timing ablated variants.

The forward kernel is issue-bound (NOTES.md); this measures how the
issue slots split between the score transcendental (pow 1.2), the
vertical-gap prefix-max fold, and the pointer bookkeeping, by compiling
variants with each piece stubbed out (results are wrong; only timing
matters).  Directs whether an MXU score-table gather (the morph channel
is 256-level quantized, so score columns live in a (256, MP) table) is
worth building.

Usage: python tools/profile_align_cost.py   (real TPU)
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODEL_FILE = "/root/reference/models/r9_4_450bps.model"
PREFIX = ("CGGCAGCCGAACCCCAAACAGCCACCCGCCAGGATGCCGCCTCCTCACTCACCCACTCGCCACCGCCTGCGCC"
          "TCCGCCGCCGCGGGCGCAGGCACCGCAACCGCAGCCCCGCCCCGGGCCCGCCCCCGGGCCCGCCCCGACCACGCCCC")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/strique_tpu_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from strique_tpu.ops import align_pallas as AP
    from strique_tpu.ops.reference import AlignParams
    from strique_tpu.pore_model import PoreModel

    pm = PoreModel(MODEL_FILE)
    tmpl = pm.generate_signal(PREFIX, samples=6).astype(np.float32)
    params = AlignParams()
    B, N = AP.BATCH_TPU, 24576
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.uniform(70, 110, (B, N)).astype(np.float32))
    na = jnp.asarray(np.full(B, N - 64, np.int32))
    tmpl_padded, m = AP.pad_template(tmpl)

    def run_once(fwd):
        ptr, bottom = fwd(sig, na, jnp.asarray(tmpl_padded), params, m)
        # axon: only D2H synchronizes; a scalar reduction forces the kernel
        # without paying the 3 MB bottom-row download that would mask it
        np.asarray(jnp.sum(bottom))

    # the scalar sync itself costs a flat ~20 ms D2H round trip on the
    # tunnel; measure and subtract it or every share reads ~2x too small
    # (this artifact originally made B=64 look 1.33x -- it is ~neutral)
    tiny = jnp.ones((8, 128))
    np.asarray(jnp.sum(tiny))
    sync_samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jnp.sum(tiny))
        sync_samples.append(time.perf_counter() - t0)
    sync_cost = min(sync_samples)
    print(f"flat sync cost   {sync_cost*1e3:8.1f} ms (subtracted)")

    def timed(name, fwd, reps=5):
        run_once(fwd)  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run_once(fwd)
            ts.append(time.perf_counter() - t0)
        t = min(ts) - sync_cost
        print(f"{name:16s} {t*1e3:8.1f} ms")
        return t

    def make_variant(no_pow=False, no_cummax=False, no_ptr=False):
        """Clone of AP._align_kernel with pieces ablated (timing only)."""
        def kernel(params, m_actual, sig_ref, tmpl_ref, nact_ref, ptr_ref,
                   bottom_ref, S_ref, Ih_ref):
            go_h = np.float32(params.gap_open_h)
            go_v = np.float32(params.gap_open_v)
            ge_h = np.float32(params.gap_extension_h)
            ge_v = np.float32(params.gap_extension_v)
            off = np.float32(params.dist_offset)
            dmin = np.float32(params.dist_min)
            g = np.float32(max(params.gap_extension_v, params.gap_open_v))
            batch, mp = S_ref.shape
            lane_ii = jax.lax.broadcasted_iota(jnp.int32, (batch, mp), 1)
            lane_i = lane_ii.astype(jnp.float32)
            row0 = lane_ii == 0
            sel_iota = jax.lax.broadcasted_iota(jnp.int32, (batch, AP.CHUNK), 1)
            chunk = pl.program_id(0)

            @pl.when(chunk == 0)
            def _init():
                S0 = go_v + ge_v * (lane_i - 1.0)
                S_ref[:, :] = jnp.where(row0, 0.0, S0)
                Ih_ref[:, :] = jnp.full((batch, mp), AP.NEG)

            tmpl_row = tmpl_ref[:, :]
            nact = nact_ref[:, :]
            sig_tile = sig_ref[:, :]

            def shift1(x, fill):
                return jnp.concatenate(
                    [jnp.full((batch, 1), fill, x.dtype), x[:, :-1]], axis=1)

            def col_body(c_in, u, carry):
                S, Ih, bt, acc = carry
                sel = sel_iota == c_in
                aj = jnp.max(jnp.where(sel, sig_tile, AP.NEG), axis=1, keepdims=True)
                diff = jnp.abs(aj - tmpl_row)
                if no_pow:
                    sc = jnp.maximum(off - diff, dmin)
                else:
                    sc = jnp.maximum(off - jnp.power(diff, np.float32(1.2)), dmin)
                newM = shift1(S, AP.NEG) + sc
                ih_ext = Ih + ge_h
                ih_open = S + go_h
                newIh = jnp.where(row0, AP.NEG, jnp.maximum(ih_ext, ih_open))
                Q = jnp.where(row0, 0.0, jnp.maximum(newM, newIh))
                cvec = Q + go_v - (lane_i + 1.0) * g
                if not no_cummax:
                    k = 1
                    while k < mp:
                        cvec = jnp.maximum(cvec, jnp.concatenate(
                            [jnp.full((batch, k), AP.NEG, jnp.float32), cvec[:, :-k]], axis=1))
                        k *= 2
                newIv = jnp.where(row0, AP.NEG, shift1(cvec, AP.NEG) + lane_i * g)
                newS = jnp.maximum(jnp.maximum(newM, newIh), newIv)
                newS = jnp.where(row0, 0.0, newS)
                if no_ptr:
                    acc = acc | jnp.zeros((batch, mp), jnp.int32)
                else:
                    which = jnp.where(newM >= newS, 0, jnp.where(newIv >= newS, 2, 1))
                    ihx = (ih_ext >= ih_open).astype(jnp.int32) << 2
                    ivx = (shift1(newIv, AP.NEG) + ge_v >= shift1(newS, 0.0) + go_v).astype(jnp.int32) << 3
                    pbi = which | ihx | ivx
                    pb_shifted = jnp.concatenate([pbi[:, 1:], pbi[:, :1]], axis=1)
                    acc = acc | (pb_shifted << (4 * u))
                j = chunk * AP.CHUNK + c_in + 1
                live = j <= nact
                bval = jnp.where(live, newS[:, m_actual:m_actual + 1], AP.NEG)
                bt = jnp.where(sel, bval, bt)
                return newS, newIh, bt, acc

            def col_body8(q, carry):
                S, Ih, bt = carry
                acc = jnp.zeros((batch, mp), jnp.int32)
                for u in range(8):
                    S, Ih, bt, acc = col_body(q * 8 + u, u, (S, Ih, bt, acc))
                ptr_ref[q, :, :] = acc
                return S, Ih, bt

            carry0 = (S_ref[:, :], Ih_ref[:, :], jnp.zeros((batch, AP.CHUNK), jnp.float32))
            S_fin, Ih_fin, bt_fin = jax.lax.fori_loop(0, AP.CHUNK // 8, col_body8, carry0)
            S_ref[:, :] = S_fin
            Ih_ref[:, :] = Ih_fin
            bottom_ref[:, :] = bt_fin

        @partial(jax.jit, static_argnames=("params", "m_actual"))
        def fwd(signals, n_actual, template_padded, params, m_actual):
            Bc, Nc = signals.shape
            mp = template_padded.shape[1]
            return pl.pallas_call(
                partial(kernel, params, m_actual),
                grid=(Nc // AP.CHUNK,),
                in_specs=[
                    pl.BlockSpec((Bc, AP.CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((Bc, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((AP.CHUNK // 8, Bc, mp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((Bc, AP.CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((Nc // 8, Bc, mp), jnp.int32),
                    jax.ShapeDtypeStruct((Bc, Nc), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((Bc, mp), jnp.float32),
                    pltpu.VMEM((Bc, mp), jnp.float32),
                ],
            )(signals, template_padded, n_actual[:, None].astype(jnp.int32))
        return fwd

    base = timed("baseline", make_variant())
    nopow = timed("no-pow", make_variant(no_pow=True))
    nocm = timed("no-cummax", make_variant(no_cummax=True))
    noptr = timed("no-pointer", make_variant(no_ptr=True))
    print(f"\npow share:     {(base - nopow) / base * 100:5.1f}%")
    print(f"cummax share:  {(base - nocm) / base * 100:5.1f}%")
    print(f"pointer share: {(base - noptr) / base * 100:5.1f}%")

    # latency-vs-issue check: if the serial column chain (not issue slots)
    # binds, doubling the per-kernel batch is nearly free
    for mult in (2, 4):
        Bw = B * mult
        sigw = jnp.asarray(rng.uniform(70, 110, (Bw, N)).astype(np.float32))
        naw = jnp.asarray(np.full(Bw, N - 64, np.int32))

        def run_wide(fwd=make_variant(), s=sigw, n=naw):
            ptr, bottom = fwd(s, n, jnp.asarray(tmpl_padded), params, m)
            np.asarray(jnp.sum(bottom))

        run_wide()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            run_wide()
            ts.append(time.perf_counter() - t0)
        w = min(ts) - sync_cost
        print(f"B={Bw:3d}: {w*1e3:8.1f} ms  ({w/base:.2f}x time for {mult}x reads -> "
              f"{mult/ (w/base):.2f}x throughput)")


if __name__ == "__main__":
    main()
