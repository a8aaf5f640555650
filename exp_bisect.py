"""Bisect the align kernel's per-column cost: disable pieces, measure slope."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/strique_tpu_cache")
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from strique_tpu.ops.reference import AlignParams

NEG = -1e30
CHUNK = 128
B, N, M = 32, 24576, 870
MP = 896
params = AlignParams()

rng = np.random.default_rng(0)
sigs = jnp.asarray(rng.normal(0, 1, (B, N)).astype(np.float32))
tmpl_p = np.full((1, MP), 1e30, np.float32); tmpl_p[0, 1:M+1] = rng.normal(0, 1, M)
tp = jnp.asarray(tmpl_p)
nact = jnp.full((B,), N, jnp.int32)


def make_kernel(mode):
    def _kern(sig_ref, tmpl_ref, nact_ref, ptr_ref, bottom_ref, S_ref, Ih_ref):
        go_h = np.float32(params.gap_open_h); go_v = np.float32(params.gap_open_v)
        ge_h = np.float32(params.gap_extension_h); ge_v = np.float32(params.gap_extension_v)
        off = np.float32(params.dist_offset); dmin = np.float32(params.dist_min)
        g = np.float32(max(params.gap_extension_v, params.gap_open_v))
        batch, mp = S_ref.shape
        lane_ii = jax.lax.broadcasted_iota(jnp.int32, (batch, mp), 1)
        lane_i = lane_ii.astype(jnp.float32)
        row0 = lane_ii == 0
        sel_iota = jax.lax.broadcasted_iota(jnp.int32, (batch, CHUNK), 1)
        chunk = pl.program_id(0)

        @pl.when(chunk == 0)
        def _init():
            S_ref[:, :] = jnp.where(row0, 0.0, go_v + ge_v * (lane_i - 1.0))
            Ih_ref[:, :] = jnp.full((batch, mp), NEG)

        tmpl = tmpl_ref[:, :]
        sig_tile = sig_ref[:, :]

        def shift1(x, fill):
            return jnp.concatenate([jnp.full((batch, 1), fill, x.dtype), x[:, :-1]], axis=1)

        def col_body_pack(c_in, u, carry):
            S, Ih, bt, acc = carry
            sel = sel_iota == c_in
            aj = jnp.max(jnp.where(sel, sig_tile, NEG), axis=1, keepdims=True)
            diff = jnp.abs(aj - tmpl)
            sc = jnp.maximum(off - jnp.power(diff, np.float32(1.2)), dmin)
            newM = shift1(S, NEG) + sc
            ih_ext = Ih + ge_h
            ih_open = S + go_h
            newIh = jnp.where(row0, NEG, jnp.maximum(ih_ext, ih_open))
            Q = jnp.where(row0, 0.0, jnp.maximum(newM, newIh))
            cvec = Q + go_v - (lane_i + 1.0) * g
            k = 1
            while k < mp:
                cvec = jnp.maximum(cvec, jnp.concatenate(
                    [jnp.full((batch, k), NEG, jnp.float32), cvec[:, :-k]], axis=1))
                k *= 2
            newIv = jnp.where(row0, NEG, shift1(cvec, NEG) + lane_i * g)
            newS = jnp.maximum(jnp.maximum(newM, newIh), newIv)
            newS = jnp.where(row0, 0.0, newS)
            which = jnp.where(newM >= newS, 0, jnp.where(newIv >= newS, 2, 1))
            ihx = (ih_ext >= ih_open).astype(jnp.int32) << 2
            ivx = (shift1(newIv, NEG) + ge_v >= shift1(newS, 0.0) + go_v).astype(jnp.int32) << 3
            pb = which | ihx | ivx
            pb = jnp.concatenate([pb[:, 1:], pb[:, :1]], axis=1)
            acc = acc | (pb << (4 * u))
            bval = newS[:, 870:871]
            bt = jnp.where(sel_iota == c_in, bval, bt)
            return (S, Ih, bt, acc) if False else (newS, newIh, bt, acc)

        def col_body(c_in, carry):
            S, Ih, bt = carry
            if mode == "noaj":
                aj = jnp.float32(0.5)
            else:
                sel = sel_iota == c_in
                aj = jnp.max(jnp.where(sel, sig_tile, NEG), axis=1, keepdims=True)
            diff = jnp.abs(aj - tmpl)
            if mode == "nopow":
                sc = jnp.maximum(off - diff, dmin)
            else:
                sc = jnp.maximum(off - jnp.power(diff, np.float32(1.2)), dmin)
            newM = shift1(S, NEG) + sc
            ih_ext = Ih + ge_h
            ih_open = S + go_h
            newIh = jnp.where(row0, NEG, jnp.maximum(ih_ext, ih_open))
            Q = jnp.where(row0, 0.0, jnp.maximum(newM, newIh))
            if mode == "nocummax":
                newIv = Q + g
            else:
                cvec = Q + go_v - (lane_i + 1.0) * g
                k = 1
                while k < mp:
                    cvec = jnp.maximum(cvec, jnp.concatenate(
                        [jnp.full((batch, k), NEG, jnp.float32), cvec[:, :-k]], axis=1))
                    k *= 2
                newIv = jnp.where(row0, NEG, shift1(cvec, NEG) + lane_i * g)
            newS = jnp.maximum(jnp.maximum(newM, newIh), newIv)
            newS = jnp.where(row0, 0.0, newS)
            if mode == "noptr":
                pass
            else:
                which = jnp.where(newM >= newS, 0, jnp.where(newIv >= newS, 2, 1))
                ihx = (ih_ext >= ih_open).astype(jnp.int32) << 2
                ivx = (shift1(newIv, NEG) + ge_v >= shift1(newS, 0.0) + go_v).astype(jnp.int32) << 3
                pb = (which | ihx | ivx).astype(jnp.int8)
                pb_shifted = jnp.concatenate([pb[:, 1:], pb[:, :1]], axis=1)
                ptr_ref[c_in, :, :] = pb_shifted
            bval = newS[:, 870:871]
            bt = jnp.where(sel_iota == c_in, bval, bt)
            return newS, newIh, bt

        if mode == "pack8":
            def col8(q, carry):
                S, Ih, bt = carry
                acc = jnp.zeros((batch, mp), jnp.int32)
                for u in range(8):
                    S, Ih, bt, acc = col_body_pack(q * 8 + u, u, (S, Ih, bt, acc))
                ptr_ref[q, :, :] = acc
                return S, Ih, bt
        else:
            def col8(q, carry):
                for u in range(8):
                    carry = col_body(q * 8 + u, carry)
                return carry

        carry0 = (S_ref[:, :], Ih_ref[:, :], jnp.zeros((batch, CHUNK), jnp.float32))
        S_fin, Ih_fin, bt = jax.lax.fori_loop(0, CHUNK // 8, col8, carry0)
        S_ref[:, :] = S_fin
        Ih_ref[:, :] = Ih_fin
        bottom_ref[:, :] = bt
    return _kern


@partial(jax.jit, static_argnames=("mode",))
def run_mode(sigs, nact, tp, mode):
    if mode == "pack8":
        ptr_spec = pl.BlockSpec((CHUNK // 8, B, MP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ptr_shape = jax.ShapeDtypeStruct((N // 8, B, MP), jnp.int32)
    else:
        ptr_spec = pl.BlockSpec((CHUNK, B, MP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ptr_shape = jax.ShapeDtypeStruct((N, B, MP), jnp.int8)
    return pl.pallas_call(
        make_kernel(mode),
        grid=(N // CHUNK,),
        in_specs=[
            pl.BlockSpec((B, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MP), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            ptr_spec,
            pl.BlockSpec((B, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            ptr_shape,
            jax.ShapeDtypeStruct((B, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, MP), jnp.float32), pltpu.VMEM((B, MP), jnp.float32)],
    )(sigs, tp, nact[:, None].astype(jnp.int32))


def go(mode, k):
    acc = None
    for i in range(k):
        ptr, bot = run_mode(sigs + np.float32(i) * 0, nact, tp, mode)
        s = jnp.sum(ptr.astype(jnp.int32)) + jnp.sum(bot)
        acc = s if acc is None else acc + s
    return float(np.asarray(acc))

MODES = ("full", "pack8")
for mode in MODES:
    go(mode, 1)  # warm all compiles first
best = {m: [] for m in MODES}
for rep in range(4):
    for mode in MODES:
        t0 = time.time(); go(mode, 1); t1 = time.time(); go(mode, 5); t2 = time.time()
        best[mode].append((t2 - t1 - (t1 - t0)) / 4)
for mode in MODES:
    per = min(best[mode])
    print(f"{mode:10s} per-call {per*1e3:7.1f} ms  ({B*N*M/per/1e9:6.2f} Gcells/s)  all={[round(x*1e3,1) for x in best[mode]]}")
