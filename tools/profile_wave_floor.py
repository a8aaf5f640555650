"""Decompose the wave kernel's per-step serial floor + speed-of-light bound.

The wavefront align kernel is latency-bound on its serial per-diagonal
chain (NOTES.md: per-call time flat in width, ~0.7 us/step at the bench
shape).  This tool answers WHERE a step's time goes, with two probe
families compiled at the production shape (B=64 rows, MP=896 lanes):

  1. ablations of the real kernel body (no pow, no pointer accumulate,
     no signal-window shifts, no bottom tap) — each removal's share;
  2. synthetic micro-kernels with exactly k serially dependent vector
     ops per step (k = 0 "empty loop" .. 24), fitting
     time/step = a + b*k: ``a`` is the Mosaic loop/step overhead floor,
     ``b`` the per-dependent-op latency.

The real kernel's serial chain is ~12 dependent vector ops per step
(carry-to-carry: R-window shift -> |diff| -> pow -> score -> newM
(shift+add) -> Q -> cvec -> newC (shift+max) -> newIv -> newS, plus the
pointer compare/or/rotate chain riding the same carries), so the latency
speed-of-light for this formulation is ~ a + 12*b; the printed bound is
real_per_step / SOL.  Writes WAVE_FLOOR.json next to the repo's other
artifacts.

Usage: python tools/profile_wave_floor.py    (real TPU)
"""
import json
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
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/strique_tpu_cache"))
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
    mp = tmpl_padded.shape[1]
    nd = N + mp

    # flat D2H sync cost (axon: only D2H synchronizes)
    tiny = jnp.ones((8, 128))
    np.asarray(jnp.sum(tiny))
    sync = min(
        (lambda t0: (np.asarray(jnp.sum(tiny)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(5))
    print(f"flat sync cost {sync*1e3:6.1f} ms (subtracted)")

    def timed(name, call, steps, reps=3, k=4):
        """``call`` returns an un-synced device value; K calls amortize the
        tunnel's flat D2H sync latency (which drifts tens of ms between
        syncs — per-call subtraction produced negative times)."""
        np.asarray(call())  # compile + warm + sync
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(k - 1):
                call()
            np.asarray(call())
            ts.append(time.perf_counter() - t0)
        t = (min(ts) - sync) / k
        per_step = t / steps * 1e6
        print(f"{name:28s} {t*1e3:8.2f} ms   {per_step:7.3f} us/step")
        return per_step

    results = {"shape": {"B": B, "N": N, "MP": mp, "ND": nd}}

    # ------------------------------------------------------------------
    # 1. production kernel + ablations
    # ------------------------------------------------------------------
    def run_prod(with_ptr):
        def call():
            ptr, bottom = AP.align_forward_wave(sig, na, jnp.asarray(tmpl_padded),
                                                params, m, with_ptr)
            return jnp.sum(bottom)
        return call

    results["prod_full_us_step"] = timed("production (ptr)", run_prod(True), nd)
    results["prod_score_us_step"] = timed("production (score-only)", run_prod(False), nd)

    def make_ablated(no_pow=False, no_rot=False, no_bt=False, no_ptr=False,
                     no_shifts=False, parallel_r=False):
        """Wave body clone with pieces removed (timing only, wrong math) —
        except ``parallel_r``, which is a CANDIDATE optimization with
        full correct math: the 8 unrolled reversed-window states derive
        in parallel from the iteration-base R + a static window slice,
        taking both per-step signal rotates OFF the serial chain."""
        go_h, go_v = np.float32(params.gap_open_h), np.float32(params.gap_open_v)
        ge_h, ge_v = np.float32(params.gap_extension_h), np.float32(params.gap_extension_v)
        off, dmin = np.float32(params.dist_offset), np.float32(params.dist_min)
        g = np.float32(max(params.gap_extension_v, params.gap_open_v))

        def kernel(sig_ref, tmpl_ref, nact_ref, ptr_ref, bottom_ref,
                   S1_ref, S2_ref, Ih_ref, C_ref, BV_ref, R_ref):
            batch, mpk = S1_ref.shape
            lane_ii = jax.lax.broadcasted_iota(jnp.int32, (batch, mpk), 1)
            lane_i = lane_ii.astype(jnp.float32)
            row0 = lane_ii == 0
            chunk = pl.program_id(0)

            @pl.when(chunk == 0)
            def _init():
                S1_ref[:, :] = jnp.where(row0, 0.0, AP.NEG)
                S2_ref[:, :] = jnp.full((batch, mpk), AP.NEG)
                Ih_ref[:, :] = jnp.full((batch, mpk), AP.NEG)
                C_ref[:, :] = jnp.full((batch, mpk), AP.NEG)
                BV_ref[:, :] = jnp.zeros((batch, mpk), jnp.int32)
                R_ref[:, :] = jnp.full((batch, mpk), AP.NEG)

            tmplv = tmpl_ref[:, :]
            nact = nact_ref[:, :]
            sig_tile = sig_ref[:, :]

            def shift1(x, fill):
                if no_shifts:
                    return x
                return jnp.concatenate([jnp.full((batch, 1), fill, x.dtype), x[:, :-1]], axis=1)

            def diag_body(c_in, u, carry, R_pre=None):
                S1, S2, Ih, C, BV, R, rot, bt, acc = carry
                t = chunk * AP.CHUNK + c_in
                if R_pre is not None:
                    R = R_pre  # parallel-R: precomputed off the serial chain
                else:
                    aj = rot[:, 0:1]
                    if not no_rot:
                        rot = jnp.concatenate([rot[:, 1:], rot[:, :1]], axis=1)
                        R = jnp.concatenate([jnp.broadcast_to(aj, (batch, 1)), R[:, :-1]], axis=1)
                diff = jnp.abs(R - tmplv)
                if no_pow:
                    sc = jnp.maximum(off - diff, dmin)
                else:
                    sc = jnp.maximum(off - jnp.power(diff, np.float32(1.2)), dmin)
                ih_ext = Ih + ge_h
                ih_open = S1 + go_h
                newIh = jnp.maximum(ih_ext, ih_open)
                newM = shift1(S2, -params.dist_min) + sc
                Q = jnp.maximum(newM, newIh)
                cvec = Q + go_v - (lane_i + 1.0) * g
                C_sh = shift1(C, AP.NEG)
                newC = jnp.maximum(C_sh, cvec)
                newIv = C_sh + lane_i * g
                newS = jnp.maximum(Q, newIv)
                if no_ptr:
                    newBV = BV
                else:
                    which = jnp.where(newM >= newS, 0, jnp.where(newIv >= newS, 2, 1))
                    ihx = (ih_ext >= ih_open).astype(jnp.int32) << 2
                    ivx = shift1(BV, 0) << 3
                    newBV = (newIv + ge_v >= newS + go_v).astype(jnp.int32)
                    pbi = which | ihx | ivx
                    pb_shifted = jnp.concatenate([pbi[:, 1:], pbi[:, :1]], axis=1)
                    acc = acc | (pb_shifted << (4 * u))
                if not no_bt:
                    j = t + 1 - m
                    live = (j >= 1) & (j <= nact)
                    bval = jnp.where(live, newS[:, m : m + 1], AP.NEG)
                    bt = jnp.concatenate([bt[:, 1:], bval], axis=1)
                return S1, newS, newIh, newC, newBV, R, rot, bt, acc

            def body8(q, carry):
                S1, S2, Ih, C, BV, R, rot, bt = carry
                acc = jnp.zeros((batch, mpk), jnp.int32)
                if parallel_r:
                    # all 8 reversed-window states derive from the
                    # iteration-base R + this iteration's 8-lane signal
                    # window (static lanes 0..7 of rot; rot rotates by 8
                    # ONCE per iteration) — independent concats, OFF the
                    # serial chain
                    head = [rot[:, v : v + 1] for v in range(8)]  # a[t+v]
                    R_pres = [jnp.concatenate(
                        [*(head[v] for v in range(u, -1, -1)),
                         R[:, : mpk - u - 1]], axis=1)
                        for u in range(8)]
                    for u in range(8):
                        S2, S1, Ih, C, BV, R_dead, rot_d, bt, acc = diag_body(
                            q * 8 + u, u, (S1, S2, Ih, C, BV, R, rot, bt, acc),
                            R_pre=R_pres[u])
                    R = R_pres[7]
                    rot = jnp.concatenate([rot[:, 8:], rot[:, :8]], axis=1)
                else:
                    for u in range(8):
                        S2, S1, Ih, C, BV, R, rot, bt, acc = diag_body(
                            q * 8 + u, u, (S1, S2, Ih, C, BV, R, rot, bt, acc))
                if not no_ptr:
                    ptr_ref[q, :, :] = acc
                return S1, S2, Ih, C, BV, R, rot, bt

            carry0 = (S1_ref[:, :], S2_ref[:, :], Ih_ref[:, :], C_ref[:, :],
                      BV_ref[:, :], R_ref[:, :], sig_tile,
                      jnp.zeros((batch, AP.CHUNK), jnp.float32))
            S1f, S2f, Ihf, Cf, BVf, Rf, _rotf, btf = jax.lax.fori_loop(
                0, AP.CHUNK // 8, body8, carry0)
            S1_ref[:, :] = S1f
            S2_ref[:, :] = S2f
            Ih_ref[:, :] = Ihf
            C_ref[:, :] = Cf
            BV_ref[:, :] = BVf
            R_ref[:, :] = Rf
            bottom_ref[:, :] = btf

        @jax.jit
        def fwd(signals, n_actual, template_padded):
            Bc = signals.shape[0]
            sig_ext = jnp.pad(signals, ((0, 0), (0, mp)))
            return pl.pallas_call(
                kernel,
                grid=(nd // AP.CHUNK,),
                in_specs=[
                    pl.BlockSpec((Bc, AP.CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((Bc, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((AP.CHUNK // 8, Bc, mp), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Bc, AP.CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((nd // 8, Bc, mp), jnp.int32),
                    jax.ShapeDtypeStruct((Bc, nd), jnp.float32),
                ],
                scratch_shapes=[pltpu.VMEM((Bc, mp), jnp.float32) for _ in range(4)]
                + [pltpu.VMEM((Bc, mp), jnp.int32), pltpu.VMEM((Bc, mp), jnp.float32)],
            )(sig_ext, template_padded, n_actual[:, None].astype(jnp.int32))
        return fwd

    def run_abl(**kw):
        fwd = make_ablated(**kw)
        def call():
            ptr, bottom = fwd(sig, na, jnp.asarray(tmpl_padded))
            return jnp.sum(bottom)
        return call

    base = timed("ablation-baseline", run_abl(), nd)
    results["ablation_baseline_us_step"] = base
    for name, kw in (("no-pow", {"no_pow": True}),
                     ("no-pointer", {"no_ptr": True}),
                     ("no-rotations", {"no_rot": True}),
                     ("no-bottom-tap", {"no_bt": True}),
                     ("no-lane-shifts", {"no_shifts": True, "no_ptr": True})):
        v = timed(name, run_abl(**kw), nd)
        results[f"{name}_us_step"] = v
        print(f"    -> share {max(base - v, 0) / base * 100:5.1f}%")

    # candidate optimization: parallel-R (full math) — verify bit-equal
    # outputs against the ablation baseline, then time it
    fwd_base = make_ablated()
    fwd_pr = make_ablated(parallel_r=True)
    pb1, bb1 = fwd_base(sig, na, jnp.asarray(tmpl_padded))
    pb2, bb2 = fwd_pr(sig, na, jnp.asarray(tmpl_padded))
    same = bool(np.asarray(jnp.all(bb1 == bb2))) and bool(np.asarray(jnp.all(pb1 == pb2)))
    results["parallel_r_bit_identical"] = same
    print(f"parallel-R outputs bit-identical: {same}")
    results["parallel_r_us_step"] = timed("parallel-R (candidate)",
                                          run_abl(parallel_r=True), nd)

    # ------------------------------------------------------------------
    # 2. synthetic dependent-chain micro-kernels: time/step = a + b*k
    # ------------------------------------------------------------------
    def make_chain(k, with_shift=False):
        """Per step: exactly k serially dependent (B, MP) vector ops."""
        def kernel(sig_ref, out_ref, X_ref):
            batch, mpk = X_ref.shape
            chunk = pl.program_id(0)

            @pl.when(chunk == 0)
            def _init():
                X_ref[:, :] = jnp.zeros((batch, mpk), jnp.float32)

            def step(c_in, x):
                for i in range(k):
                    if with_shift and i % 4 == 0:
                        x = jnp.concatenate(
                            [jnp.full((batch, 1), 0.0, x.dtype), x[:, :-1]], axis=1)
                    elif i % 2 == 0:
                        x = x + np.float32(1.0)
                    else:
                        x = jnp.maximum(x, x * np.float32(0.5))
                return x

            X_ref[:, :] = jax.lax.fori_loop(0, AP.CHUNK, step, X_ref[:, :])
            out_ref[:, :] = X_ref[:, :1] + sig_ref[:, :1]

        @jax.jit
        def fwd(signals):
            Bc = signals.shape[0]
            return pl.pallas_call(
                kernel,
                grid=(nd // AP.CHUNK,),
                in_specs=[pl.BlockSpec((Bc, AP.CHUNK), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((Bc, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Bc, 1), jnp.float32),
                scratch_shapes=[pltpu.VMEM((Bc, mp), jnp.float32)],
            )(jnp.pad(signals, ((0, 0), (0, mp))))
        return fwd

    ks = (0, 2, 4, 8, 16, 24)
    chain = {}
    for k in ks:
        fwd = make_chain(k)
        def call(f=fwd):
            return jnp.sum(f(sig))
        chain[k] = timed(f"chain k={k:2d}", call, nd)
    results["chain_us_step"] = {str(k): v for k, v in chain.items()}
    # least-squares fit a + b*k
    A = np.vstack([np.ones(len(ks)), np.array(ks, float)]).T
    (a_fit, b_fit), *_ = np.linalg.lstsq(A, np.array([chain[k] for k in ks]), rcond=None)
    print(f"\nfit: time/step = {a_fit:.3f} us (loop overhead) + {b_fit:.4f} us * k")
    results["fit_overhead_us"] = float(a_fit)
    results["fit_per_op_us"] = float(b_fit)

    # shift-heavy chain (every 4th op a lane shift), k=12 ~ real chain mix
    fwd = make_chain(12, with_shift=True)
    def call12(f=fwd):
        return jnp.sum(f(sig))
    results["chain12_shift_us_step"] = timed("chain k=12 (with shifts)", call12, nd)

    # the real kernel's carry-to-carry serial chain, by inspection of
    # diag_body: R shift -> diff -> pow -> sc -> newM(add) -> Q(max) ->
    # cvec(add) -> newC(shift+max) -> newS(max) + the pointer
    # compare/or/rotate ops that extend the same carries: ~12 deps.
    K_REAL = 12
    sol = a_fit + b_fit * K_REAL
    real = results["prod_full_us_step"]
    results["serial_chain_ops_estimate"] = K_REAL
    results["latency_sol_us_step"] = float(sol)
    results["sol_ratio"] = float(real / sol)
    print(f"latency SOL (a + {K_REAL}b) = {sol:.3f} us/step; "
          f"production = {real:.3f} us/step -> {real/sol:.2f}x SOL")

    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "WAVE_FLOOR.json")
    with open(out_path, "w") as fp:
        json.dump(results, fp, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
