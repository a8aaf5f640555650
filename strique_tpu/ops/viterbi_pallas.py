"""Pallas TPU kernels for dense max-plus Viterbi decoding.

Replaces pomegranate's Cython Viterbi (reference scripts/STRique.py:434,
:493) over compile-time silent-eliminated HMMs (reference bake semantics,
scripts/STRique.py:431).

Forward: per time step the candidate matrix ``score[u] + trans[u, v]`` is
max-reduced on the VPU; even steps consume the state as a row against
``transT`` and odd steps as a column against ``trans``, so the state never
needs a per-step relayout (the MXU only transposes state snapshots, which
nothing in the recurrence waits on).  Scores are rescaled by the per-step
max so float32 keeps full precision on argmax margins.

Instead of materializing backpointers (whose first-max tie-break costs
~190 vreg-ops/step of compare/select/min-reduce), the forward streams the
*rescaled score rows* to HBM — the same bytes, no extra work — and the
backward pass recomputes the winning transition lazily, only for the one
state per step that the optimal path actually visits:

    bp[t] = min{ u : score[t-1, u] + trans[u, path[t]] == max_u(...) }

The sums are the identical f32 adds the forward maxed over, and max/min
reductions are order-independent, so the decoded path is bit-identical to
an explicit-backpointer forward — verified against the XLA-scan decoder
in tests/test_pallas.py.

Backward runs all reads of a batch lane-parallel in ONE kernel: the
per-read path states live in a (B, 1) column, each step selects the
``trans[:, state]`` rows for the whole batch with a one-hot MXU matmul,
and path rows accumulate in registers.  This replaces B sequential
per-read walks with one walk of the same length.

States are padded to a multiple of 128 lanes; pad states get -inf
start/transition mass and never win.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
CHUNK_T = 512
BWD_CT = 64  # backward time-chunk (must divide CHUNK_T)
FACTORED_UNROLL = 1  # factored-forward step unroll; >1 gives Mosaic a
                     # scheduling window but was measured to blow up its
                     # compile time (>9 min for one shape at 4x vs ~90 s
                     # at 1x) for a ~3% end-to-end ceiling -- not worth it
LANE = 128
_LOG2PI = float(np.log(2.0 * np.pi))


def _round_up(x, m):
    return (x + m - 1) // m * m


def _fwd_kernel_multi(R: int, obs_ref, tact_ref, trans_ref, transT_ref,
                      start_col_ref, mu_ref, sig_ref, uni_ref, luni_ref,
                      muc_ref, sigc_ref, unic_ref, lunic_ref,
                      sc_ref, score_out_ref, acc_out_ref, rows_ref, fin_ref,
                      acc_ref):
    """R-read, orientation-alternating forward kernel.

    Streams the rescaled score row of every step to ``sc_ref`` (the
    backward pass recomputes backpointers from them on demand).  Score
    rows accumulate in registers and store once per 8 steps as a (8, SP)
    sublane-aligned tile, avoiding per-step read-modify-write of narrow
    rows.  The final state per read is snapshotted at t == t_actual-1.
    """
    sp = trans_ref.shape[0]
    tc = pl.program_id(1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    eye = (sub == lane2).astype(jnp.float32)
    oct8 = jax.lax.broadcasted_iota(jnp.int32, (8, sp), 0)
    rsel = jax.lax.broadcasted_iota(jnp.int32, (R, sp), 0)
    n_oct = sc_ref.shape[1]  # CHUNK_T // 8 octets per chunk
    chunk = n_oct * 8

    # loop-invariant emission constants: the transcendental is computed
    # once per grid step, not per time step (bit-identical — same Mosaic
    # log on the same f32 sigma)
    lsig_row = -0.5 * _LOG2PI - jnp.log(sig_ref[:, :])
    lsig_col = -0.5 * _LOG2PI - jnp.log(sigc_ref[:, :])

    def emit_row(x):
        z = (x - mu_ref[:, :]) / sig_ref[:, :]
        norm = lsig_row - 0.5 * z * z
        return jnp.where(uni_ref[:, :] != 0, luni_ref[:, :], norm)

    def emit_col(x):
        z = (x - muc_ref[:, :]) / sigc_ref[:, :]
        norm = lsig_col - 0.5 * z * z
        return jnp.where(unic_ref[:, :] != 0, lunic_ref[:, :], norm)

    def t_row(x):  # (SP, 1) -> (1, SP) off the critical path (MXU)
        return jax.lax.dot_general(x, eye, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @pl.when(tc == 0)
    def _init():
        for r in range(R):
            acc_ref[0, r] = 0.0

    mt = tact_ref[0, 0]
    for r in range(1, R):
        mt = jnp.maximum(mt, tact_ref[0, r])

    def oct_body(oct_i, carry):
        rows, fin = carry
        sc8 = [jnp.zeros((8, sp), jnp.float32) for _ in range(R)]
        cols = [None] * R
        for s8 in range(8):
            i = oct_i * 8 + s8
            t = tc * chunk + i
            for r in range(R):
                tact = tact_ref[0, r]
                x = obs_ref[r, i]
                if s8 % 2 == 0:
                    # even t: row state in, column state out (transT)
                    row_r = rows[r:r + 1, :]
                    cand = row_r + transT_ref[:, :]  # [v, u]
                    new_col = jnp.max(cand, axis=1, keepdims=True)
                    ec = emit_col(x)
                    val = new_col + ec
                    val = jnp.where(t == 0, start_col_ref[:, :] + ec, val)
                    m = jnp.max(val)
                    st = val - m
                    cols[r] = st
                    snap_row = t_row(st)
                else:
                    # odd t: column state in, row state out (trans)
                    cand = cols[r] + trans_ref[:, :]  # [u, v]
                    new_row = jnp.max(cand, axis=0, keepdims=True)
                    val = new_row + emit_row(x)
                    m = jnp.max(val)
                    st = val - m
                    rows = jnp.where(rsel == r, st, rows)
                    snap_row = st
                acc_ref[0, r] = acc_ref[0, r] + jnp.where(t < tact, m, 0.0)
                fin = jnp.where((rsel == r) & (t == tact - 1), snap_row, fin)
                sc8[r] = jnp.where(oct8 == s8, snap_row, sc8[r])
        for r in range(R):
            sc_ref[r, oct_i, :, :] = sc8[r]
        return rows, fin

    @pl.when(tc * chunk < mt)
    def _work():
        rows, fin = jax.lax.fori_loop(
            0, n_oct, oct_body, (rows_ref[:, :], fin_ref[:, :]))
        rows_ref[:, :] = rows
        fin_ref[:, :] = fin

    @pl.when(tc == pl.num_programs(1) - 1)
    def _fin():
        score_out_ref[:, :] = fin_ref[:, :]
        for r in range(R):
            acc_out_ref[0, r] = acc_ref[0, r]


@partial(jax.jit, static_argnames=("R",))
def viterbi_forward_pallas_multi(obs, t_actual, trans, transT, start_col,
                                 mu, sigma, uni, luni,
                                 muc, sigc, unic, lunic, R: int):
    """Forward pass for R reads in one kernel instance.

    obs: (R, T) f32, T multiple of CHUNK_T.
    Returns (score rows (R, T, SP) f32, final rows (R, SP), acc (1, R)).
    sc[t] is the rescaled Viterbi score row after observation t.
    """
    Rr, T = obs.shape
    assert Rr == R and T % CHUNK_T == 0
    sp = trans.shape[0]
    interpret = jax.default_backend() != "tpu"
    grid = (1, T // CHUNK_T)
    const = lambda b, i: (0, 0)
    vspec = pl.BlockSpec((1, sp), const, memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((sp, 1), const, memory_space=pltpu.VMEM)
    sc, final_rows, acc = pl.pallas_call(
        partial(_fwd_kernel_multi, R),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, CHUNK_T), lambda b, i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((sp, sp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((sp, sp), const, memory_space=pltpu.VMEM),
            cspec, vspec, vspec, vspec, vspec, cspec, cspec, cspec, cspec,
        ],
        out_specs=[
            pl.BlockSpec((R, CHUNK_T // 8, 8, sp), lambda b, i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, sp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), const, memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, T // 8, 8, sp), jnp.float32),
            jax.ShapeDtypeStruct((R, sp), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, sp), jnp.float32),
            pltpu.VMEM((R, sp), jnp.float32),
            pltpu.SMEM((1, R), jnp.float32),
        ],
        interpret=interpret,
    )(obs, t_actual.reshape(1, R).astype(jnp.int32),
      trans, transT, start_col, mu, sigma, uni, luni, muc, sigc, unic, lunic)
    return sc.reshape(R, T, sp), final_rows, acc


def _bwd_batch_kernel(sc_ref, bnd_ref, transT_ref, last_ref, tact_ref,
                      mt_ref, path_ref, st_ref):
    """Lane-parallel backward walk over all reads at once.

    sc_ref: (CT, B, SP) score rows of this (reverse-order) time chunk.
    bnd_ref: (1, B, SP) score row of the last step of the previous chunk
    (i.e. scores[t-1] for the chunk's first step).
    The per-read walk states live in st_ref (B, 1); each step selects the
    ``trans[:, state]`` rows for the whole batch via a one-hot matmul on
    ``transT`` and replays the forward's max and first-max tie-break on
    the identical f32 sums.
    """
    ct, Bb, sp = sc_ref.shape
    tc = pl.program_id(1)
    nc = pl.num_programs(1)
    start_t = (nc - 1 - tc) * ct  # blocks walk in reverse order
    laneB = jax.lax.broadcasted_iota(jnp.int32, (Bb, sp), 1)
    subP = jax.lax.broadcasted_iota(jnp.int32, (ct, Bb), 0)
    eyeB = (jax.lax.broadcasted_iota(jnp.int32, (Bb, Bb), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (Bb, Bb), 1)).astype(jnp.float32)

    @pl.when(tc == 0)
    def _init():
        st_ref[:, :] = last_ref[:, :]

    def t_rowB(x):  # (B, 1) f32 -> (1, B)
        return jax.lax.dot_general(x, eyeB, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @pl.when(start_t < mt_ref[0, 0])
    def _walk():
        def body(k, carry):
            st, tile = carry  # (B, 1) i32, (CT, B) f32
            i = ct - 1 - k
            t = start_t + i
            # path[t] = current state, before stepping the walk
            row = t_rowB(st.astype(jnp.float32))
            tile = jnp.where(subP == i, row, tile)
            prev = jnp.where(i == 0, bnd_ref[0], sc_ref[jnp.maximum(i - 1, 0)])
            onehot = (laneB == st).astype(jnp.float32)
            trow = jax.lax.dot_general(
                onehot, transT_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # row r = trans[:, st_r]
            cand = prev + trow
            mx = jnp.max(cand, axis=1, keepdims=True)
            hits = jnp.where(cand >= mx, laneB, sp)
            bp = jnp.min(hits, axis=1, keepdims=True)
            st = jnp.where((t >= 1) & (t < tact_ref[:, :]), bp, st)
            return st, tile

        st, tile = jax.lax.fori_loop(
            0, ct, body, (st_ref[:, :], jnp.zeros((ct, Bb), jnp.float32)))
        path_ref[:, :] = tile
        st_ref[:, :] = st

    @pl.when(start_t >= mt_ref[0, 0])
    def _dead():
        # the forward skipped these chunks entirely (t >= every read's
        # t_actual): the walk through them is the identity
        path_ref[:, :] = jnp.broadcast_to(
            t_rowB(st_ref[:, :].astype(jnp.float32)), path_ref.shape)


@partial(jax.jit, static_argnames=("time_major",))
def viterbi_backward_batch(scores, last, t_actual, max_t, transT,
                           time_major: bool = False):
    """Decode paths for a whole batch from forward score rows.

    scores: (B, T, SP) f32 rescaled score rows — or (T, B, SP) when
    ``time_major`` (the factored forward's native layout, saving a full
    HBM transpose pass); last: (B,) i32 final states; t_actual: (B,) i32
    true lengths; max_t: scalar — chunks at or past it were skipped by
    the forward.  Returns (B, T) i32 paths (path[t] = last for
    t >= t_actual, matching the frozen walk).
    """
    if time_major:
        T, B, sp = scores.shape
    else:
        B, T, sp = scores.shape
    assert T % BWD_CT == 0
    bpad = (-B) % 8
    if bpad:
        bspec = ((0, 0), (0, bpad), (0, 0)) if time_major else ((0, bpad), (0, 0), (0, 0))
        scores = jnp.pad(scores, bspec)
        last = jnp.pad(last, (0, bpad))
        t_actual = jnp.pad(t_actual, (0, bpad), constant_values=1)
    Bp = B + bpad
    interpret = jax.default_backend() != "tpu"
    nc = T // BWD_CT
    scT = scores if time_major else jnp.transpose(scores, (1, 0, 2))  # (T, B, SP)
    # bnd[c] = scores[c*CT - 1]: the cross-chunk boundary row
    bnd = jnp.concatenate(
        [jnp.zeros((1, Bp, sp), jnp.float32), scT[BWD_CT - 1::BWD_CT][: nc - 1]])
    path = pl.pallas_call(
        _bwd_batch_kernel,
        grid=(1, nc),
        in_specs=[
            pl.BlockSpec((BWD_CT, Bp, sp),
                         partial(lambda nch, b, i: (nch - 1 - i, 0, 0), nc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, sp),
                         partial(lambda nch, b, i: (nch - 1 - i, 0, 0), nc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sp, sp), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 1), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 1), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BWD_CT, Bp),
                               partial(lambda nch, b, i: (nch - 1 - i, 0), nc),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, Bp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bp, 1), jnp.int32)],
        interpret=interpret,
    )(scT, bnd, transT, last.reshape(Bp, 1).astype(jnp.int32),
      t_actual.reshape(Bp, 1).astype(jnp.int32),
      jnp.reshape(jnp.asarray(max_t, jnp.int32), (1, 1)))
    return jnp.transpose(path).astype(jnp.int32)[:B]


# ---------------------------------------------------------------------------
# structure-factored forward (hmm/factor.py): the whole batch in ONE kernel
# ---------------------------------------------------------------------------
#
# The dense forward pays O(SP^2) VPU work per read-step against the full
# transition matrix.  When the HMM factorizes (7 diagonals + 2 delete-chain
# prefix-max flows for the flanked-repeat model), one step costs a dozen
# lane-rolls plus one log-doubling cummax — all row ops — so the whole batch
# rides the sublane axis of a single (B, SP) tile: ~16 vector ops per step
# amortized over B reads instead of ~300 per read.  Score rows stream to HBM
# in (T, B, SP) layout, which is exactly what the lane-parallel backward
# consumes (the dense path needs a transpose pass for this).

def _fwd_factored_kernel(spec, n_w, obs_ref, tact_ref, mt_ref, start_ref,
                         mu_ref, sig_ref, uni_ref, luni_ref, *rest):
    diag_offs, chain_spec = spec
    w_refs = rest[:n_w]
    sc_ref, fin_out_ref, acc_out_ref = rest[n_w : n_w + 3]
    st_ref, fin_ref, acc_ref = rest[n_w + 3 :]

    B, sp = st_ref.shape
    ct = sc_ref.shape[0]
    tc = pl.program_id(0)
    # obs arrives in 128-lane blocks (the Mosaic lane-tile minimum); when
    # ct < 128 consecutive grid steps revisit the same block and select
    # their column window by masked lane reduce
    obs_lanes = obs_ref.shape[1]
    lane_off = (tc * ct) % obs_lanes
    sel_iota = jax.lax.broadcasted_iota(jnp.int32, (B, obs_lanes), 1)
    negf = jnp.float32(NEG)
    lsig = -0.5 * _LOG2PI - jnp.log(sig_ref[:, :])  # (1, sp), once per chunk

    @pl.when(tc == 0)
    def _init():
        st_ref[:, :] = jnp.zeros((B, sp), jnp.float32)
        fin_ref[:, :] = jnp.zeros((B, sp), jnp.float32)
        acc_ref[:, :] = jnp.zeros((B, 1), jnp.float32)

    def roll(x, o):
        # circular lane roll: wrapped lanes carry sentinel sums (the weight
        # vectors are NEG outside their real source lanes) and never win
        oo = o % sp
        if oo == 0:
            return x
        return jnp.concatenate([x[:, sp - oo :], x[:, : sp - oo]], axis=1)

    def cummax(x):
        k = 1
        while k < sp:  # prefix max along lanes (log-step doubling)
            x = jnp.maximum(x, jnp.concatenate(
                [jnp.full((B, k), NEG, jnp.float32), x[:, :-k]], axis=1))
            k *= 2
        return x

    obs_tile = obs_ref[:, :]
    tact = tact_ref[:, :]  # (B, 1) i32

    def step(i, carry):
        st, fin, acc = carry
        t = tc * ct + i
        sel = sel_iota == lane_off + i
        x = jnp.max(jnp.where(sel, obs_tile, negf), axis=1, keepdims=True)
        z = (x - mu_ref[:, :]) / sig_ref[:, :]
        emit = jnp.where(uni_ref[:, :] != 0, luni_ref[:, :], lsig - 0.5 * z * z)
        it = iter(w_refs)
        out = jnp.full((B, sp), NEG, jnp.float32)
        for o in diag_offs:
            out = jnp.maximum(out, roll(st + next(it)[:, :], o))
        for entry_offs, exit_offs in chain_spec:
            inj = jnp.full((B, sp), NEG, jnp.float32)
            for o in entry_offs:
                inj = jnp.maximum(inj, roll(st + next(it)[:, :], o))
            ramp = next(it)[:, :]
            h = cummax(inj - ramp) + ramp
            for o in exit_offs:
                out = jnp.maximum(out, roll(h + next(it)[:, :], o))
        val = out + emit
        val = jnp.where(t == 0, start_ref[:, :] + emit, val)
        m = jnp.max(val, axis=1, keepdims=True)
        stn = val - m
        live = t < tact
        st = jnp.where(live, stn, st)
        acc = acc + jnp.where(live, m, 0.0)
        fin = jnp.where(t == tact - 1, stn, fin)
        sc_ref[i, :, :] = st
        return st, fin, acc

    def step_u(q, carry):
        # unrolled window: lets Mosaic schedule across serially-dependent
        # steps (same trick as the align kernel's 8x column unroll)
        for u in range(FACTORED_UNROLL):
            carry = step(q * FACTORED_UNROLL + u, carry)
        return carry

    @pl.when(tc * ct < mt_ref[0, 0])
    def _work():
        st, fin, acc = jax.lax.fori_loop(
            0, ct // FACTORED_UNROLL, step_u,
            (st_ref[:, :], fin_ref[:, :], acc_ref[:, :]))
        st_ref[:, :] = st
        fin_ref[:, :] = fin
        acc_ref[:, :] = acc

    @pl.when(tc == pl.num_programs(0) - 1)
    def _fin():
        fin_out_ref[:, :] = fin_ref[:, :]
        acc_out_ref[:, :] = acc_ref[:, :]


def _factored_ct(B: int, sp: int) -> int:
    """Largest time-chunk whose (CT, B, SP) f32 block stays under ~4 MB."""
    for ct in (64, 32, 16, 8):
        if ct * B * sp * 4 <= (4 << 20):
            return ct
    return 8


@partial(jax.jit, static_argnames=("spec",))
def viterbi_forward_pallas_factored(obs, t_actual, start_row, mu, sigma, uni,
                                    luni, spec, *weights):
    """Factored forward for the whole (B, T) batch in one kernel.

    Returns (sc (T, B, SP) f32 score rows — already time-major for the
    backward walk — final rows (B, SP), acc (B, 1)).
    B must be a multiple of 8; T a multiple of the adaptive time chunk.
    """
    B, T = obs.shape
    sp = start_row.shape[1]
    ct = _factored_ct(B, sp)
    assert B % 8 == 0 and T % ct == 0 and T % LANE == 0
    n_w = len(weights)
    interpret = jax.default_backend() != "tpu"
    const = lambda i: (0, 0)
    vrow = pl.BlockSpec((1, sp), const, memory_space=pltpu.VMEM)
    mt = jnp.max(t_actual).reshape(1, 1).astype(jnp.int32)
    sc, fin, acc = pl.pallas_call(
        partial(_fwd_factored_kernel, spec, n_w),
        grid=(T // ct,),
        in_specs=[
            pl.BlockSpec((B, LANE), lambda i, _ct=ct: (0, (i * _ct) // LANE),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM),
            vrow, vrow, vrow, vrow, vrow,
        ] + [vrow] * n_w,
        out_specs=[
            pl.BlockSpec((ct, B, sp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, sp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, sp), jnp.float32),
            jax.ShapeDtypeStruct((B, sp), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, sp), jnp.float32),
            pltpu.VMEM((B, sp), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
        ],
        interpret=interpret,
    )(obs, t_actual.reshape(B, 1).astype(jnp.int32), mt, start_row,
      mu, sigma, uni, luni, *weights)
    return sc, fin, acc


class PaddedHMM:
    """Lane-padded device tensors for a CompiledHMM."""

    def __init__(self, chm):
        S = chm.n_states
        sp = _round_up(max(S, LANE), LANE)
        self.sp = sp
        self.n_states = S
        trans = np.full((sp, sp), NEG, np.float32)
        trans[:S, :S] = np.maximum(chm.log_trans, NEG).astype(np.float32)
        start = np.full((1, sp), NEG, np.float32)
        start[0, :S] = np.maximum(chm.log_start, NEG).astype(np.float32)
        end = np.full((1, sp), NEG, np.float32)
        end[0, :S] = np.maximum(chm.log_end, NEG).astype(np.float32)
        mu = np.zeros((1, sp), np.float32)
        mu[0, :S] = chm.mu
        sigma = np.ones((1, sp), np.float32)
        sigma[0, :S] = chm.sigma
        uni = np.zeros((1, sp), np.int32)
        uni[0, :S] = chm.is_uniform
        luni = np.zeros((1, sp), np.float32)
        luni[0, :S] = chm.log_uni
        self.trans = jnp.asarray(trans)
        self.transT = jnp.asarray(np.ascontiguousarray(trans.T))
        self.start = jnp.asarray(start)
        self.start_col = jnp.asarray(np.ascontiguousarray(start.T))
        self.end = jnp.asarray(end)
        self.mu = jnp.asarray(mu)
        self.sigma = jnp.asarray(sigma)
        self.uni = jnp.asarray(uni)
        self.luni = jnp.asarray(luni)
        self.mu_col = jnp.asarray(np.ascontiguousarray(mu.T))
        self.sigma_col = jnp.asarray(np.ascontiguousarray(sigma.T))
        self.uni_col = jnp.asarray(np.ascontiguousarray(uni.T))
        self.luni_col = jnp.asarray(np.ascontiguousarray(luni.T))
        # structure-factored staging (hmm/factor.py): static lane-offset spec
        # plus (1, SP) weight rows; None -> dense kernel fallback
        self.fspec = None
        self.fweights = None
        import os

        if (getattr(chm, "factored", None) is not None
                and os.environ.get("STRIQUE_DENSE_VITERBI") != "1"):
            from .viterbi import stage_factored

            spec, weights = stage_factored(chm.factored, sp)
            self.fspec = spec
            self.fweights = tuple(jnp.asarray(w.reshape(1, sp)) for w in weights)


def viterbi_pallas(obs, t_actual, ph: PaddedHMM):
    """Full decode for one read; matches ops.viterbi.viterbi_scan outputs."""
    logp, path = viterbi_pallas_batch(
        obs[None, :], jnp.asarray(t_actual).reshape(1), ph)
    return logp[0], path[0]


READS_PER_CELL = 1  # forward-kernel interleave width (>1 exceeds scoped
                    # VMEM: the 8-substep unroll keeps a (SP,SP) candidate
                    # temporary live per read; interleave measured neutral)


@partial(jax.jit, static_argnames=("R",))
def _viterbi_batch_jit(obs, t_actual, trans, transT, start_col, mu, sigma,
                       uni, luni, muc, sigc, unic, lunic, end, R: int):
    B, T = obs.shape
    sp = trans.shape[0]

    def group(o, t):
        return viterbi_forward_pallas_multi(
            o, t, trans, transT, start_col, mu, sigma, uni, luni,
            muc, sigc, unic, lunic, R=R)

    sc, final_rows, acc = jax.vmap(group)(obs.reshape(B // R, R, T),
                                          t_actual.reshape(B // R, R))
    final = final_rows.reshape(B, sp) + end  # broadcast (1, SP)
    last = jnp.argmax(final, axis=1).astype(jnp.int32)
    logp = jnp.take_along_axis(final, last[:, None], axis=1)[:, 0] + acc.reshape(B)
    mt = jnp.max(t_actual)  # forward skipped chunks past the batch max length
    path = viterbi_backward_batch(sc.reshape(B, T, sp), last, t_actual, mt, transT)
    return logp, path


@partial(jax.jit, static_argnames=("spec",))
def _viterbi_batch_factored_jit(obs, t_actual, start_row, mu, sigma, uni, luni,
                                end, transT, spec, *weights):
    B = obs.shape[0]
    sc, fin, acc = viterbi_forward_pallas_factored(
        obs, t_actual, start_row, mu, sigma, uni, luni, spec, *weights)
    final = fin + end  # broadcast (1, SP)
    last = jnp.argmax(final, axis=1).astype(jnp.int32)
    logp = jnp.take_along_axis(final, last[:, None], axis=1)[:, 0] + acc[:, 0]
    mt = jnp.max(t_actual)
    path = viterbi_backward_batch(sc, last, t_actual, mt, transT, time_major=True)
    return logp, path


def viterbi_pallas_batch(obs_batch, t_actual_batch, ph: PaddedHMM):
    """Decode a whole (B, T) batch in one dispatch.

    When the HMM factorizes (ph.fspec), the forward runs the whole batch
    sublane-packed in one structure-factored kernel; otherwise the dense
    forward runs READS_PER_CELL reads per kernel instance (vmapped over
    the batch).  Either way the backward walks every read of the batch
    lane-parallel in a single kernel.
    """
    obs_batch = obs_batch.astype(jnp.float32)
    t_actual_batch = t_actual_batch.astype(jnp.int32)
    B = obs_batch.shape[0]
    if ph.fspec is not None:
        # the lane-parallel backward's scratch scales with the batch
        # width: past 64 reads it exceeds the 16 MB scoped-VMEM limit
        # (measured: 128 needs 16.06 MB), so wider batches run as
        # 64-read groups through the same kernels
        MAX_W = 64
        if B > MAX_W:
            outs = [viterbi_pallas_batch(obs_batch[g : g + MAX_W],
                                         t_actual_batch[g : g + MAX_W], ph)
                    for g in range(0, B, MAX_W)]
            return (jnp.concatenate([o[0] for o in outs]),
                    jnp.concatenate([o[1] for o in outs]))
        bpad = (-B) % 8
        if bpad:
            obs_batch = jnp.pad(obs_batch, ((0, bpad), (0, 0)))
            t_actual_batch = jnp.pad(t_actual_batch, (0, bpad), constant_values=1)
        logp, path = _viterbi_batch_factored_jit(
            obs_batch, t_actual_batch, ph.start, ph.mu, ph.sigma, ph.uni,
            ph.luni, ph.end, ph.transT, ph.fspec, *ph.fweights)
        return logp[:B], path[:B]
    R = min(READS_PER_CELL, max(B, 1))
    bpad = (-B) % R
    if bpad:
        obs_batch = jnp.pad(obs_batch, ((0, bpad), (0, 0)))
        t_actual_batch = jnp.pad(t_actual_batch, (0, bpad), constant_values=1)
    logp, path = _viterbi_batch_jit(obs_batch, t_actual_batch,
                                    ph.trans, ph.transT, ph.start_col,
                                    ph.mu, ph.sigma, ph.uni, ph.luni,
                                    ph.mu_col, ph.sigma_col, ph.uni_col,
                                    ph.luni_col, ph.end, R)
    return logp[:B], path[:B]
