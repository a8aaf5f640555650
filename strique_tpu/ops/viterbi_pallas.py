"""Pallas TPU kernels for dense max-plus Viterbi decoding.

Forward: per time step the candidate matrix ``score[u] + trans[u, v]``
is reduced over the source-state sublane axis on the VPU; the resulting
row vector is flipped back into column orientation with a single
identity matmul on the MXU (cheaper than a vector relayout).  Scores are
rescaled by the per-step max so float32 keeps full precision on argmax
margins; backpointers stream to HBM through the blocked output.

Backward: a second kernel walks the backpointer array in reverse chunk
order entirely in VMEM, extracting ``bp[t, state]`` with a one-hot lane
select per step.

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
LANE = 128
_LOG2PI = float(np.log(2.0 * np.pi))


def _round_up(x, m):
    return (x + m - 1) // m * m


def _fwd_kernel(obs_ref, tact_ref, trans_ref, start_ref, mu_ref, sig_ref,
                uni_ref, luni_ref, bp_ref, score_out_ref, acc_out_ref,
                col_ref, acc_ref):
    sp = trans_ref.shape[0]
    tc = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, sp), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    eye = (sub == lane2).astype(jnp.float32)
    t_actual = tact_ref[0, 0]

    def emit_row(x):
        z = (x - mu_ref[:, :]) / sig_ref[:, :]
        norm = -0.5 * _LOG2PI - jnp.log(sig_ref[:, :]) - 0.5 * z * z
        return jnp.where(uni_ref[:, :] != 0, luni_ref[:, :], norm)

    @pl.when(tc == 0)
    def _init():
        row0 = start_ref[:, :] + emit_row(obs_ref[0, 0])
        m0 = jnp.max(row0)
        col_ref[:, :] = jax.lax.dot_general(
            eye, row0 - m0, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[0, 0] = m0

    def body(i, _):
        # global time index t: bp[t] describes the transition into time t
        # (row 0 is an identity placeholder — time 0 has no transition)
        t = tc * bp_ref.shape[0] + i
        score_col = col_ref[:, :]  # (SP, 1)
        cand = score_col + trans_ref[:, :]  # (SP_u, SP_v)
        new_row = jnp.max(cand, axis=0, keepdims=True)  # (1, SP)
        # first-max tie-break: min source index among maxima
        hits = jnp.where(cand >= new_row, sub, sp)
        bp_row = jnp.min(hits, axis=0, keepdims=True)  # (1, SP) int32
        x = obs_ref[0, i]  # SMEM scalar read, chunk-local index
        new_row = new_row + emit_row(x)
        m = jnp.max(new_row)
        live = (t > 0) & (t < t_actual)
        new_col = jax.lax.dot_general(
            eye, new_row - m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        col_ref[:, :] = jnp.where(live, new_col, score_col)
        acc_ref[0, 0] = acc_ref[0, 0] + jnp.where(live, m, 0.0)
        bp_ref[i, :] = jnp.where(live, bp_row, lane)[0, :].astype(jnp.float32)
        return _

    jax.lax.fori_loop(0, bp_ref.shape[0], body, None)

    @pl.when(tc == pl.num_programs(1) - 1)
    def _fin():
        score_out_ref[:, :] = col_ref[:, :].reshape(1, sp)
        # scalar stores to VMEM are not allowed; write a (1,1) vector
        acc_out_ref[:, :] = jnp.full((1, 1), acc_ref[0, 0], jnp.float32)


def _fwd_kernel_multi(R: int, obs_ref, tact_ref, trans_ref, transT_ref,
                      start_col_ref, mu_ref, sig_ref, uni_ref, luni_ref,
                      muc_ref, sigc_ref, unic_ref, lunic_ref,
                      bp_ref, score_out_ref, acc_out_ref, rows_ref, fin_ref,
                      acc_ref):
    """R-read, orientation-alternating forward kernel.

    Two structural wins over the naive per-step formulation:

      * even time steps consume the state as a row and reduce the
        candidate matrix over lanes (using transT); odd steps consume a
        column and reduce over sublanes (using trans).  The state never
        needs the per-step identity-matmul relayout, so the MXU is off
        the serial critical path entirely (it only transposes
        backpointer rows and state snapshots, which nothing downstream
        in the recurrence waits on).
      * backpointer rows accumulate in registers and store once per 8
        steps as a (8, SP) sublane-aligned tile, avoiding per-step
        read-modify-write of narrow rows.

    Per-read values and tie-breaks are bit-identical to _fwd_kernel: the
    same candidate sums are maxed (reduction axis doesn't change max) and
    the same >= comparisons pick the minimum source index.  The final
    state per read is snapshotted at t == t_actual-1 in row form instead
    of carrying a frozen column.
    """
    sp = trans_ref.shape[0]
    tc = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, sp), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    eye = (sub == lane2).astype(jnp.float32)
    oct8 = jax.lax.broadcasted_iota(jnp.int32, (8, sp), 0)
    rsel = jax.lax.broadcasted_iota(jnp.int32, (R, sp), 0)
    n_oct = bp_ref.shape[1]  # CHUNK_T // 8 octets per chunk
    chunk = n_oct * 8

    def emit_row(x):
        z = (x - mu_ref[:, :]) / sig_ref[:, :]
        norm = -0.5 * _LOG2PI - jnp.log(sig_ref[:, :]) - 0.5 * z * z
        return jnp.where(uni_ref[:, :] != 0, luni_ref[:, :], norm)

    def emit_col(x):
        z = (x - muc_ref[:, :]) / sigc_ref[:, :]
        norm = -0.5 * _LOG2PI - jnp.log(sigc_ref[:, :]) - 0.5 * z * z
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
        bp8 = [jnp.zeros((8, sp), jnp.float32) for _ in range(R)]
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
                    hits = jnp.where(cand >= new_col, lane2, sp)
                    bp_c = jnp.min(hits, axis=1, keepdims=True)  # (SP, 1)
                    val = new_col + emit_col(x)
                    val = jnp.where(t == 0, start_col_ref[:, :] + emit_col(x), val)
                    m = jnp.max(val)
                    st = val - m
                    cols[r] = st
                    bp_row = t_row(bp_c.astype(jnp.float32))
                    snap_row = t_row(st)
                else:
                    # odd t: column state in, row state out (trans)
                    cand = cols[r] + trans_ref[:, :]  # [u, v]
                    new_row = jnp.max(cand, axis=0, keepdims=True)
                    hits = jnp.where(cand >= new_row, sub, sp)
                    bp_row = jnp.min(hits, axis=0, keepdims=True).astype(jnp.float32)
                    val = new_row + emit_row(x)
                    m = jnp.max(val)
                    st = val - m
                    rows = jnp.where(rsel == r, st, rows)
                    snap_row = st
                live = (t > 0) & (t < tact)
                acc_ref[0, r] = acc_ref[0, r] + jnp.where(t < tact, m, 0.0)
                fin = jnp.where((rsel == r) & (t == tact - 1), snap_row, fin)
                bp_fin = jnp.where(live, bp_row, lane.astype(jnp.float32))
                bp8[r] = jnp.where(oct8 == s8, bp_fin, bp8[r])
        for r in range(R):
            bp_ref[r, oct_i, :, :] = bp8[r]
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
    Returns (bp (R, T, SP) f32-coded, final rows (R, SP), acc (1, R)).
    """
    Rr, T = obs.shape
    assert Rr == R and T % CHUNK_T == 0
    sp = trans.shape[0]
    interpret = jax.default_backend() != "tpu"
    grid = (1, T // CHUNK_T)
    const = lambda b, i: (0, 0)
    vspec = pl.BlockSpec((1, sp), const, memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((sp, 1), const, memory_space=pltpu.VMEM)
    bp, final_rows, acc = pl.pallas_call(
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
    return bp.reshape(R, T, sp), final_rows, acc


def _bwd_kernel(bp_ref, last_ref, mt_ref, path_ref, state_ref):
    sp = bp_ref.shape[1]
    tc = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, sp), 1)

    @pl.when(tc == 0)
    def _init():
        state_ref[0, 0] = last_ref[0, 0]

    chunk = bp_ref.shape[0]
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    n_chunks = pl.num_programs(1)
    start_t = (n_chunks - 1 - tc) * chunk  # blocks walk in reverse order

    def body(k, path_row):
        i = chunk - 1 - k
        st = state_ref[0, 0]
        # accumulate the path in a register-carried row (no scalar VMEM stores)
        path_row = jnp.where(lane_c == i, st.astype(jnp.float32), path_row)
        row = bp_ref[i, :].astype(jnp.int32)[None, :]
        prev = jnp.max(jnp.where(lane == st, row, -1))
        state_ref[0, 0] = prev
        return path_row

    @pl.when(start_t < mt_ref[0, 0])
    def _walk():
        path_row = jax.lax.fori_loop(0, chunk, body, jnp.zeros((1, chunk), jnp.float32))
        path_ref[:, :] = jnp.broadcast_to(path_row, path_ref.shape)

    @pl.when(start_t >= mt_ref[0, 0])
    def _dead():
        # bp was never written here (forward skipped the chunk); the walk
        # through it is the identity, so the path is the held state
        path_ref[:, :] = jnp.broadcast_to(
            state_ref[0, 0].astype(jnp.float32), path_ref.shape)


@partial(jax.jit, static_argnames=())
def viterbi_forward_pallas(obs, t_actual, trans, start_row, mu, sigma, uni, luni):
    """Forward pass for one read.

    obs: (T,) f32, T multiple of CHUNK_T; state tensors padded to SP lanes.
    Returns (bp (T, SP) f32-coded ints, final_row (1, SP), acc (1,1)).
    bp[t] describes the transition into observation t+1 (bp[T-1..] pads).
    """
    T = obs.shape[0]
    sp = trans.shape[0]
    interpret = jax.default_backend() != "tpu"
    grid = (1, T // CHUNK_T)
    bp, final_row, acc = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, CHUNK_T), lambda b, i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((sp, sp), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK_T, sp), lambda b, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, sp), jnp.float32),
            jax.ShapeDtypeStruct((1, sp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((sp, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(obs[None, :], jnp.reshape(t_actual.astype(jnp.int32), (1, 1)),
      trans, start_row, mu, sigma, uni, luni)
    return bp, final_row, acc


@partial(jax.jit, static_argnames=())
def viterbi_backward_pallas(bp, last, max_t=None):
    """Walk bp (T, SP) back from ``last``; returns path (T,) int32.

    ``max_t``: chunks starting at/after it were skipped by the forward
    pass (no bp written) and are reconstructed as the identity walk.
    """
    T, sp = bp.shape
    if max_t is None:
        max_t = jnp.int32(T)
    interpret = jax.default_backend() != "tpu"
    n_chunks = T // CHUNK_T
    grid = (1, n_chunks)
    path = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CHUNK_T, sp), lambda b, i: (n_chunks - 1 - i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, CHUNK_T), lambda b, i: (0, n_chunks - 1 - i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, T), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(bp, jnp.reshape(last.astype(jnp.int32), (1, 1)),
      jnp.reshape(jnp.asarray(max_t, jnp.int32), (1, 1)))
    return path[0].astype(jnp.int32)


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


def viterbi_pallas(obs, t_actual, ph: PaddedHMM):
    """Full decode for one read; matches ops.viterbi.viterbi_scan outputs."""
    T = obs.shape[0]
    assert T % CHUNK_T == 0, "pad T to the kernel chunk"
    bp, final_row, acc = viterbi_forward_pallas(
        obs.astype(jnp.float32), t_actual, ph.trans, ph.start,
        ph.mu, ph.sigma, ph.uni, ph.luni)
    final = final_row + ph.end
    last = jnp.argmax(final[0]).astype(jnp.int32)
    logp = final[0, last] + acc[0, 0]
    path = viterbi_backward_pallas(bp, last)
    return logp, path


READS_PER_CELL = 1  # forward-kernel interleave width (>1 exceeds scoped
                    # VMEM: the 8-substep unroll keeps a (SP,SP) candidate
                    # temporary live per read; interleave measured neutral)


@partial(jax.jit, static_argnames=("R",))
def _viterbi_batch_jit(obs, t_actual, trans, transT, start_col, mu, sigma,
                       uni, luni, muc, sigc, unic, lunic, end, R: int):
    B, T = obs.shape

    def group(o, t):
        bp, final_rows, acc = viterbi_forward_pallas_multi(
            o, t, trans, transT, start_col, mu, sigma, uni, luni,
            muc, sigc, unic, lunic, R=R)
        final = final_rows + end  # (R, SP)
        last = jnp.argmax(final, axis=1).astype(jnp.int32)
        logp = jnp.take_along_axis(final, last[:, None], axis=1)[:, 0] + acc[0, :]
        mt = jnp.max(t)  # forward skipped chunks past the group max length
        path = jax.vmap(lambda b, l: viterbi_backward_pallas(b, l, mt))(bp, last)
        return logp, path

    logp, path = jax.vmap(group)(obs.reshape(B // R, R, T),
                                 t_actual.reshape(B // R, R))
    return logp.reshape(B), path.reshape(B, T)


def viterbi_pallas_batch(obs_batch, t_actual_batch, ph: PaddedHMM):
    """Decode a whole (B, T) batch in one dispatch.

    Reads are processed READS_PER_CELL at a time inside the forward
    kernel (interleaved DP chains); the batch is padded up to a multiple
    of that width with one-step dummy reads.
    """
    obs_batch = obs_batch.astype(jnp.float32)
    t_actual_batch = t_actual_batch.astype(jnp.int32)
    B = obs_batch.shape[0]
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
