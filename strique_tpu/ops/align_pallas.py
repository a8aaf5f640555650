"""Pallas TPU kernels for the semi-global affine flank alignment.

Three bit-identical Mosaic implementations of the same recurrence as
:mod:`strique_tpu.ops.align` (Gotoh with the cummax-folded vertical-gap
recursion), replacing the reference's SeqAn engine
(reference src/align_raw.h:106-158, src/score_distance.h:115-122):

  * ``align_forward_wave`` — the production kernel: an anti-diagonal
    sweep (template rows pinned to lanes, batch on sublanes) where the
    column cummax rides as a running per-lane value — one shifted max
    per step instead of a serialized prefix-max chain.  Latency-bound,
    so it runs one 64-wide shape for every batch.
  * ``align_forward_pallas`` — the round-2/3 column sweep, retained as
    the in-repo compiled parity reference (STRIQUE_ALIGN_KERNEL=col).
  * ``align_forward_ckpt`` + ``align_window_from_state`` — the exact
    checkpointed two-pass for reads past the pointer-plane HBM budget
    (see the two-pass notes below).

Shared layout rules: template rows live along lanes (padded to a
multiple of 128); grids iterate sequentially carrying DP state in VMEM
scratch; traceback pointers nibble-pack into int32 planes (one
tile-aligned store per 8 columns/steps — Mosaic forbids dynamic lane
indexing and sub-tile narrow-int stores).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reference import AlignParams

NEG = -1e30  # python float: pallas kernels must not capture array constants
BATCH = 8       # interpret-mode (CPU test) batch; TPU uses BATCH_TPU


def _env_number(name: str, default: float) -> float:
    """Numeric env knob; malformed values fall back to the default
    (a bare int()/float() here would turn a typo into an ImportError
    for the whole package)."""
    try:
        return float(os.environ.get(name, default))
    except ValueError:
        return float(default)


# rounded up to the 8-row sublane tile the kernel asserts on, so an
# off-grid override degrades to the nearest valid width instead of an
# AssertionError deep inside the first batch
BATCH_TPU = max(8, -(-int(_env_number("STRIQUE_ALIGN_BATCH", 32)) // 8) * 8)
                # int8 sublane tile: enables direct pointer stores (no f32
                # scratch) and 4x the vector work per serial DP step.
                # Measured optimum: B=64 is ~1.85x the per-call time (issue-
                # bound; corrected for the probe's flat D2H sync latency)
                # and -11% end-to-end under the round-2 fused path; retested
                # under the split pipeline via STRIQUE_ALIGN_BATCH (see
                # NOTES.md); B=128 exceeds the 16 MB scoped-VMEM limit.
CHUNK = 128
LANE = 128


# HBM budget for one kernel call's traceback-pointer plane
# ((N//8, B, MP) int32 = N·B·MP/2 bytes).  Ultra-long reads otherwise OOM
# at the full 32-wide batch: a 917k-sample bucket costs 3.3 GB at width 8
# already.  Overridable via STRIQUE_PTR_BUDGET_GB; without an override the
# budget is sized from the device's own memory stats at first dispatch
# (see ptr_budget_bytes) so bigger-HBM parts use their headroom.
_DEFAULT_PTR_BUDGET = int(3.5 * (1 << 30))
_ptr_budget_cache: list = []


def ptr_budget_bytes() -> int:
    """Pointer-plane HBM budget for one kernel call.

    Priority: STRIQUE_PTR_BUDGET_GB env override (re-read per call so
    tests and callers can adjust it), else 60% of the device's free HBM
    at first dispatch (leaves headroom for the signal/bottom buffers and
    XLA temp space), else a 3.5 GB fallback when the backend exposes no
    memory stats (CPU interpret mode).
    """
    env = os.environ.get("STRIQUE_PTR_BUDGET_GB")
    if env is not None:
        try:
            return int(float(env) * (1 << 30))
        except ValueError:
            pass
    if not _ptr_budget_cache:
        budget = _DEFAULT_PTR_BUDGET
        try:
            stats = jax.devices()[0].memory_stats()
            if stats:
                free = int(stats.get("bytes_limit", 0)) - int(stats.get("bytes_in_use", 0))
                if free > 0:
                    budget = max(int(free * 0.6), 1 << 28)
        except Exception:
            pass
        _ptr_budget_cache.append(budget)
    return _ptr_budget_cache[0]


# wavefront kernel width: the wave kernel is latency-bound on its
# serial per-diagonal chain, so per-call time is nearly flat in width
# (B=8: 30.8 ms, B=32: 23.9, B=64: 33.4 on the bench shape; B=96+
# exceeds the Mosaic allocation limit) — one 64-wide shape serves every
# batch (tails pad up on device for free), halving per-read cost vs the
# column kernel's 32 and collapsing the compile set to one width.
BATCH_TPU_WAVE = max(8, -(-int(_env_number("STRIQUE_ALIGN_BATCH_WAVE", 64)) // 8) * 8)

# steps per fori-loop iteration in the wave kernel: must divide CHUNK
# exactly (the sweep runs fori_loop(0, CHUNK // unroll), which floors) —
# a non-divisor would silently skip the last CHUNK % unroll DP steps of
# every chunk.  Snap the env value to the largest power-of-two divisor
# of CHUNK that is <= the request (8/16/32/64/.../CHUNK).
def _snap_unroll(v: float) -> int:
    u = 8
    while u * 2 <= min(int(v), CHUNK) and CHUNK % (u * 2) == 0:
        u *= 2
    return u


WAVE_UNROLL = _snap_unroll(_env_number("STRIQUE_WAVE_UNROLL", 8))

def _pow12(diff):
    """The score's |d|^1.2 transcendental (reference src/score_distance.h:120).

    jnp.power is the PINNED production expression: every kernel (wave,
    column, XLA scan) and the regression-pinned golden/parity score
    stream share its exact f32 rounding.  A measured ~25% kernel win is
    available by switching to exp2(1.2*log2(d)) — NOT bit-identical, so
    taking it means re-pinning the f32 score stream across kernels,
    golden values, and PARITY.md (tools/probe_pow.py, POW_PROBE.json)."""
    return jnp.power(diff, np.float32(1.2))


def kernel_batch(b: int | None = None, n_cols: int | None = None,
                 mp: int | None = None, wave: bool = False) -> int:
    """Per-call read batch for the current backend.

    ``b``: remaining group size.  Column kernel: full groups run at
    BATCH_TPU; partial tails run at the smallest multiple of 8 that
    covers them — per-call time is ~(0.17 + 0.026·B)·t32
    (tools/profile_align_cost.py), so an 8-wide tail call costs ~0.38x
    a 32-wide one.  Wave kernel: always BATCH_TPU_WAVE (flat per-call
    latency — see above).  With ``n_cols``/``mp`` the width shrinks
    (never below the 8-sublane minimum) so the pointer plane stays
    inside the HBM budget — ultra-long reads run as more, narrower
    kernel calls instead of exhausting HBM.
    """
    import jax

    if jax.default_backend() != "tpu":
        kb = BATCH
    elif wave:
        kb = BATCH_TPU_WAVE
    elif b is None or b >= BATCH_TPU:
        kb = BATCH_TPU
    else:
        kb = max(8, -(-int(b) // 8) * 8)
    if n_cols is not None and mp is not None:
        budget = ptr_budget_bytes()
        while kb > 8 and n_cols * kb * mp // 2 > budget:
            kb -= 8
    return kb


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _align_kernel(params: AlignParams, m_actual: int,
                  sig_ref, tmpl_ref, nact_ref, ptr_ref, bottom_ref,
                  S_ref, Ih_ref):
    go_h = np.float32(params.gap_open_h)
    go_v = np.float32(params.gap_open_v)
    ge_h = np.float32(params.gap_extension_h)
    ge_v = np.float32(params.gap_extension_v)
    off = np.float32(params.dist_offset)
    dmin = np.float32(params.dist_min)
    g = np.float32(max(params.gap_extension_v, params.gap_open_v))

    batch, mp = S_ref.shape  # padded row count (m_actual + 1 <= mp)
    lane_ii = jax.lax.broadcasted_iota(jnp.int32, (batch, mp), 1)
    lane_i = lane_ii.astype(jnp.float32)
    row0 = lane_ii == 0
    sel_iota = jax.lax.broadcasted_iota(jnp.int32, (batch, CHUNK), 1)

    chunk = pl.program_id(0)

    @pl.when(chunk == 0)
    def _init():
        S0 = go_v + ge_v * (lane_i - 1.0)
        S_ref[:, :] = jnp.where(row0, 0.0, S0)
        Ih_ref[:, :] = jnp.full((batch, mp), NEG)

    tmpl = tmpl_ref[:, :]  # (1, mp) — value at lane i is template[i-1]; lane 0 pad
    nact = nact_ref[:, :]  # (BATCH, 1)
    sig_tile = sig_ref[:, :]  # (BATCH, CHUNK)

    def shift1(x, fill):
        return jnp.concatenate([jnp.full((batch, 1), fill, x.dtype), x[:, :-1]], axis=1)

    def col_body(c_in, u, carry):
        # DP state rides in fori_loop carry (registers) — VMEM scratch is
        # only touched at grid-step boundaries
        S, Ih, bt, acc = carry
        # per-read signal value: masked lane select from the aligned tile
        sel = sel_iota == c_in
        aj = jnp.max(jnp.where(sel, sig_tile, NEG), axis=1, keepdims=True)
        diff = jnp.abs(aj - tmpl)
        sc = jnp.maximum(off - jnp.power(diff, np.float32(1.2)), dmin)
        # row-0 invariants ride for free: newIh[0] is a bounded garbage
        # value (never read: Q pins row 0, its pointer lane wraps past the
        # template), newIv[0] is NEG from the shift fill, and newS[0]
        # recovers 0 from max(Q[0]=0, NEG).  When horizontal gap costs are
        # negative (every real config) even Q's row-0 select folds away:
        # filling the newM shift with -dmin makes newM[0] = -dmin + sc[0]
        # = 0 exactly (the 1e30 template pad pins sc[0] to dmin), and
        # newIh[0] stays < 0, so max(newM, newIh) already yields 0 at row 0
        ih_ext = Ih + ge_h
        ih_open = S + go_h
        newIh = jnp.maximum(ih_ext, ih_open)
        if params.gap_open_h < 0 and params.gap_extension_h <= 0:
            newM = shift1(S, -params.dist_min) + sc
            Q = jnp.maximum(newM, newIh)
        else:
            newM = shift1(S, NEG) + sc
            Q = jnp.where(row0, 0.0, jnp.maximum(newM, newIh))
        cvec = Q + go_v - (lane_i + 1.0) * g
        # two-level prefix max: log-doubling within each 128-lane block
        # (shifts never cross a vector register) + a serial block carry of
        # (batch, 1) splats — same max-sets as the flat doubling, so the
        # result is bit-identical, at fewer cross-vreg lane shifts
        nb = mp // LANE
        blocks = [cvec[:, b * LANE : (b + 1) * LANE] for b in range(nb)]
        k = 1
        while k < LANE:
            blocks = [jnp.maximum(x, jnp.concatenate(
                [jnp.full((batch, k), NEG, jnp.float32), x[:, :-k]], axis=1))
                for x in blocks]
            k *= 2
        for b in range(1, nb):
            blocks[b] = jnp.maximum(blocks[b], blocks[b - 1][:, LANE - 1 : LANE])
        cvec = jnp.concatenate(blocks, axis=1) if nb > 1 else blocks[0]
        newIv = shift1(cvec, NEG) + lane_i * g
        newS = jnp.maximum(Q, newIv)
        # pointer bits: 0-1 best matrix (M=0,H=1,V=2), 2 Ih-extend, 3 Iv-extend
        which = jnp.where(newM >= newS, 0, jnp.where(newIv >= newS, 2, 1))
        ihx = (ih_ext >= ih_open).astype(jnp.int32) << 2
        # compare in place, then lane-shift the bit (one shift instead of
        # two): row i's extend bit tests Iv[i-1]+ge_v >= S[i-1]+go_v, and
        # the lane-0 fill of 0 reproduces the NEG-vs-0 comparison's False
        ivx = shift1((newIv + ge_v >= newS + go_v).astype(jnp.int32), 0) << 3
        pbi = which | ihx | ivx
        # pack the 4-bit code at lane i-1 for row i (matches ops.align
        # layout) into nibble u of the running int32 plane — one aligned
        # store per 8 columns instead of 128 per-column plane stores
        pb_shifted = jnp.concatenate([pbi[:, 1:], pbi[:, :1]], axis=1)
        acc = acc | (pb_shifted << (4 * u))
        # bottom-row score, accumulated into an aligned 128-lane tile
        j = chunk * CHUNK + c_in + 1
        live = j <= nact
        bval = jnp.where(live, newS[:, m_actual : m_actual + 1], NEG)
        bt = jnp.where(sel, bval, bt)
        return newS, newIh, bt, acc

    def col_body8(q, carry):
        # 8x unroll: best measured scheduling window for the Mosaic backend
        # (4x: 61.7 reads/s, 8x: 66.8, 16x: 63.8 end-to-end); also the
        # nibble-packing window for the pointer plane
        S, Ih, bt = carry
        acc = jnp.zeros((batch, mp), jnp.int32)
        for u in range(8):
            S, Ih, bt, acc = col_body(q * 8 + u, u, (S, Ih, bt, acc))
        ptr_ref[q, :, :] = acc
        return S, Ih, bt

    # early exit past the batch's longest read: chunks whose first column
    # exceeds max(n_actual) cannot contribute (bottom is NEG beyond each
    # read's length, so j_end never lands there and the traceback never
    # reads their pointers) — skip the DP entirely and emit NEG bottoms.
    # On bucket slack (reads pad up to 25% short of the bucket) and
    # close-time merged batches this skips the whole tail's column work.
    mx = jnp.max(nact)

    @pl.when(chunk * CHUNK < mx)
    def _run():
        carry0 = (S_ref[:, :], Ih_ref[:, :], jnp.zeros((batch, CHUNK), jnp.float32))
        S_fin, Ih_fin, bt_fin = jax.lax.fori_loop(0, CHUNK // 8, col_body8, carry0)
        S_ref[:, :] = S_fin
        Ih_ref[:, :] = Ih_fin
        bottom_ref[:, :] = bt_fin

    @pl.when(chunk * CHUNK >= mx)
    def _skip():
        bottom_ref[:, :] = jnp.full((batch, CHUNK), NEG, jnp.float32)


@partial(jax.jit, static_argnames=("params", "m_actual"))
def align_forward_pallas(signals, n_actual, template_padded, params: AlignParams,
                         m_actual: int):
    """Forward DP for a batch of B reads.

    signals: (B, N) float32, N a multiple of CHUNK.
    template_padded: (1, MP) float32, lane i = template[i-1], MP multiple
    of 128; pad lanes hold +1e30 so they never win.
    Returns (ptr (N//8, B, MP) int32 — the 4-bit pointer code for column
    j lives in nibble (j-1) % 8 of word (j-1) // 8, column-major across
    reads — and bottom (B, N) f32).  Nibble packing cuts pointer-plane
    stores 8x and keeps them tile-aligned for any B that is a multiple
    of the f32 sublane tile (8).
    """
    B, N = signals.shape
    assert B % 8 == 0 and N % CHUNK == 0
    mp = template_padded.shape[1]
    grid = (N // CHUNK,)
    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    ptr, bottom = pl.pallas_call(
        partial(_align_kernel, params, m_actual),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK // 8, B, mp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N // 8, B, mp), jnp.int32),
            jax.ShapeDtypeStruct((B, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, mp), jnp.float32),
            pltpu.VMEM((B, mp), jnp.float32),
        ],
        interpret=interpret,
    )(signals, template_padded, n_actual[:, None].astype(jnp.int32))
    return ptr, bottom


def pad_template(template: np.ndarray) -> tuple[np.ndarray, int]:
    """Template (M,) -> (1, MP) lane layout with +inf pads; returns (padded, M)."""
    m = len(template)
    mp = _round_up(m + 1, LANE)
    out = np.full((1, mp), 1e30, np.float32)
    out[0, 1 : m + 1] = template
    return out, m


# ---------------------------------------------------------------------------
# Wavefront (anti-diagonal) kernel
# ---------------------------------------------------------------------------
#
# Same DP, same float32 value stream, ~40% fewer vector ops per cell: the
# grid walks anti-diagonals (step t computes every cell (i, j) with
# i + j - 1 == t, template rows still pinned to lanes), so the
# within-column vertical-gap prefix max — a 13-deep serialized
# shift/max chain over 896 lanes in the column kernel, its single
# largest measured cost (tools/profile_align_cost.py: 30%) — collapses
# to ONE shifted max per step:
#
#   C(i, j) = max(C(i-1, j), Q(i, j) + go_v - (i+1)·g)      [the running
#   newIv(i, j) = C(i-1, j) + i·g                            column cummax]
#
# C(i-1, j) sits one lane down on the previous diagonal, exactly like
# every other Gotoh dependency, and the max-set equals the column
# kernel's cummax (max is exact, order-free), while every add uses the
# identical expression tree — so scores, pointers and tracebacks are
# BIT-IDENTICAL to the column kernel and the XLA scan kernel.
#
# The per-cell signal value a[j-1] = a[t-i] is a lane-REVERSED sliding
# window of the signal, maintained by one lane shift + one masked
# insert per step.  Cost: the diagonal sweep runs N + MP steps instead
# of N (+~4% on bench shapes), and cells with j < 1 ride along as
# bounded garbage until the wavefront forces their column-0 boundary
# values (first MP steps only).
#
# Replaces the reference's SeqAn full-matrix DP
# (reference src/align_raw.h:117-158) like the column kernel; pointer
# nibble for cell (i, j) lives at word [(i+j-1)//8, read, i], nibble
# (i+j-1) % 8 (diagonal-major — see traceback_pointers packed='diag';
# the V-extend bit is stored at its source cell, one row up from where
# the column layout keeps it).


def _wave_kernel(params: AlignParams, m_actual: int, n_chunks_boundary: int,
                 with_ptr: bool,
                 sig_ref, tmpl_ref, nact_ref, ptr_ref, bottom_ref,
                 S1_ref, S2_ref, Ih_ref, C_ref, R_ref,
                 ckpt_refs=None, ckpt_chunks: int = 0,
                 init_refs=None, cold_ref=None, window_mode: bool = False,
                 mrow_ref=None, pow_impl=None):
    go_h = np.float32(params.gap_open_h)
    go_v = np.float32(params.gap_open_v)
    ge_h = np.float32(params.gap_extension_h)
    ge_v = np.float32(params.gap_extension_v)
    off = np.float32(params.dist_offset)
    dmin = np.float32(params.dist_min)
    g = np.float32(max(params.gap_extension_v, params.gap_open_v))

    batch, mp = S1_ref.shape
    lane_ii = jax.lax.broadcasted_iota(jnp.int32, (batch, mp), 1)
    lane_i = lane_ii.astype(jnp.float32)
    row0 = lane_ii == 0
    # column-0 boundary values (identical to the column kernel's init)
    S0_col = jnp.where(row0, 0.0, go_v + ge_v * (lane_i - 1.0))

    chunk = pl.program_id(0)

    @pl.when(chunk == 0)
    def _init():
        if init_refs is not None:
            # window mode: resume from a mid-signal diagonal state (the
            # host supplies cold-start values for reads starting at 0)
            S1_ref[:, :] = init_refs[0][:, :]
            S2_ref[:, :] = init_refs[1][:, :]
            Ih_ref[:, :] = init_refs[2][:, :]
            C_ref[:, :] = init_refs[3][:, :]
            R_ref[:, :] = init_refs[4][:, :]
        else:
            # step -1 state: only lane 0 (cell (0,0): S=0, Ih=NEG) is ever
            # read before the wavefront forces a lane's column-0 boundary
            S1_ref[:, :] = jnp.where(row0, 0.0, NEG)
            S2_ref[:, :] = jnp.full((batch, mp), NEG)
            Ih_ref[:, :] = jnp.full((batch, mp), NEG)
            C_ref[:, :] = jnp.full((batch, mp), NEG)
            R_ref[:, :] = jnp.full((batch, mp), NEG)

    tmpl = tmpl_ref[:, :]  # (1, mp) shared, or (B, mp) per-read templates
    nact = nact_ref[:, :]
    sig_tile = sig_ref[:, :]
    if mrow_ref is not None:
        # per-read template length (flank-fused batches): the bottom-row
        # tap becomes a masked reduce over a per-call-constant lane mask
        mrow = mrow_ref[:, :]  # (B, 1) int32
        msel = lane_ii == mrow

    def shift1(x, fill):
        return jnp.concatenate([jnp.full((batch, 1), fill, x.dtype), x[:, :-1]], axis=1)

    neg_h = params.gap_open_h < 0 and params.gap_extension_h <= 0

    def diag_body(c_in, u, force_boundary, carry, R_pre):
        S1, S2, Ih, C, R, rot, bt, acc = carry
        t = chunk * CHUNK + c_in  # global 0-based diagonal step
        # R_pre: this step's reversed signal window, precomputed OFF the
        # serial chain (see make_body8) — the former per-step rot rotate
        # + R shift were ~2 serial lane-permutes per step on the latency
        # chain (tools/profile_wave_floor.py: 16.5% of the kernel)
        R = R_pre
        diff = jnp.abs(R - tmpl)
        sc = jnp.maximum(off - (pow_impl or _pow12)(diff), dmin)
        ih_ext = Ih + ge_h
        ih_open = S1 + go_h
        newIh = jnp.maximum(ih_ext, ih_open)
        if neg_h:
            newM = shift1(S2, -params.dist_min) + sc
            Q = jnp.maximum(newM, newIh)
        else:
            newM = shift1(S2, NEG) + sc
            Q = jnp.where(row0, 0.0, jnp.maximum(newM, newIh))
        cvec = Q + go_v - (lane_i + 1.0) * g
        C_sh = shift1(C, NEG)          # C(i-1, j): the column cummax to row i-1
        newC = jnp.maximum(C_sh, cvec)
        newIv = C_sh + lane_i * g
        newS = jnp.maximum(Q, newIv)
        if with_ptr:
            which = jnp.where(newM >= newS, 0, jnp.where(newIv >= newS, 2, 1))
            ihx = (ih_ext >= ih_open).astype(jnp.int32) << 2
            # V-extend bit stored UNSHIFTED at its source cell: bit 3 of
            # cell (i, j) answers "does Iv(i+1, j) extend from here"; the
            # traceback reads it from the cell it steps TO
            # (ops.align.traceback_pointers), which removes the former
            # per-step BV carry + lane shift AND the pointer-word rotate
            # (codes now pack at lane i, not i-1) — two serial lane
            # permutes per step gone
            ivx = (newIv + ge_v >= newS + go_v).astype(jnp.int32) << 3
            pbi = which | ihx | ivx
            acc = acc | (pbi << (4 * u))
        if force_boundary:
            # the cell (t+1, 0) enters the valid region next step: pin its
            # column-0 boundary (cheap select; only the first MP steps
            # ever match, so the fast body skips it entirely).  In window
            # mode only reads that (re)start at signal origin force it —
            # mid-signal restarts carry real state in those lanes
            bmask = lane_ii == t + 1
            if cold_ref is not None:
                bmask = bmask & (cold_ref[:, :] != 0)
            newS = jnp.where(bmask, S0_col, newS)
            newIh = jnp.where(bmask, NEG, newIh)
        if window_mode:
            bval = newS[:, m_actual : m_actual + 1]
        elif mrow_ref is not None:
            # bottom row per read: cell (m_r, j) with j = t + 1 - m_r
            j = t + 1 - mrow
            live = (j >= 1) & (j <= nact)
            brow = jnp.max(jnp.where(msel, newS, NEG), axis=1, keepdims=True)
            bval = jnp.where(live, brow, NEG)
        else:
            # bottom row: cell (m, j) with j = t + 1 - m
            j = t + 1 - m_actual
            live = (j >= 1) & (j <= nact)
            bval = jnp.where(live, newS[:, m_actual : m_actual + 1], NEG)
        # the step's bottom tap returns to body8, which assembles 8 taps
        # into the tile with ONE concat per word (off the serial chain)
        return S1, newS, newIh, newC, R, rot, bval, acc
        # note the rotation: S2' = S1 happens via positional return order

    unroll = WAVE_UNROLL

    def make_body8(force_boundary):
        def body8(q, carry):
            # ``unroll`` steps per fori iteration (8 per pointer word):
            # larger windows amortize the loop carry at some compile cost
            S1, S2, Ih, C, R, rot, bt = carry
            for w in range(unroll // 8):
                # parallel-R: the word's 8 reversed-window states derive
                # from the word-base R + 8 STATIC signal lanes of rot —
                # independent concats off the serial chain (rot itself
                # rotates once per ``unroll`` steps, below), instead of
                # a serial rotate + shift pair per step.  Value-identical
                # by construction: R(t+u) = [a(t+u) .. a(t), R_base[:-u-1]].
                head = [rot[:, w * 8 + v : w * 8 + v + 1] for v in range(8)]
                R_pres = [jnp.concatenate(
                    [*(head[v] for v in range(u, -1, -1)), R[:, : mp - u - 1]],
                    axis=1) for u in range(8)]
                acc = jnp.zeros((batch, mp), jnp.int32)
                bvals = []
                for u in range(8):
                    S2, S1, Ih, C, _R, rot, bval, acc = diag_body(
                        q * unroll + w * 8 + u, u, force_boundary,
                        (S1, S2, Ih, C, R, rot, None, acc), R_pres[u])
                    bvals.append(bval)
                R = R_pres[7]
                # one 8-tap assembly per word instead of a serial
                # append-rotate per step (same end state: after the
                # chunk, bt[:, u] holds step u's bottom value)
                bt = jnp.concatenate([bt[:, 8:], *bvals], axis=1)
                if with_ptr:
                    ptr_ref[q * (unroll // 8) + w, :, :] = acc
            rot = jnp.concatenate([rot[:, unroll:], rot[:, :unroll]], axis=1)
            return S1, S2, Ih, C, R, rot, bt
        return body8

    # early exit: every pointer the traceback can visit satisfies
    # t = i + j - 1 <= m + j_end - 1 < m + max(nact), and lane-m bottoms
    # past that are dead — skip whole chunks beyond it.  In window mode
    # nact already counts needed local steps.
    if window_mode:
        mx = jnp.max(nact)
    elif mrow_ref is not None:
        mx = jnp.max(nact + mrow)
    else:
        mx = jnp.max(nact) + m_actual

    def _sweep(force_boundary):
        carry0 = (S1_ref[:, :], S2_ref[:, :], Ih_ref[:, :], C_ref[:, :],
                  R_ref[:, :], sig_tile,
                  jnp.zeros((batch, CHUNK), jnp.float32))
        S1f, S2f, Ihf, Cf, Rf, _rotf, btf = jax.lax.fori_loop(
            0, CHUNK // unroll, make_body8(force_boundary), carry0)
        S1_ref[:, :] = S1f
        S2_ref[:, :] = S2f
        Ih_ref[:, :] = Ihf
        C_ref[:, :] = Cf
        R_ref[:, :] = Rf
        bottom_ref[:, :] = btf
        if ckpt_refs is not None:
            # checkpoint output blocks revisit the same index for
            # ckpt_chunks grid steps, so the LAST write before the index
            # advances persists: slot g = diagonal state after step
            # (g+1)*ckpt_chunks*CHUNK - 1 (restarts resume from slot g-1)
            ckpt_refs[0][0, :, :] = S1f
            ckpt_refs[1][0, :, :] = S2f
            ckpt_refs[2][0, :, :] = Ihf
            ckpt_refs[3][0, :, :] = Cf

    @pl.when((chunk < n_chunks_boundary) & (chunk * CHUNK < mx))
    def _run_boundary():
        _sweep(True)

    @pl.when((chunk >= n_chunks_boundary) & (chunk * CHUNK < mx))
    def _run_fast():
        _sweep(False)

    @pl.when(chunk * CHUNK >= mx)
    def _skip():
        bottom_ref[:, :] = jnp.full((batch, CHUNK), NEG, jnp.float32)


@partial(jax.jit, static_argnames=("params", "m_actual", "with_ptr", "pow_impl"))
def align_forward_wave(signals, n_actual, template_padded, params: AlignParams,
                       m_actual: int, with_ptr: bool = True, pow_impl=None):
    """Wavefront forward DP for a batch of B reads.

    signals: (B, N) float32, N a multiple of CHUNK.  Returns
    (ptr (ND//8, B, MP) int32, bottom_steps (B, ND) f32) with
    ND = N + MP diagonal steps; bottom_steps[:, t] holds the bottom-row
    score of column j = t + 1 - m_actual (NEG outside [1, n_actual]),
    and the pointer nibble of cell (i, j) lives at word
    [(i+j-1)//8, read, i], nibble (i+j-1) % 8.  With
    ``with_ptr=False`` the pointer plane is neither computed nor
    allocated (score-only forward; returns (None, bottom_steps)).
    ``pow_impl`` (static; measurement only — tools/probe_pow.py) swaps
    the score's |d|^1.2 lowering; None = production jnp.power.
    """
    B, N = signals.shape
    assert B % 8 == 0 and N % CHUNK == 0
    mp = template_padded.shape[1]
    nd = N + mp
    sig_ext = jnp.pad(signals, ((0, 0), (0, mp)))
    grid = (nd // CHUNK,)
    n_chunks_boundary = mp // CHUNK + 1  # chunks that can touch column 0
    interpret = jax.default_backend() != "tpu"
    out_specs = [pl.BlockSpec((B, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, nd), jnp.float32)]
    if with_ptr:
        out_specs.insert(0, pl.BlockSpec((CHUNK // 8, B, mp), lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
        out_shape.insert(0, jax.ShapeDtypeStruct((nd // 8, B, mp), jnp.int32))

    def kern(sig_ref, tmpl_ref, nact_ref, *rest):
        if with_ptr:
            ptr_ref, bottom_ref = rest[0], rest[1]
            scratch = rest[2:]
        else:
            ptr_ref, bottom_ref = None, rest[0]
            scratch = rest[1:]
        _wave_kernel(params, m_actual, n_chunks_boundary, with_ptr,
                     sig_ref, tmpl_ref, nact_ref, ptr_ref, bottom_ref, *scratch,
                     pow_impl=pow_impl)

    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, mp), jnp.float32) for _ in range(5)],
        interpret=interpret,
    )(sig_ext, template_padded, n_actual[:, None].astype(jnp.int32))
    if with_ptr:
        return outs[0], outs[1]
    return None, outs[0]


@partial(jax.jit, static_argnames=("params",))
def align_forward_wave_multi(signals, n_actual, template_rows, m_rows,
                             params: AlignParams):
    """Wavefront forward DP with PER-ROW templates (flank fusion).

    Like :func:`align_forward_wave`, but row r aligns against its own
    template ``template_rows[r]`` of length ``m_rows[r]`` (lanes beyond
    each row's template hold +1e30).  Lets one 64-wide call carry both
    flanks of a partial batch — or any mix of targets/strands sharing a
    signal bucket — instead of paying the kernel's flat latency twice.
    bottom_steps[:, t] holds the bottom-row score of column
    j = t + 1 - m_rows[r] per row.
    """
    B, N = signals.shape
    assert B % 8 == 0 and N % CHUNK == 0
    mp = template_rows.shape[1]
    nd = N + mp
    sig_ext = jnp.pad(signals, ((0, 0), (0, mp)))
    grid = (nd // CHUNK,)
    n_chunks_boundary = mp // CHUNK + 1
    interpret = jax.default_backend() != "tpu"

    def kern(sig_ref, tmpl_ref, nact_ref, mrow_ref, ptr_ref, bottom_ref, *scratch):
        _wave_kernel(params, 0, n_chunks_boundary, True,
                     sig_ref, tmpl_ref, nact_ref, ptr_ref, bottom_ref, *scratch,
                     mrow_ref=mrow_ref)

    ptr, bottom = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK // 8, B, mp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nd // 8, B, mp), jnp.int32),
            jax.ShapeDtypeStruct((B, nd), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, mp), jnp.float32) for _ in range(5)],
        interpret=interpret,
    )(sig_ext, template_rows, n_actual[:, None].astype(jnp.int32),
      m_rows[:, None].astype(jnp.int32))
    return ptr, bottom


def pad_template_rows(templates) -> tuple[np.ndarray, np.ndarray]:
    """Per-row templates -> ((R, MP) lane layout with +inf pads, (R,) m)."""
    ms = np.array([len(t) for t in templates], np.int32)
    mp = _round_up(int(ms.max()) + 1, LANE)
    out = np.full((len(templates), mp), 1e30, np.float32)
    for r, t in enumerate(templates):
        out[r, 1 : len(t) + 1] = np.asarray(t, np.float32)
    return out, ms


# ---------------------------------------------------------------------------
# Checkpointed two-pass mode for ultra-long reads
# ---------------------------------------------------------------------------
#
# Past the pointer-plane HBM budget (a width-8 plane costs ~3.6 GB per
# million samples) the one-pass kernel cannot run at all.  The two-pass
# mode is exact by construction, with memory O(ND/C + W) per read
# instead of O(ND):
#
#   pass 1  score-only wavefront forward, dumping the full diagonal
#           state (S1, S2, Ih, C, BV) every C steps — the bottom row
#           gives the exact global score and j_end per read;
#   pass 2  re-run WITH pointers from the checkpoint at/before
#           t_end - W, for W steps only.  W bounds the optimal path's
#           diagonal extent from the scoring algebra (every horizontal
#           step costs >= |max(go_h, ge_h)| and the score never beats
#           m*dist_offset, so span <= m + (m*off - raw_min)/|gap|),
#           so the restart state equals the full DP state and the
#           windowed pointers are bit-identical to the one-pass plane.
#
# The reference's SeqAn DP materializes the whole matrix in host RAM
# and hits the same wall (reference src/align_raw.h:117-158); this path
# removes the ceiling entirely.


def wave_span_bound_steps(params: AlignParams, m: int) -> int | None:
    """Upper bound on an optimal path's diagonal extent, in steps.

    None when horizontal gaps are free/positive (no bound exists; such
    configs must use the one-pass plane).
    """
    gap = max(params.gap_open_h, params.gap_extension_h)
    if gap >= 0:
        return None
    raw_min = params.gap_open_v + params.gap_extension_v * (m - 1)
    gain_max = max(params.dist_offset, params.dist_min)  # sc <= max(off, dmin)
    span_cols = m + (m * gain_max - raw_min) / abs(gap)
    return int(np.ceil(span_cols)) + m + 1


@partial(jax.jit, static_argnames=("params", "m_actual", "ckpt_chunks"))
def align_forward_ckpt(signals, n_actual, template_padded, params: AlignParams,
                       m_actual: int, ckpt_chunks: int):
    """Pass 1: score-only forward with diagonal-state checkpoints.

    Returns (bottom_steps (B, ND), ckpts) where ckpts is a 4-tuple of
    (ND/(ckpt_chunks*CHUNK), B, MP) f32 planes (S1, S2, Ih, C):
    slot g holds the state after diagonal step (g+1)*ckpt_chunks*CHUNK-1.
    (The V-extend pointer bit is computed per step from the restart
    state, so no pointer-comparison plane needs checkpointing.)
    """
    B, N = signals.shape
    assert B % 8 == 0 and N % CHUNK == 0
    mp = template_padded.shape[1]
    nd = N + mp
    n_ck = nd // (ckpt_chunks * CHUNK)
    assert n_ck * ckpt_chunks * CHUNK == nd, "ND must divide the checkpoint stride"
    sig_ext = jnp.pad(signals, ((0, 0), (0, mp)))
    grid = (nd // CHUNK,)
    n_chunks_boundary = mp // CHUNK + 1
    interpret = jax.default_backend() != "tpu"

    def kern(sig_ref, tmpl_ref, nact_ref, bottom_ref, s1c, s2c, ihc, cc,
             *scratch):
        _wave_kernel(params, m_actual, n_chunks_boundary, False,
                     sig_ref, tmpl_ref, nact_ref, None, bottom_ref, *scratch,
                     ckpt_refs=(s1c, s2c, ihc, cc), ckpt_chunks=ckpt_chunks)

    ck_spec = pl.BlockSpec((1, B, mp), lambda i, _c=ckpt_chunks: (i // _c, 0, 0),
                           memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((B, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
                   ck_spec, ck_spec, ck_spec, ck_spec],
        out_shape=[jax.ShapeDtypeStruct((B, nd), jnp.float32)]
        + [jax.ShapeDtypeStruct((n_ck, B, mp), jnp.float32) for _ in range(4)],
        scratch_shapes=[pltpu.VMEM((B, mp), jnp.float32) for _ in range(5)],
        interpret=interpret,
    )(sig_ext, template_padded, n_actual[:, None].astype(jnp.int32))
    return outs[0], tuple(outs[1:])


@partial(jax.jit, static_argnames=("params", "m_actual"))
def align_window_from_state(sig_win, r_init, state4, cold, steps_needed,
                            template_padded, params: AlignParams, m_actual: int):
    """Pass 2: pointer-forward over a window, resuming from saved state.

    sig_win: (B, W) — per-read signal samples a[t0 .. t0+W) in diagonal
    step space; r_init: (B, MP) — lane i holds a[t0-1-i] (the reversed
    window preceding the restart); state4: (S1, S2, Ih, C) at step
    t0-1 (host passes cold-start values with cold=1 for reads whose
    window starts at 0); steps_needed: (B,) local steps to compute
    (t_end - t0 + 1).  Returns the (W//8, B, MP) pointer plane in local
    step space.
    """
    B, W = sig_win.shape
    assert B % 8 == 0 and W % CHUNK == 0
    mp = template_padded.shape[1]
    grid = (W // CHUNK,)
    n_chunks_boundary = mp // CHUNK + 1
    interpret = jax.default_backend() != "tpu"

    def kern(sig_ref, tmpl_ref, nact_ref, s1i, s2i, ihi, ci, ri, cold_ref,
             ptr_ref, bottom_ref, *scratch):
        _wave_kernel(params, m_actual, n_chunks_boundary, True,
                     sig_ref, tmpl_ref, nact_ref, ptr_ref, bottom_ref, *scratch,
                     init_refs=(s1i, s2i, ihi, ci, ri), cold_ref=cold_ref,
                     window_mode=True)

    full_spec = pl.BlockSpec((B, mp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ptr, _bt = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            full_spec, full_spec, full_spec, full_spec, full_spec,
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK // 8, B, mp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((W // 8, B, mp), jnp.int32),
            jax.ShapeDtypeStruct((B, W), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, mp), jnp.float32) for _ in range(5)],
        interpret=interpret,
    )(sig_win, template_padded, steps_needed[:, None].astype(jnp.int32),
      state4[0], state4[1], state4[2], state4[3], r_init,
      cold[:, None].astype(jnp.int32))
    return ptr
