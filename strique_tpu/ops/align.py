"""TPU semi-global affine alignment of a flank template into a raw signal.

Replaces the reference's native SeqAn DP engine (reference
src/align_raw.h:106-158, src/score_distance.h:115-122) with an
XLA-compiled column scan:

  * the DP runs as ``lax.scan`` over signal positions (columns), carrying
    the three Gotoh state vectors over template rows;
  * the within-column vertical-gap recursion (sequential in a naive
    formulation) is folded into an associative prefix-max
    (``lax.cummax``), keeping every column fully vectorized on the VPU;
  * compact traceback pointers (4 bits/cell in a uint8) stream to HBM;
  * the warping positions of the template are recovered by an on-device
    ``lax.while_loop`` traceback emitting one record per template element.

Free end gaps on the signal axis only (template fully aligned), matching
``AlignConfig<true,false,false,true>`` of the reference
(src/align_raw.h:134-135).  Tie-breaking: leftmost end column, matrix
preference M > V > H, gap extension over opening.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .reference import AlignParams, MAT_M, MAT_H, MAT_V

# plain numpy scalar: a module-level jnp constant would initialize the XLA
# backend at import time, breaking jax.distributed.initialize() ordering
NEG = np.float32(-1e30)

# DP-cell accounting (BASELINE.md north star: DP cell-updates/s).  Each
# kernel dispatch site adds its issued cell count (rows x diagonal steps
# x template lanes); bench.py snapshots around timed passes to report
# align_cell_updates_per_sec.  Host-side Python ints — no device cost.
KERNEL_STATS = {"cells": 0, "calls": 0}


def _count_cells(rows: int, steps: int, lanes: int) -> None:
    KERNEL_STATS["cells"] += int(rows) * int(steps) * int(lanes)
    KERNEL_STATS["calls"] += 1


def reset_kernel_stats() -> None:
    KERNEL_STATS["cells"] = 0
    KERNEL_STATS["calls"] = 0


def kernel_stats() -> dict:
    return dict(KERNEL_STATS)


def count_issued_cells_estimate(B: int, npad: int, m_pre: int, m_suf: int) -> None:
    """Account the DP cells a jitted flank-alignment dispatch will issue.

    The jitted pipelines (counter._bounds_pipeline/_pipeline) trace the
    align dispatch loop once, so the per-call-site counters above never
    fire at run time; this mirrors align_fused_pair's dispatch decisions
    (fusion rule, wave call width, diagonal step count) analytically at
    the host call site.  Standard (non-ultra-long) path only — the
    two-pass route dispatches eagerly and self-counts.
    """
    import jax

    from .align_pallas import BATCH_TPU_WAVE as W
    from .align_pallas import CHUNK, _round_up

    if jax.default_backend() != "tpu":
        for m in (m_pre, m_suf):
            _count_cells(B, npad, m + 1)
        return
    nc = _round_up(npad, CHUNK)
    tail = B % W
    if 0 < tail <= W // 2:  # align_fused_pair's fusion rule
        mp = _round_up(max(m_pre, m_suf) + 1, 128)
        calls = -(-2 * B // W)
        _count_cells(calls * W, nc + mp, mp)
        KERNEL_STATS["calls"] += calls - 1
        return
    for m in (m_pre, m_suf):
        mp = _round_up(m + 1, 128)
        rows = -(-B // W) * W
        _count_cells(rows, nc + mp, mp)
        KERNEL_STATS["calls"] += rows // W - 1


@partial(jax.jit, static_argnames=("params", "with_traceback"))
def align_scan(signal, n_actual, template, params: AlignParams, with_traceback: bool = True):
    """Run the DP over ``signal`` (padded to static length) vs ``template``.

    Args:
      signal: (N,) float32, padded; only the first ``n_actual`` entries are real.
      n_actual: scalar int32, true signal length.
      template: (M,) float32 synthetic flank signal.
    Returns dict with ``score`` (f32), ``j_end`` (i32), and, when
    ``with_traceback``, ``is_gap`` (M, bool) / ``jpos`` (M, i32): per
    template element, whether it was consumed in a vertical gap and the
    signal index it maps to (left-neighbor index for gap elements).
    """
    signal = signal.astype(jnp.float32)
    template = template.astype(jnp.float32)
    m = template.shape[0]
    go_h = jnp.float32(params.gap_open_h)
    go_v = jnp.float32(params.gap_open_v)
    ge_h = jnp.float32(params.gap_extension_h)
    ge_v = jnp.float32(params.gap_extension_v)
    off = jnp.float32(params.dist_offset)
    dmin = jnp.float32(params.dist_min)
    g = jnp.maximum(ge_v, go_v)
    idx = jnp.arange(m + 1, dtype=jnp.float32)

    # column j=0.  The `0 * signal[0]` term is a no-op numerically but makes
    # the scan carry init depend on the (per-shard varying) signal, so the
    # kernel stays usable inside shard_map (varying-manual-axes typing).
    S0 = jnp.concatenate([jnp.zeros((1,), jnp.float32), go_v + ge_v * jnp.arange(m, dtype=jnp.float32)])
    S0 = S0 + 0.0 * signal[0]
    Ih0 = jnp.full((m + 1,), NEG) + 0.0 * signal[0]
    Iv0 = S0.at[0].set(NEG)

    def step(carry, xj):
        S, Ih, Iv = carry
        aj, j = xj
        diff = jnp.abs(aj - template)
        sc = jnp.maximum(off - jnp.power(diff, jnp.float32(1.2)), dmin)
        newM = jnp.concatenate([jnp.full((1,), NEG), S[:-1] + sc])
        ih_ext = Ih + ge_h
        ih_open = S + go_h
        newIh = jnp.maximum(ih_ext, ih_open).at[0].set(NEG)
        Q = jnp.maximum(newM, newIh).at[0].set(0.0)
        c = Q + go_v - (idx + 1.0) * g
        cmax = jax.lax.cummax(c)
        newIv = jnp.concatenate([jnp.full((1,), NEG), cmax[:-1] + idx[1:] * g])
        newS = jnp.maximum(jnp.maximum(newM, newIh), newIv).at[0].set(0.0)
        # best-matrix bits with preference M > V > H
        which = jnp.where(newM >= newS, MAT_M, jnp.where(newIv >= newS, MAT_V, MAT_H)).astype(jnp.uint8)
        pb = which[1:]
        pb = pb | ((ih_ext[1:] >= ih_open[1:]).astype(jnp.uint8) << 2)
        sv_prev = jnp.maximum(Q, newIv).at[0].set(0.0)[:-1]
        pb = pb | ((newIv[:-1] + ge_v >= sv_prev + go_v).astype(jnp.uint8) << 3)
        bottom = jnp.where(j <= n_actual, newS[m], NEG)
        ys = (pb, bottom) if with_traceback else (bottom,)
        return (newS, newIh, newIv), ys

    n = signal.shape[0]
    cols = jnp.arange(1, n + 1, dtype=jnp.int32)
    carry, ys = jax.lax.scan(step, (S0, Ih0, Iv0), (signal, cols))
    if with_traceback:
        ptrs, bottom = ys
    else:
        (bottom,) = ys
    bottom = jnp.concatenate([S0[m:], bottom])  # include column 0
    j_end = jnp.argmax(bottom).astype(jnp.int32)
    score = bottom[j_end]
    out = {"score": score, "j_end": j_end}
    if not with_traceback:
        return out
    out.update(traceback_pointers(ptrs, j_end, m))
    return out


def traceback_pointers(ptrs, j_end, m: int, packed=False, m_start=None):
    """Walk the 4-bit pointer array back from cell (m, j_end).

    ``ptrs``: (N, MP) with MP >= m; byte at [j-1, i-1] describes DP cell
    (row i, column j).  With ``packed=True`` (the column Pallas kernel's
    layout), ``ptrs`` is (N//8, MP) int32 and column j's code sits in
    nibble (j-1) % 8 of word [(j-1)//8, i-1].  With ``packed='diag'``
    (the wavefront kernel's layout), the code of cell (i, j) sits at
    diagonal step t = i + j - 1: word [t//8, i], nibble t % 8 — and the
    V-extend bit lives at its SOURCE cell (bit 3 of (i, j) answers
    "does Iv(i+1, j) extend from here"), so the walk reads it from the
    cell it steps to; the kernel then needs no cross-step pointer carry.
    Returns per-template-element gap flags and signal positions plus
    ``j_begin``.  ``m_start`` (traced) overrides the walk's start row
    for per-row template lengths (flank-fused batches); ``m`` stays the
    static output size (entries at indices >= m_start are unused).
    """
    if packed == "diag":
        def lookup(jc, ic):
            t = jnp.maximum(ic + jc - 1, 0)
            word = ptrs[t // 8, ic]
            nib = (word >> (4 * (t % 8))) & 15
            return jnp.where(jc > 0, nib.astype(jnp.uint8), jnp.uint8(MAT_V | 8))
    elif packed:
        def lookup(jc, ic):
            jz = jnp.maximum(jc - 1, 0)
            word = ptrs[jz // 8, ic - 1]
            nib = (word >> (4 * (jz % 8))) & 15
            return jnp.where(jc > 0, nib.astype(jnp.uint8), jnp.uint8(MAT_V | 8))
    else:
        def lookup(jc, ic):
            return jnp.where(jc > 0, ptrs[jnp.maximum(jc - 1, 0), ic - 1].astype(jnp.uint8),
                             jnp.uint8(MAT_V | 8))

    iota_m = jnp.arange(m, dtype=jnp.int32)

    def cond(state):
        i, j, cur, byte, is_gap, jpos = state
        return i > 0

    def body(state):
        # one lookup per step (the fetched next-cell byte is carried), and
        # masked dense row updates instead of scatters — scatters inside a
        # vmapped while_loop dominate traceback runtime on TPU
        i, j, cur, byte, is_gap, jpos = state
        is_m = cur == MAT_M
        is_h = cur == MAT_H
        is_v = cur == MAT_V
        # template element i-1 is consumed on diagonal or vertical moves
        consume = is_m | is_v
        sel = consume & (iota_m == i - 1)
        is_gap = jnp.where(sel, is_v, is_gap)
        jpos = jnp.where(sel, j - 1, jpos)
        ni = jnp.where(is_h, i, i - 1)
        nj = jnp.where(is_v, j, j - 1)
        nbyte = lookup(nj, ni)
        # diag layout: the V-extend bit lives at its source cell (the one
        # being stepped to); column/unpacked layouts keep it at the
        # current cell.  Same value either way — see the kernel comment.
        vext_src = nbyte if packed == "diag" else byte
        ext = jnp.where(is_h, (byte >> 2) & 1, (vext_src >> 3) & 1)
        stay = (~is_m) & (ext == 1)
        ncur = jnp.where(stay, cur, jnp.where(ni > 0, (nbyte & 3).astype(jnp.int32), MAT_M))
        return ni, nj, ncur, nbyte, is_gap, jpos

    # inits are tainted with j_end for shard_map varying-axes typing (no-ops)
    i0 = (jnp.int32(m) if m_start is None else m_start.astype(jnp.int32)) + 0 * j_end
    byte0 = lookup(j_end, i0)
    cur0 = (byte0 & 3).astype(jnp.int32)
    is_gap0 = jnp.zeros((m,), dtype=bool) | (j_end < 0)
    jpos0 = jnp.zeros((m,), dtype=jnp.int32) + 0 * j_end
    _, j_begin, _, _, is_gap, jpos = jax.lax.while_loop(
        cond, body, (i0, j_end, cur0, byte0, is_gap0, jpos0))
    return {"is_gap": is_gap, "jpos": jpos, "j_begin": j_begin}


@partial(jax.jit, static_argnames=("params", "m_actual"))
def _align_batch_pallas(signals, n_actual, template_padded,
                        params: AlignParams, m_actual: int):
    from .align_pallas import align_forward_pallas

    ptr, bottom = align_forward_pallas(signals, n_actual, template_padded, params, m_actual)
    # include virtual column 0 (full-template vertical gap, no signal)
    b0 = jnp.float32(params.gap_open_v) + jnp.float32(params.gap_extension_v) * (m_actual - 1)
    bottom = jnp.concatenate([jnp.full((signals.shape[0], 1), b0), bottom], axis=1)
    j_end = jnp.argmax(bottom, axis=1).astype(jnp.int32)
    score = jnp.take_along_axis(bottom, j_end[:, None], axis=1)[:, 0]
    # ptr layout is (N//8, B, MP) nibble-packed: vmap over the read axis 1
    tb = jax.vmap(lambda p, je: traceback_pointers(p, je, m_actual, packed=True),
                  in_axes=(1, 0))(ptr, j_end)
    return {"score": score, "j_end": j_end, **tb}


@partial(jax.jit, static_argnames=("params", "m_actual"))
def _align_batch_wave(signals, n_actual, template_padded,
                      params: AlignParams, m_actual: int):
    from .align_pallas import align_forward_wave

    ptr, bottom_steps = align_forward_wave(signals, n_actual, template_padded,
                                           params, m_actual)
    # bottom_steps[:, t] = bottom(column j = t + 1 - m): columns 1..N sit
    # at steps m..m+N-1; prepend the virtual column 0 like the column path
    bottom_cols = bottom_steps[:, m_actual : m_actual + signals.shape[1]]
    b0 = jnp.float32(params.gap_open_v) + jnp.float32(params.gap_extension_v) * (m_actual - 1)
    bottom = jnp.concatenate(
        [jnp.full((signals.shape[0], 1), b0), bottom_cols], axis=1)
    j_end = jnp.argmax(bottom, axis=1).astype(jnp.int32)
    score = jnp.take_along_axis(bottom, j_end[:, None], axis=1)[:, 0]
    tb = jax.vmap(lambda p, je: traceback_pointers(p, je, m_actual, packed="diag"),
                  in_axes=(1, 0))(ptr, j_end)
    return {"score": score, "j_end": j_end, **tb}


@partial(jax.jit, static_argnames=("params", "m_max"))
def _align_batch_wave_multi(signals, n_actual, tmpl_rows, m_rows,
                            params: AlignParams, m_max: int):
    from .align_pallas import align_forward_wave_multi

    ptr, bottom_steps = align_forward_wave_multi(signals, n_actual, tmpl_rows,
                                                 m_rows, params)
    # leftmost-max over columns, including the virtual column 0 (b0):
    # argmax in step space is argmax in column space (monotonic shift)
    smax = jnp.max(bottom_steps, axis=1)
    tstar = jnp.argmax(bottom_steps, axis=1).astype(jnp.int32)
    jstar = tstar + 1 - m_rows.astype(jnp.int32)
    b0 = (jnp.float32(params.gap_open_v)
          + jnp.float32(params.gap_extension_v) * (m_rows.astype(jnp.float32) - 1.0))
    j_end = jnp.where(b0 >= smax, 0, jstar).astype(jnp.int32)
    score = jnp.maximum(b0, smax)
    tb = jax.vmap(lambda p, je, mr: traceback_pointers(p, je, m_max, packed="diag",
                                                       m_start=mr),
                  in_axes=(1, 0, 0))(ptr, j_end, m_rows.astype(jnp.int32))
    return {"score": score, "j_end": j_end, **tb}


def align_fused_pair(signals, n_actual, t_pre, t_suf, params: AlignParams,
                     devices=None):
    """Both flank alignments of a batch as ONE per-row-template stream.

    The wave kernel's per-call time is flat in width, so a partial batch
    (B <= 32) pays the same for one fused 64-wide call as it would for
    ONE of its two flank calls — this halves the align cost of ragged
    tail batches (rows: [read0 x prefix .. readB x prefix, read0 x
    suffix ..]).  Returns (pre, suf) dicts shaped like align_core's.
    Falls back to two plain calls off-TPU, under STRIQUE_ALIGN_FUSE=0,
    or past the pointer budget (the two-pass long-read route owns that
    regime).
    """
    import os

    signals = jnp.asarray(signals, jnp.float32)
    n_actual = jnp.asarray(n_actual, jnp.int32)
    t_pre = np.asarray(t_pre, np.float32)
    t_suf = np.asarray(t_suf, np.float32)
    from .align_pallas import (CHUNK, kernel_batch, pad_template_rows,
                               ptr_budget_bytes)

    fuse_env = os.environ.get("STRIQUE_ALIGN_FUSE")
    use_fuse = ((jax.default_backend() == "tpu" and fuse_env != "0")
                or fuse_env == "force")  # force: interpret-mode testing
    if use_fuse and fuse_env != "force":
        # fuse only when it reduces the kernel-call count: with call
        # width W, ceil(2B/W) < 2*ceil(B/W) iff the per-flank tail is at
        # most half a call.  Full batches gain nothing and would pay the
        # per-row-template overhead (masked bottom taps, (B, MP)
        # template reads), measured as ~5% on the uniform bench.
        from .align_pallas import BATCH_TPU_WAVE as _W

        tail = signals.shape[0] % _W
        if tail == 0 or tail > _W // 2:
            use_fuse = False
    if use_fuse:
        tmpl_rows_np, ms = pad_template_rows([t_pre, t_suf])
        mp = tmpl_rows_np.shape[1]
        nd = signals.shape[1] + (-signals.shape[1]) % CHUNK + mp
        if nd * 8 * mp // 2 > ptr_budget_bytes():
            use_fuse = False
    if not use_fuse:
        pre = align_core(signals, n_actual, t_pre, params, devices=devices)
        suf = align_core(signals, n_actual, t_suf, params, devices=devices)
        return pre, suf

    B, N = signals.shape
    npad = (-N) % CHUNK
    if npad:
        signals = jnp.pad(signals, ((0, 0), (0, npad)))
    m_max = int(ms.max())
    sig2 = jnp.concatenate([signals, signals])
    na2 = jnp.concatenate([n_actual, n_actual])
    rows2 = np.concatenate([np.repeat(tmpl_rows_np[0:1], B, axis=0),
                            np.repeat(tmpl_rows_np[1:2], B, axis=0)])
    ms2 = np.concatenate([np.full(B, ms[0], np.int32), np.full(B, ms[1], np.int32)])
    rows2_dev = jnp.asarray(rows2)
    outs = []
    b0 = 0
    R = 2 * B
    while b0 < R:
        kb = kernel_batch(R - b0, n_cols=sig2.shape[1] + mp, mp=mp, wave=True)
        end = b0 + kb
        sl, na, tr, mr = (sig2[b0:end], na2[b0:end], rows2_dev[b0:end], ms2[b0:end])
        if end > R:
            sl = jnp.pad(sl, ((0, end - R), (0, 0)))
            na = jnp.pad(na, (0, end - R), constant_values=1)
            tr = jnp.pad(tr, ((0, end - R), (0, 0)), constant_values=1e30)
            mr = np.pad(mr, (0, end - R), constant_values=1)
        _count_cells(kb, sig2.shape[1] + mp, mp)
        outs.append(_align_batch_wave_multi(sl, na, tr, jnp.asarray(mr), params, m_max))
        b0 = end
    out = {k: jnp.concatenate([o[k] for o in outs])[:R] for k in outs[0]}
    pre = {k: (v[:B, : len(t_pre)] if v.ndim == 2 else v[:B]) for k, v in out.items()}
    suf = {k: (v[B:, : len(t_suf)] if v.ndim == 2 else v[B:]) for k, v in out.items()}
    return pre, suf


@partial(jax.jit, static_argnames=("W", "mp"))
def _gather_windows(sig_dev, t0_dev, W: int, mp: int):
    """Device-side per-read window gather for the two-pass pass 2.

    Replaces the per-read host slice loop (B numpy copies of W-sample
    windows + a B*W H2D) with one on-device gather of the already
    uploaded signals: sig_win[i] = a_i[t0 .. t0+W) and r_init[i] =
    reversed a_i[t0-mp .. t0) (zero-padded outside the signal, matching
    the host path's pad semantics).
    """
    sig_ext = jnp.pad(sig_dev, ((0, 0), (mp, W)))
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    sig_win = jnp.take_along_axis(sig_ext, mp + t0_dev[:, None] + cols, axis=1)
    rcols = jnp.arange(mp, dtype=jnp.int32)[None, :]
    r_init = jnp.take_along_axis(sig_ext, t0_dev[:, None] + rcols, axis=1)[:, ::-1]
    return sig_win, r_init


def _longread_pass1(signals, n_actual, template_np: np.ndarray,
                    params: AlignParams, ckpt_steps: int, device=None) -> dict:
    """Dispatch the two-pass pass 1 (score-only forward + checkpoints).

    Returns a state dict of device arrays + metadata; the dispatch is
    asynchronous, so callers can fan several groups out over devices
    (``device``: jax.Device to pin this group's computation to) before
    the first :func:`_longread_pass2` synchronizes.
    """
    from .align_pallas import (CHUNK, align_forward_ckpt, pad_template,
                               wave_span_bound_steps)

    signals = np.asarray(signals, np.float32)
    n_actual = np.asarray(n_actual, np.int32)
    B, N = signals.shape
    assert B % 8 == 0
    tmpl_padded, m = pad_template(np.asarray(template_np))
    mp = tmpl_padded.shape[1]
    bound = wave_span_bound_steps(params, m)
    if bound is None:
        raise ValueError(
            "two-pass alignment needs negative horizontal gap costs "
            "(no span bound exists otherwise); use the one-pass kernel")
    # every warm restart t0 (a checkpoint boundary) must lie past the
    # column-0 boundary region: pass 2 only forces boundary state for
    # cold (t0 == 0) reads, so a warm t0 < mp could miss a column-0
    # entry tie at the span-bound edge.  Clamp ckpt_steps >= mp so the
    # first checkpoint boundary is already beyond the boundary region.
    ckpt_chunks = max(ckpt_steps // CHUNK, -(-mp // CHUNK), 1)
    ckpt_steps = ckpt_chunks * CHUNK
    # pad N so ND divides the checkpoint stride
    nd = ((N + mp + ckpt_steps - 1) // ckpt_steps) * ckpt_steps
    npad = nd - mp - N
    if npad:
        signals = np.pad(signals, ((0, 0), (0, npad)))
        N = signals.shape[1]
    W = ((bound + ckpt_steps + CHUNK - 1) // CHUNK) * CHUNK

    def put(x):
        return jax.device_put(x, device) if device is not None else jnp.asarray(x)

    sig_dev = put(signals)
    tmpl_dev = put(tmpl_padded)
    _count_cells(B, N + mp, mp)  # pass 1 (score-only forward)
    bottom_steps, ckpts = align_forward_ckpt(
        sig_dev, put(n_actual), tmpl_dev, params, m, ckpt_chunks)
    return {"bottom_steps": bottom_steps, "ckpts": ckpts, "sig_dev": sig_dev,
            "tmpl_dev": tmpl_dev, "params": params, "m": m, "mp": mp,
            "bound": bound, "ckpt_steps": ckpt_steps, "B": B, "N": N, "W": W,
            "device": device, "put": put}


def _longread_pass2(st: dict) -> dict:
    """Synchronize a pass-1 state and run pass 2 + traceback.

    Returns the align_core-shaped dict as HOST numpy arrays (groups may
    live on different devices; callers concatenate on host).
    """
    from .align_pallas import align_window_from_state

    params, m, mp = st["params"], st["m"], st["mp"]
    B, N, W = st["B"], st["N"], st["W"]
    put = st["put"]
    # exact score / j_end from the step-space bottoms (column j at step
    # m+j-1; virtual column 0 = full-template vertical gap)
    bottom_cols = st["bottom_steps"][:, m : m + N]
    b0 = jnp.float32(params.gap_open_v) + jnp.float32(params.gap_extension_v) * (m - 1)
    bottom = jnp.concatenate([jnp.full((B, 1), b0), bottom_cols], axis=1)
    j_end = np.asarray(jnp.argmax(bottom, axis=1)).astype(np.int64)
    score = np.asarray(jnp.take_along_axis(bottom, put(j_end)[:, None], axis=1))[:, 0]

    # per-read window: [t0, t0+W) with t0 on a checkpoint boundary at or
    # before t_end - bound, so every step the traceback can visit is
    # in-window; W >= bound + ckpt_steps makes t_end fit
    t_end = j_end + m - 1
    t0 = np.maximum(t_end - st["bound"], 0) // st["ckpt_steps"] * st["ckpt_steps"]
    cold = (t0 == 0).astype(np.int32)
    slot = t0 // st["ckpt_steps"] - 1  # checkpoint slot g-1; cold reads ignore it
    slot_d = put(np.maximum(slot, 0).astype(np.int32))

    # gather per-read restart state (cold reads get cold-start values)
    lane = np.arange(mp)
    cold_state = [
        np.where(lane == 0, 0.0, NEG).astype(np.float32)[None, :].repeat(B, 0),
        np.full((B, mp), NEG, np.float32),
        np.full((B, mp), NEG, np.float32),
        np.full((B, mp), NEG, np.float32),
    ]
    state4 = []
    for k in range(4):
        warm = np.asarray(jnp.take_along_axis(
            st["ckpts"][k], slot_d[None, :, None], axis=0)[0])
        state4.append(np.where(cold[:, None] == 1, cold_state[k], warm))
    # per-read signal window + reversed pre-window, gathered ON DEVICE
    # from the already-uploaded signals (no B x W host copies/uploads)
    sig_win, r_init = _gather_windows(st["sig_dev"], put(t0.astype(np.int32)), W, mp)
    steps_needed = (t_end - t0 + 1).astype(np.int32)

    _count_cells(B, W, mp)  # pass 2 (windowed pointer recompute)
    ptr = align_window_from_state(
        sig_win, r_init, tuple(put(x) for x in state4), put(cold),
        put(steps_needed), st["tmpl_dev"], params, m)

    # traceback per read in local step space (j_local = j_global - t0)
    j_end_local = put((j_end - t0).astype(np.int32))
    tb = jax.vmap(lambda p, je: traceback_pointers(p, je, m, packed="diag"),
                  in_axes=(1, 0))(ptr, j_end_local)
    return {
        "score": score.astype(np.float32),
        "j_end": j_end.astype(np.int32),
        "is_gap": np.asarray(tb["is_gap"]),
        "jpos": np.asarray(tb["jpos"]) + t0.astype(np.int32)[:, None],
        "j_begin": np.asarray(tb["j_begin"]) + t0.astype(np.int32),
    }


def align_batch_longread(signals, n_actual, template_np: np.ndarray,
                         params: AlignParams, ckpt_steps: int = 16384,
                         device=None):
    """Checkpointed two-pass alignment for reads past the pointer budget.

    Exact by construction (see ops.align_pallas two-pass notes): pass 1
    runs the score-only wavefront with diagonal-state checkpoints every
    ``ckpt_steps``; pass 2 recomputes pointers for a window that
    provably contains the optimal path, resuming from the checkpoint at
    its start — the restart state equals the full DP state, so pointers
    and tracebacks are bit-identical to a (hypothetical) full plane.
    Memory: O(ND/ckpt_steps + W) per read instead of O(ND).  The
    reference's full-matrix SeqAn DP (src/align_raw.h:117-158) has no
    such mode and exhausts host RAM at the same scale.
    """
    out = _longread_pass2(_longread_pass1(signals, n_actual, template_np,
                                          params, ckpt_steps, device))
    return {k: jnp.asarray(v) for k, v in out.items()}


def align_longread_sharded(signals, n_actual, template_np: np.ndarray,
                           params: AlignParams, devices=None,
                           ckpt_steps: int = 16384, group: int = 8):
    """Two-pass alignment with 8-wide groups round-robined over devices.

    The phases are independent per group, so ultra-long batches scale
    across chips without shard_map: every group's pass 1 dispatches
    (asynchronously) to its device before the first pass-2 synchronizes,
    and pass 2 / traceback then overlap across devices the same way.
    ``devices=None`` (or a single device) degrades to the sequential
    single-device behavior.  Results are bit-identical to
    :func:`align_batch_longread` — same kernels, same per-group math.
    """
    signals = np.asarray(signals, np.float32)
    n_actual = np.asarray(n_actual, np.int32)
    B = signals.shape[0]
    devs = list(devices) if devices else [None]
    states = []
    for gi, g0 in enumerate(range(0, B, group)):
        sl = signals[g0 : g0 + group]
        na = n_actual[g0 : g0 + group]
        if len(sl) < group:
            sl = np.pad(sl, ((0, group - len(sl)), (0, 0)))
            na = np.pad(na, (0, group - len(na)), constant_values=1)
        states.append(_longread_pass1(sl, na, template_np, params, ckpt_steps,
                                      device=devs[gi % len(devs)]))
    outs = [_longread_pass2(st) for st in states]
    return {k: jnp.asarray(np.concatenate([o[k] for o in outs])[:B])
            for k in outs[0]}


def align_core(signals, n_actual, template_np: np.ndarray, params: AlignParams,
               impl: str = "auto", devices=None):
    """Batched alignment on local data — traceable inside jit/shard_map.

    signals: (B, N); uses the Pallas kernel on TPU (B padded to the
    kernel batch, N must be a multiple of its chunk), the lax.scan kernel
    elsewhere.  ``template_np`` must be a host numpy array (its length is
    static).  ``devices``: optional jax.Device list for the ultra-long
    two-pass route only (its host-orchestrated groups round-robin over
    them; the standard in-jit path ignores it — mesh callers shard via
    shard_map instead).  Returns dict of per-read arrays (score, j_end,
    is_gap, jpos, j_begin).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl in ("pallas", "pallas_col", "pallas_wave"):
        import os

        from .align_pallas import CHUNK, kernel_batch, pad_template

        if impl == "pallas":
            # wavefront by default (bit-identical, ~1.3x the column
            # kernel); STRIQUE_ALIGN_KERNEL=col restores the column sweep
            impl = ("pallas_col"
                    if os.environ.get("STRIQUE_ALIGN_KERNEL") == "col"
                    else "pallas_wave")
        batch_fn = (_align_batch_wave if impl == "pallas_wave"
                    else _align_batch_pallas)
        B, N = signals.shape
        npad = (-N) % CHUNK
        if npad:
            signals = jnp.pad(signals, ((0, 0), (0, npad)))
        tmpl_padded, m = pad_template(np.asarray(template_np))
        if impl == "pallas_wave":
            # past the HBM budget even a width-8 one-pass pointer plane
            # cannot exist: route to the exact checkpointed two-pass
            from .align_pallas import ptr_budget_bytes, wave_span_bound_steps

            nd = signals.shape[1] + tmpl_padded.shape[1]
            if (nd * 8 * tmpl_padded.shape[1] // 2 > ptr_budget_bytes()
                    and wave_span_bound_steps(params, m) is not None):
                # 8-wide groups bound pass-1 memory; with ``devices`` the
                # groups round-robin over chips (pass-1 dispatches fan
                # out before the first sync) — the ultra-long regime
                # scales with the mesh like the standard path does
                return align_longread_sharded(np.asarray(signals),
                                              np.asarray(n_actual),
                                              template_np, params,
                                              devices=devices)
        tmpl_dev = jnp.asarray(tmpl_padded)
        outs = []
        b0 = 0
        while b0 < B:
            # full groups at the 32-wide kernel; the tail at the smallest
            # covering width (8/16/24) so partial batches don't pay full price
            wave = impl == "pallas_wave"
            # wave pointer plane covers N + MP diagonal steps
            n_cols = signals.shape[1] + (tmpl_padded.shape[1] if wave else 0)
            kb = kernel_batch(B - b0, n_cols=n_cols,
                              mp=tmpl_padded.shape[1], wave=wave)
            end = b0 + kb
            sl, na = signals[b0:end], n_actual[b0:end]
            if end > B:
                sl = jnp.pad(sl, ((0, end - B), (0, 0)))
                na = jnp.pad(na, (0, end - B), constant_values=1)
            _count_cells(kb, n_cols if wave else signals.shape[1], tmpl_padded.shape[1])
            outs.append(batch_fn(sl, na, tmpl_dev, params, m))
            b0 = end
        out = {k: jnp.concatenate([o[k] for o in outs])[:B] for k in outs[0]}
        return out
    template = jnp.asarray(template_np, jnp.float32)
    _count_cells(signals.shape[0], signals.shape[1], len(template_np) + 1)
    inner = jax.vmap(lambda s, n: align_scan(s, n, template, params, True))
    return inner(signals, n_actual)


def align_batch(signals, n_actual, template, params: AlignParams, impl: str = "auto",
                mesh=None):
    """Batched alignment front-end.

    With ``mesh``, the batch is sharded over the mesh's ``data`` axis via
    ``shard_map`` (B padded to a multiple of the axis size; template
    replicated); each shard runs the same kernel the single-device path
    uses — the Pallas forward on TPU, the XLA scan elsewhere.
    Returns dict of per-read arrays (score, j_end, is_gap, jpos, j_begin).
    """
    signals = jnp.asarray(signals, jnp.float32)
    n_actual = jnp.asarray(n_actual, jnp.int32)
    template_np = np.asarray(template, np.float32)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import shard_map

        B = signals.shape[0]
        dp = mesh.shape["data"]
        bpad = (-B) % dp
        if bpad:
            signals = jnp.pad(signals, ((0, bpad), (0, 0)))
            n_actual = jnp.pad(n_actual, (0, bpad), constant_values=1)
        fn = shard_map(
            lambda s, n: align_core(s, n, template_np, params, impl),
            mesh, in_specs=(P("data"), P("data")), out_specs=P("data"))
        out = fn(signals, n_actual)
        return {k: v[:B] for k, v in out.items()}
    return align_core(signals, n_actual, template_np, params, impl)


def _nearest_positions(is_gap: np.ndarray, jpos: np.ndarray, n: int) -> np.ndarray:
    """Per template element, the nearest signal index in alignment view space.

    Replicates ``argmin(|a_idx - b_idx[k]|)`` of the reference
    (scripts/STRique.py:540-547) without materializing view-position
    arrays: matched elements map exactly; elements inside a vertical gap
    run of length L at left-neighbor j map to j if (r+1) <= (L-r) for
    in-run offset r (first-index tie-breaking of argmin), else j+1.
    """
    m = len(jpos)
    pos = jpos.astype(np.int64).copy()
    g = np.asarray(is_gap, dtype=bool)
    if g.any():
        # a gap run starts where the predecessor is non-gap or maps to a
        # different left neighbor; offsets within each run decide the
        # argmin tie-break (vectorized — the scalar run walk was a
        # per-read host hot spot in the two-phase decode path)
        jp = jpos.astype(np.int64)
        start = g & ~(np.concatenate(([False], g[:-1]))
                      & (np.concatenate(([np.int64(-1)], jp[:-1])) == jp))
        run_id = np.cumsum(start) - 1  # valid where g
        starts_idx = np.flatnonzero(start)
        lengths = np.bincount(run_id[g])
        r = np.arange(m) - starts_idx[np.maximum(run_id, 0)]
        L = lengths[np.maximum(run_id, 0)]
        pos[g] = np.where((r + 1) <= (L - r), jp, jp + 1)[g]
    return np.clip(pos, 0, n - 1)


def detect_range(signal_padded, n_actual: int, template, params: AlignParams,
                 pre_trim: int = 0, post_trim: int = 0):
    """Device-aligned equivalent of reference ``__detect_range__`` (STRique.py:538-548).

    Returns (per-sample score, segment_begin, segment_end) in signal coords.
    """
    res = align_scan(jnp.asarray(signal_padded), jnp.int32(n_actual), jnp.asarray(template), params)
    is_gap = np.asarray(res["is_gap"])
    jpos = np.asarray(res["jpos"])
    pos = _nearest_positions(is_gap, jpos, int(n_actual))
    seg_begin = int(pos[0])
    seg_end = int(pos[-1])
    score = float(res["score"])
    if seg_end > seg_begin:
        score = score / (seg_end - seg_begin)
    else:
        score = 0.0
    return score, int(pos[pre_trim]), int(pos[len(pos) - 1 - post_trim])
