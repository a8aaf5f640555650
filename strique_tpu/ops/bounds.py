"""Device-side flank-bound extraction from alignment tracebacks.

Vectorized equivalent of the host path in ``detect_finish``
(reference scripts/STRique.py:540-547 nearest-position mapping and
:581-616 gating): per read, maps template elements to nearest signal
indices, derives the repeat-segment bounds, and evaluates the QC gate —
entirely in integer/XLA ops so it can run fused with the alignment and
Viterbi dispatches (no host round-trip between them).

Exactness: integer arithmetic only; matches
``ops.align._nearest_positions`` element-for-element (first-index
argmin tie-breaking inside vertical-gap runs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_positions(is_gap, jpos, n_sig):
    """Per template element, nearest signal index in alignment view space.

    is_gap: (m,) bool; jpos: (m,) int; n_sig: scalar int.
    Matches ops.align._nearest_positions: elements inside a vertical-gap
    run of length L at left-neighbor j map to j for in-run offset r with
    (r+1) <= (L-r), else j+1; clipped to [0, n_sig-1].
    """
    m = is_gap.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    jp = jpos.astype(jnp.int32)
    prev_gap = jnp.concatenate([jnp.zeros((1,), bool), is_gap[:-1]])
    prev_jp = jnp.concatenate([jnp.full((1,), -1, jnp.int32), jp[:-1]])
    start_flag = is_gap & (~prev_gap | (jp != prev_jp))
    start_idx = jax.lax.cummax(jnp.where(start_flag, idx, -1))
    next_gap = jnp.concatenate([is_gap[1:], jnp.zeros((1,), bool)])
    next_jp = jnp.concatenate([jp[1:], jnp.full((1,), -1, jnp.int32)])
    end_flag = is_gap & (~next_gap | (jp != next_jp))
    end_idx = jax.lax.cummin(jnp.where(end_flag, idx, m), reverse=True)
    r = idx - start_idx
    L = end_idx - start_idx + 1
    pos = jnp.where(is_gap, jnp.where(r + 1 <= L - r, jp, jp + 1), jp)
    return jnp.clip(pos, 0, n_sig - 1)


def segment_bounds(pre, suf, n_sigs, trim_prefix: int, trim_suffix: int):
    """Batched bounds + QC gate from the two flank-alignment tracebacks.

    pre/suf: dicts from ``align_batch`` (score, is_gap, jpos).
    Returns dict of (B,) arrays: raw scores, spans, prefix_begin,
    prefix_end, suffix_begin, suffix_end, ok, seg_len — the same
    quantities ``detect_finish`` derives on host (divisions deferred to
    the host so reported scores stay float64-exact).
    """
    def one(gp, jpp, gs, jps, n_sig):
        pos_p = nearest_positions(gp, jpp, n_sig)
        pos_s = nearest_positions(gs, jps, n_sig)
        mp = pos_p.shape[0]
        ms = pos_s.shape[0]
        span_p = pos_p[mp - 1] - pos_p[0]
        span_s = pos_s[ms - 1] - pos_s[0]
        prefix_begin = pos_p[trim_prefix]
        prefix_end = pos_p[mp - 1]
        suffix_begin = pos_s[0]
        suffix_end = pos_s[ms - 1 - trim_suffix]
        return span_p, span_s, prefix_begin, prefix_end, suffix_begin, suffix_end

    span_p, span_s, pb, pe, sb, se = jax.vmap(one)(
        pre["is_gap"], pre["jpos"].astype(jnp.int32),
        suf["is_gap"], suf["jpos"].astype(jnp.int32),
        n_sigs.astype(jnp.int32))
    # gate: positive per-base scores and a non-empty segment
    # (host: score = raw/span if span > 0 else 0; ok requires score > 0)
    ok = ((pb < se) & (span_p > 0) & (pre["score"] > 0.0)
          & (span_s > 0) & (suf["score"] > 0.0))
    seg_len = jnp.where(ok, se - pb, 1).astype(jnp.int32)
    return {
        "score_p": pre["score"], "score_s": suf["score"],
        "span_p": span_p, "span_s": span_s,
        "prefix_begin": pb, "prefix_end": pe,
        "suffix_begin": sb, "suffix_end": se,
        "ok": ok, "seg_len": seg_len,
    }
