"""Device-side signal preprocessing (jittable, masked for padded lengths).

Moves the reference's per-read host preprocessing chain (reference
scripts/STRique.py:590-597) onto the TPU: median filter, uint8
quantization, greyscale open/close, and minmax normalization whose
tail-median statistics are computed with one sort per channel (exact
replication of np.percentile linear interpolation and tail medians on
the valid prefix of a padded buffer).

All inputs are integer-valued in practice (raw ADC counts and morphology
outputs), so float32 statistics match the float64 host oracle exactly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .signal import medfilt3_jnp, MORPH_WINDOW

BIG = jnp.float32(3e38)


def _masked(x, n, fill):
    idx = jnp.arange(x.shape[0])
    return jnp.where(idx < n, x, fill)


def _wred(x, left, right, op, pad):
    n = x.shape[0]
    ext = jnp.concatenate([jnp.full((left,), pad, x.dtype), x, jnp.full((right,), pad, x.dtype)])
    out = ext[:n]
    for off in range(1, left + right + 1):
        out = op(out, ext[off : off + n])
    return out


def _open_close(x, n):
    w = MORPH_WINDOW
    l = w // 2
    x = _masked(x, n, BIG)
    x = _wred(x, l, w - 1 - l, jnp.minimum, BIG)  # erode
    x = _masked(x, n, -BIG)
    x = _wred(x, w - 1 - l, l, jnp.maximum, -BIG)  # dilate
    x = _masked(x, n, -BIG)
    x = _wred(x, w - 1 - l, l, jnp.maximum, -BIG)  # dilate
    x = _masked(x, n, BIG)
    x = _wred(x, l, w - 1 - l, jnp.minimum, BIG)  # erode
    return x


def _median_sorted(sorted_x, count):
    """Median of the first ``count`` entries of a sorted array (np.median)."""
    lo = jnp.maximum((count - 1) // 2, 0)
    hi = jnp.maximum(count // 2, 0)
    med = 0.5 * (sorted_x[lo] + sorted_x[hi])
    return jnp.where(count > 0, med, jnp.nan)


def _percentile_sorted(sorted_x, n, q):
    """np.percentile linear interpolation on the valid prefix."""
    pos = (n.astype(jnp.float32) - 1.0) * (q / 100.0)
    f = jnp.floor(pos)
    lo = f.astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    w = pos - f
    return sorted_x[lo] * (1.0 - w) + sorted_x[hi] * w


def minmax_stats(x, n):
    """Tail medians (m5, m95) of x[:n] (reference STRique.py:152-158)."""
    xs = jnp.sort(_masked(x, n, BIG))
    q5 = _percentile_sorted(xs, n, 1.0)
    q95 = _percentile_sorted(xs, n, 99.0)
    c5 = jnp.sum((xs < q5) & (jnp.arange(x.shape[0]) < n))
    m5 = _median_sorted(xs, c5)
    c95 = jnp.sum((xs > q95) & (jnp.arange(x.shape[0]) < n))
    # values > q95 are the last c95 valid entries: sorted indices [n-c95, n)
    base = n - c95
    lo = base + jnp.maximum((c95 - 1) // 2, 0)
    hi = base + jnp.maximum(c95 // 2, 0)
    m95 = jnp.where(c95 > 0, 0.5 * (xs[lo] + xs[hi]), jnp.nan)
    return m5, m95


def minmax_affine(m5_sig, m95_sig, m5_mod, m95_mod):
    """Affine coefficients of the reference minmax mapping (STRique.py:159-160)."""
    half_sig = (m95_sig - m5_sig) / 2.0
    mid_sig = m5_sig + half_sig
    half_mod = (m95_mod - m5_mod) / 2.0
    mid_mod = m5_mod + half_mod
    scale = half_mod / half_sig
    offset = mid_mod - mid_sig * scale
    return scale, offset


@partial(jax.jit, static_argnames=("model_const",))
def preprocess(raw, n_actual, model_const):
    """Full per-read preprocessing on device.

    raw: (N,) float32 padded raw signal; n_actual: scalar int32.
    model_const: hashable tuple
      (m5_mod, m95_mod, clip_lo, clip_hi) from the pore model.
    Returns dict with morph_n, flt_n, nrm_n (all (N,) float32, clipped
    and normalized to model space) — morph_n feeds the aligner, flt_n
    the repeat HMM, nrm_n the mod HMM.
    """
    m5_mod, m95_mod, clip_lo, clip_hi = [jnp.float32(v) for v in model_const]
    n = n_actual
    raw = _masked(raw.astype(jnp.float32), n, 0.0)
    flt = medfilt3_jnp(raw)
    flt = _masked(flt, n, 0.0)
    # median / MAD of flt
    fs = jnp.sort(_masked(flt, n, BIG))
    med = _median_sorted(fs, n)
    mad = jnp.sum(jnp.abs(_masked(flt - med, n, 0.0))) / n.astype(jnp.float32)
    # morphology channel
    q = jnp.clip((flt - med) / mad * 24.0 + 127.0, 0.0, 255.0)
    q = jnp.floor(q)  # uint8 truncation
    morph = _open_close(q, n)

    def norm(channel):
        m5, m95 = minmax_stats(channel, n)
        scale, offset = minmax_affine(m5, m95, m5_mod, m95_mod)
        return jnp.clip(channel * scale + offset, clip_lo, clip_hi)

    return {"morph_n": norm(morph), "flt_n": norm(flt), "nrm_n": norm(raw)}


def model_const(pm) -> tuple:
    """Static normalization constants for a PoreModel."""
    return (pm._m5_mod, pm._m95_mod, pm.model_min + 0.5, pm.model_max - 0.5)
