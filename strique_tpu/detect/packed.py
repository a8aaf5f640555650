"""Packed batch-result layout shared by the fused pipeline and tools.

The fused detection tail ships one byte buffer per batch from device to
host (the transfer link has a flat per-transfer latency, so one packed
D2H beats many small ones).  This module owns the layout so the counter,
the profiling tools and the parity tools decode it identically.

Per-read row layout::

    [ META_FLOATS float32 as bytes | path (u8, or u16-LE when the HMM
      has more than 256 states) ]

Meta fields (float32 each, exact for the integer-valued entries):
score_p, span_p, score_s, span_s, prefix_begin, prefix_end,
suffix_begin, suffix_end, ok, seg_len.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

META_FIELDS = ("score_p", "span_p", "score_s", "span_s",
               "prefix_begin", "prefix_end", "suffix_begin", "suffix_end",
               "ok", "seg_len")
META_FLOATS = len(META_FIELDS)
META_BYTES = 4 * META_FLOATS


def path_itemsize(n_states: int) -> int:
    """Bytes per path entry: u8 up to 256 states, u16 beyond."""
    return 1 if n_states <= 256 else 2


def pack_meta(bounds: dict):
    """Device-side: bounds dict -> (B, META_FLOATS) float32 meta rows.

    The bounds-only D2H of the split pipeline (40 bytes/read); also the
    meta prefix of :func:`pack_results`.  Integer fields are exact in
    float32 (all are < 2^24).
    """
    import jax.numpy as jnp

    return jnp.stack([
        bounds["score_p"], bounds["span_p"].astype(jnp.float32),
        bounds["score_s"], bounds["span_s"].astype(jnp.float32),
        bounds["prefix_begin"].astype(jnp.float32),
        bounds["prefix_end"].astype(jnp.float32),
        bounds["suffix_begin"].astype(jnp.float32),
        bounds["suffix_end"].astype(jnp.float32),
        bounds["ok"].astype(jnp.float32),
        bounds["seg_len"].astype(jnp.float32),
    ], axis=1)


def unpack_meta(meta: np.ndarray) -> list[ReadResult]:
    """Host-side inverse of :func:`pack_meta` ((B, META_FLOATS) float32).

    Returns ReadResults with ``path=None`` (paths travel separately in
    the split pipeline).
    """
    out = []
    for i in range(meta.shape[0]):
        (score_p, span_p, score_s, span_s,
         pb, pe, sb, se, okf, seg_len) = meta[i]
        span_p, span_s = int(span_p), int(span_s)
        out.append(ReadResult(
            ok=bool(okf),
            score_prefix=float(score_p) / span_p if span_p > 0 else 0.0,
            score_suffix=float(score_s) / span_s if span_s > 0 else 0.0,
            prefix_begin=int(pb), prefix_end=int(pe),
            suffix_begin=int(sb), suffix_end=int(se),
            seg_len=int(seg_len), path=None,
        ))
    return out


def pack_results(bounds: dict, paths, n_states: int):
    """Device-side: bounds dict + (B, T) int paths -> (B, bytes) uint8.

    Jit-traceable; keeps the whole batch result in one D2H transfer.
    """
    import jax
    import jax.numpy as jnp

    meta = pack_meta(bounds)
    meta_u8 = jax.lax.bitcast_convert_type(meta, jnp.uint8).reshape(meta.shape[0], -1)
    if path_itemsize(n_states) == 1:
        path_u8 = paths.astype(jnp.uint8)
    else:
        path_u8 = jax.lax.bitcast_convert_type(
            paths.astype(jnp.uint16), jnp.uint8).reshape(paths.shape[0], -1)
    return jnp.concatenate([meta_u8, path_u8], axis=1)


@dataclass
class ReadResult:
    """Decoded per-read row of a packed batch."""

    ok: bool
    score_prefix: float  # per-sample (span-normalized) scores
    score_suffix: float
    prefix_begin: int
    prefix_end: int
    suffix_begin: int
    suffix_end: int
    seg_len: int
    path: np.ndarray | None  # int32 Viterbi path, None when gated out


def unpack_results(packed: np.ndarray, n_states: int) -> list[ReadResult]:
    """Host-side inverse of :func:`pack_results` (numpy, zero-copy views)."""
    meta = packed[:, :META_BYTES].copy().view(np.float32)
    raw_paths = packed[:, META_BYTES:]
    if path_itemsize(n_states) == 2:
        raw_paths = raw_paths.view(np.uint16)
    out = []
    for i in range(packed.shape[0]):
        (score_p, span_p, score_s, span_s,
         pb, pe, sb, se, okf, seg_len) = meta[i]
        span_p, span_s = int(span_p), int(span_s)
        ok = bool(okf)
        out.append(ReadResult(
            ok=ok,
            score_prefix=float(score_p) / span_p if span_p > 0 else 0.0,
            score_suffix=float(score_s) / span_s if span_s > 0 else 0.0,
            prefix_begin=int(pb), prefix_end=int(pe),
            suffix_begin=int(sb), suffix_end=int(se),
            seg_len=int(seg_len),
            path=raw_paths[i].astype(np.int32) if ok else None,
        ))
    return out
