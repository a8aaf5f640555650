"""Preprocessing constants shared by the host preprocessing backends.

The per-read preprocessing chain (reference scripts/STRique.py:590-597:
median filter, uint8 quantization, greyscale open/close, minmax
normalization) runs on the HOST — native C++ single pass when a compiler
is available (native/strique_native.cpp), float64 NumPy otherwise — and
ships to the device byte-packed (flt f32 + morph u8 with a 256-entry
level table, detect/counter.py).

A fully device-side implementation was built and evaluated in round 1
and intentionally NOT shipped: the flt channel feeds the Viterbi count
and the f64 log-p parity contract, and float32 tail-median statistics on
device can flip quantization/argmax boundaries against the reference's
float64 semantics — while the H2D it would save (flt's 4 bytes/sample)
is already mostly hidden by the depth-2 submit/finish pipeline.  The
decision is recorded here so the alternative isn't re-derived from
scratch; see NOTES.md "Device-side preprocessing".
"""
from __future__ import annotations


def model_const(pm) -> tuple:
    """Static normalization constants of a PoreModel, hashable for jit
    closures and the native preprocessing ABI: (m5_mod, m95_mod,
    clip_lo, clip_hi) — the model-side tail medians of the minmax
    mapping (reference scripts/STRique.py:152-160) and the model clip
    range (reference :178-179)."""
    return (pm._m5_mod, pm._m95_mod, pm.model_min + 0.5, pm.model_max - 0.5)
