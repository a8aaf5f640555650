"""Per-target repeat detection engine.

TPU-first equivalent of the reference ``repeatCounter``
(reference scripts/STRique.py:505-618): host-side preprocessing
(median filter, morphology, normalization scalars — exact float64
NumPy), device-side DP kernels (flank alignment + HMM Viterbi) over
padded, bucketed tensors so every shape is static under jit.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..hmm.models import build_flanked_repeat, build_repeat_mod
from ..ops import align as align_ops
from ..ops import signal as signal_ops
from ..ops import viterbi as viterbi_ops
from ..ops.reference import AlignParams
from ..pore_model import PoreModel, mean_abs_dev

DEFAULT_ALIGN_CONFIG = {
    # reference scripts/STRique.py:507-513
    "dist_offset": 16.0,
    "dist_min": 0.0,
    "gap_open_h": -1.0,
    "gap_open_v": -16.0,
    "gap_extension_h": -1.0,
    "gap_extension_v": -16.0,
    "samples": 6,
}

_COMPLEMENT = str.maketrans("ACGT", "TGCA")


def reverse_complement(sequence: str) -> str:
    return sequence.upper().translate(_COMPLEMENT)[::-1]


def pad_bucket(n: int, minimum: int = 2048) -> int:
    """Static-shape bucket for a dynamic length: {1, 1.25, 1.5, 1.75} x 2^k grid."""
    n = max(int(n), minimum)
    k = int(np.floor(np.log2(n)))
    base = 1 << k
    for frac in (1.0, 1.25, 1.5, 1.75, 2.0):
        if n <= base * frac:
            return int(base * frac)
    return base * 2


@dataclass
class TargetClassifier:
    """Per-strand detection assets (reference STRique.py:532, 561-575)."""

    prefix: np.ndarray  # core flank template signals
    suffix: np.ndarray
    prefix_ext: np.ndarray  # extended flank template signals
    suffix_ext: np.ndarray
    repeat_hmm: object  # CompiledHMM
    mod_hmm: object | None


class RepeatCounter:
    def __init__(self, model_file: str, mod_model_file: str | None = None,
                 align_config: dict | None = None, hmm_config: dict | None = None):
        cfg = dict(DEFAULT_ALIGN_CONFIG)
        if align_config:
            cfg.update(align_config)
        self.align_params = AlignParams(
            dist_offset=cfg["dist_offset"], dist_min=cfg["dist_min"],
            gap_open_h=cfg["gap_open_h"], gap_open_v=cfg["gap_open_v"],
            gap_extension_h=cfg["gap_extension_h"], gap_extension_v=cfg["gap_extension_v"],
        )
        self.samples = int(cfg["samples"])
        self.pm = PoreModel(model_file)
        self.pm_mod = PoreModel(mod_model_file) if mod_model_file else self.pm
        self.has_mod = mod_model_file is not None
        self.hmm_config = hmm_config
        self.targets: dict[str, tuple[TargetClassifier, TargetClassifier]] = {}
        self._dev_cache: dict[int, tuple] = {}

    # -- model construction ------------------------------------------------
    def add_target(self, target_name: str, repeat: str, prefix: str, suffix: str) -> None:
        """Build flank templates + HMMs for both strands (reference :553-579)."""
        if target_name in self.targets:
            raise ValueError(f"target {target_name!r} already defined")
        prefix_ext = prefix.upper()
        prefix = prefix[-50:].upper()
        suffix_ext = suffix.upper()
        suffix = suffix[:50].upper()
        repeat = repeat.upper()
        gen = lambda seq: self.pm.generate_signal(seq, samples=self.samples).astype(np.float32)
        tc_plus = TargetClassifier(
            gen(prefix), gen(suffix), gen(prefix_ext), gen(suffix_ext),
            build_flanked_repeat(repeat, prefix, suffix, self.pm, self.hmm_config),
            build_repeat_mod(repeat, self.pm, self.pm_mod, self.hmm_config) if self.has_mod else None,
        )
        rc = reverse_complement
        tc_minus = TargetClassifier(
            gen(rc(suffix)), gen(rc(prefix)), gen(rc(suffix_ext)), gen(rc(prefix_ext)),
            build_flanked_repeat(rc(repeat), rc(suffix), rc(prefix), self.pm, self.hmm_config),
            build_repeat_mod(rc(repeat), self.pm, self.pm_mod, self.hmm_config) if self.has_mod else None,
        )
        self.targets[target_name] = (tc_plus, tc_minus)

    def _device_hmm(self, chm):
        """Cache float32 device tensors for a compiled HMM."""
        import jax.numpy as jnp

        key = id(chm)
        if key not in self._dev_cache:
            self._dev_cache[key] = (
                jnp.asarray(chm.log_start, jnp.float32),
                jnp.asarray(chm.log_trans, jnp.float32),
                jnp.asarray(chm.log_end, jnp.float32),
                jnp.asarray(chm.mu, jnp.float32),
                jnp.asarray(chm.sigma, jnp.float32),
                jnp.asarray(chm.is_uniform),
                jnp.asarray(chm.log_uni, jnp.float32),
            )
        return self._dev_cache[key]

    # -- detection ---------------------------------------------------------
    def _viterbi(self, chm, segment: np.ndarray):
        t = len(segment)
        tpad = pad_bucket(t)
        obs = np.zeros(tpad, dtype=np.float32)
        obs[:t] = segment
        import jax.numpy as jnp

        dev = self._device_hmm(chm)
        logp, path = viterbi_ops.viterbi_scan(jnp.asarray(obs), jnp.int32(t), *dev)
        return float(logp), np.asarray(path)

    def detect(self, target_name: str, raw_signal: np.ndarray, strand: str):
        """Count repeats in one read (reference ``repeatCounter.detect`` :581-616).

        Returns (n, score_prefix, score_suffix, log_p, offset, ticks, mod).
        """
        tc_plus, tc_minus = self.targets[target_name]
        if strand == "+":
            tc = tc_plus
        elif strand == "-":
            tc = tc_minus
        else:
            raise ValueError("strand must be + or -")
        raw_signal = np.asarray(raw_signal, dtype=np.float64)
        n_sig = len(raw_signal)
        flt = signal_ops.medfilt3(raw_signal)
        morph = signal_ops.quantize_morph_np(flt, float(np.median(flt)), mean_abs_dev(flt))
        morph = signal_ops.open_close_np(morph)
        morph_n = self.pm.normalize2model(morph, mode="minmax")
        flt_n = self.pm.normalize2model(flt, mode="minmax")

        npad = pad_bucket(n_sig)
        morph_pad = np.zeros(npad, dtype=np.float32)
        morph_pad[:n_sig] = morph_n
        trim_prefix = len(tc.prefix_ext) - len(tc.prefix)
        trim_suffix = len(tc.suffix_ext) - len(tc.suffix)
        score_prefix, prefix_begin, prefix_end = align_ops.detect_range(
            morph_pad, n_sig, tc.prefix_ext, self.align_params, pre_trim=trim_prefix)
        score_suffix, suffix_begin, suffix_end = align_ops.detect_range(
            morph_pad, n_sig, tc.suffix_ext, self.align_params, post_trim=trim_suffix)

        n = 0
        p = 0.0
        mod = "-"
        if prefix_begin < suffix_end and score_prefix > 0.0 and score_suffix > 0.0:
            segment = flt_n[prefix_begin:suffix_end].astype(np.float32)
            _, path = self._viterbi(tc.repeat_hmm, segment)
            n = viterbi_ops.count_repeats(path, len(segment), tc.repeat_hmm)
            p = viterbi_ops.path_logp_f64(segment, path, tc.repeat_hmm)
            if self.has_mod and tc.mod_hmm is not None:
                nrm = self.pm.normalize2model(raw_signal, mode="minmax")
                mask = viterbi_ops.repeat_sample_mask(path, len(segment), tc.repeat_hmm)
                rep_signal = nrm[prefix_begin:suffix_end][mask]
                if len(rep_signal):
                    mm = tc.mod_hmm.meta
                    rep_signal = np.clip(rep_signal, mm["model_min"], mm["model_max"])
                    _, mpath = self._viterbi(tc.mod_hmm, rep_signal.astype(np.float32))
                    mod = viterbi_ops.mod_pattern(mpath, len(rep_signal), tc.mod_hmm)
        return n, score_prefix, score_suffix, p, prefix_end, max(suffix_begin - prefix_end, 0), mod
