"""Golden-read count sensitivity to sub-percent normalization perturbations.

Question: is the count-735-vs-733 gap on the golden read explainable by
the same 2019-era preprocessing stack differences that shift the
alignment scores by +0.7-0.9% (PARITY.md item 1)?  If scaling the
normalized Viterbi segment by a fraction of a percent moves the count by
+-2 units, the answer is yes and the parity item is closed by
documentation; if the count is rock-stable under such perturbations, the
gap must be model semantics (pomegranate bake artifact).

Usage: JAX_PLATFORMS=cpu python tools/golden_sensitivity.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from strique_tpu.detect.counter import RepeatCounter
from strique_tpu.io.fast5 import Fast5Index, index as f5_index
from strique_tpu.utils.config import parse_config
from strique_tpu.ops import viterbi as viterbi_ops

DATA = "/root/reference/data"
MODEL = "/root/reference/models/r9_4_450bps.model"
REPEAT_TSV = "/root/reference/configs/repeat_config.tsv"
PARAMS_JSON = "/root/reference/configs/STRique.json"
READ_ID = "ce47b364-ed6e-4409-808a-1041c0b5aac2"


def main():
    cfg = parse_config(REPEAT_TSV, PARAMS_JSON)
    _, _, _, rep, pre_seq, suf_seq = cfg["repeat"]["c9orf72"]
    rc = RepeatCounter(MODEL, align_config=cfg["align"], hmm_config=cfg["HMM"])
    rc.add_target("c9orf72", rep, pre_seq, suf_seq)

    import tempfile, shutil
    with tempfile.TemporaryDirectory() as d:
        shutil.copy(os.path.join(DATA, "c9orf72.fast5"), d)
        idx_lines = list(f5_index(d))
        fofn = os.path.join(d, "reads.fofn")
        with open(fofn, "w") as f:
            f.write("\n".join(idx_lines) + "\n")
        raw = Fast5Index(fofn).get_raw(READ_ID).astype(np.float64)

    state = rc.detect_submit("c9orf72", [raw], "-")
    # force the two-phase path bounds by reusing finish, then recompute
    res = rc.detect_finish(state)
    n0, sp, ss, logp0, offset, ticks, _ = res[0]
    print(f"base: count={n0} log_p={logp0:.2f} offset={offset} ticks={ticks}")

    # reconstruct flt + bounds exactly as detect does (single decoder:
    # counter.decode_bounds owns both packed layouts)
    tc = rc.targets["c9orf72"][1]  # minus strand
    flt = state["flts"][0]
    rc2 = RepeatCounter(MODEL, align_config=cfg["align"], hmm_config=cfg["HMM"])
    rc2.fused = False
    rc2.add_target("c9orf72", rep, pre_seq, suf_seq)
    st2 = rc2.detect_submit("c9orf72", [raw], "-")
    bounds, _, _ = rc2.decode_bounds(st2)
    _, _, _, pb, pe, sb, se = bounds[0]
    print(f"bounds: pb={pb} pe={pe} sb={sb} se={se} seg_len={se-pb}")

    seg = flt[pb:se].astype(np.float64)
    med = np.median(seg)
    chm = tc.repeat_hmm

    print("\nscale perturbations (seg' = med + (seg-med)*(1+eps)):")
    for eps in (-0.01, -0.005, -0.0025, 0.0, 0.0025, 0.005, 0.01):
        pert = (med + (seg - med) * (1.0 + eps)).astype(np.float32)
        path = rc2._viterbi_batch(chm, [pert])[0]
        n = viterbi_ops.count_repeats(path, len(pert), chm)
        lp = viterbi_ops.path_logp_f64(pert.astype(np.float64), path, chm)
        print(f"  eps={eps:+.4f}: count={n}  log_p={lp:.2f}  d_logp={lp-logp0:+.2f}")

    print("\nshift perturbations (seg' = seg + delta, pA):")
    for delta in (-0.5, -0.25, 0.0, 0.25, 0.5):
        pert = (seg + delta).astype(np.float32)
        path = rc2._viterbi_batch(chm, [pert])[0]
        n = viterbi_ops.count_repeats(path, len(pert), chm)
        print(f"  delta={delta:+.2f}: count={n}")


if __name__ == "__main__":
    main()
