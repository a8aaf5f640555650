"""Test pomegranate-compat hypotheses on the golden read.

H1: dummy-state emission +ln(10) per visit (uniform width w/10).
H2: dummy-state out-transitions +ln(10) (renormalization artifact).
H2b: only the loop-back edges d->s get +ln(10) (exit edge untouched).

Success criterion: count == 735 AND recomputed log_p (in the hypothesis
model) == -119860.52 +- ~0.5.

Usage: JAX_PLATFORMS=cpu python tools/golden_compat.py
"""
import dataclasses
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
GOLD_LOGP = -119860.52066647023
LN10 = np.log(10.0)


def main():
    cfg = parse_config(REPEAT_TSV, PARAMS_JSON)
    _, _, _, rep, pre_seq, suf_seq = cfg["repeat"]["c9orf72"]
    rc = RepeatCounter(MODEL, align_config=cfg["align"], hmm_config=cfg["HMM"])
    rc.fused = False
    rc.add_target("c9orf72", rep, pre_seq, suf_seq)

    import tempfile, shutil
    with tempfile.TemporaryDirectory() as d:
        shutil.copy(os.path.join(DATA, "c9orf72.fast5"), d)
        fofn = os.path.join(d, "reads.fofn")
        with open(fofn, "w") as f:
            f.write("\n".join(f5_index(d)) + "\n")
        raw = Fast5Index(fofn).get_raw(READ_ID).astype(np.float64)

    state = rc.detect_submit("c9orf72", [raw], "-")
    tc = state["tc"]
    flt = state["flts"][0]

    bounds, _, _ = rc.decode_bounds(state)
    _, _, _, pb, _, _, se = bounds[0]
    seg = flt[pb:se].astype(np.float32)

    chm = tc.repeat_hmm
    dummies = chm.meta["count_states"]
    print(f"seg_len={len(seg)} dummies at {np.where(dummies)[0]}")

    def run(chm_h, label):
        path = rc._viterbi_batch(chm_h, [seg])[0]
        n = viterbi_ops.count_repeats(path, len(seg), chm_h)
        lp = viterbi_ops.path_logp_f64(seg.astype(np.float64), path, chm_h)
        print(f"{label}: count={n}  log_p={lp:.3f}  vs_gold={lp - GOLD_LOGP:+.3f}")

    run(chm, "literal      ")

    h1 = dataclasses.replace(chm, log_uni=np.where(dummies, chm.log_uni + LN10, chm.log_uni))
    run(h1, "H1 emit+ln10 ")

    lt = chm.log_trans.copy()
    lt[dummies, :] += LN10
    le = chm.log_end.copy()
    le[dummies] += LN10
    h2 = dataclasses.replace(chm, log_trans=lt, log_end=le)
    run(h2, "H2 trans+ln10")

    # H2b: only loop-back rows into repeat entry states (exclude exits to
    # suffix states): bonus on edges d -> state whose name starts 'repeat'
    names = np.array(chm.names)
    into_repeat = np.array([n.startswith("repeat") and "dummy" not in n for n in names])
    lt2 = chm.log_trans.copy()
    lt2[np.ix_(dummies, into_repeat)] += LN10
    h2b = dataclasses.replace(chm, log_trans=lt2)
    run(h2b, "H2b loop+ln10")


if __name__ == "__main__":
    main()
