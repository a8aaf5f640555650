"""Golden-read preprocessing vs the reference's own source code.

tools/golden_prep_diff.py imports /root/reference/scripts/STRique.py
(pomegranate/pyseqan/skimage stubbed) and runs its literal preprocessing
statements on the golden read.  Every float32 tensor our pipeline feeds
the device kernels must be bitwise identical to what the reference
source produces under the installed library versions — the strongest
obtainable statement that the residual golden deviations (PARITY.md) do
not originate in this reimplementation.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_preprocessing_matches_reference_source():
    pytest.importorskip("scipy")
    import golden_prep_diff

    assert golden_prep_diff.main() == 0
