"""On-TPU kernel parity tier: compiled Mosaic kernels on the real chip.

The default CPU tier runs the Pallas kernels in interpreter mode, which
pins the math but not the Mosaic compilation/numerics.  These tests run
the COMPILED kernels on real TPU hardware and assert parity against the
XLA scan kernels on the same device:

    STRIQUE_TEST_TPU=1 python -m pytest tests/ -m tpu -q

Red on any Mosaic numerics or layout regression.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from strique_tpu.ops.reference import AlignParams

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs a real TPU backend"),
]

MODEL = "/root/reference/models/r9_4_450bps.model"


@pytest.fixture(scope="module")
def c9_assets():
    from strique_tpu.hmm.models import build_flanked_repeat
    from strique_tpu.pore_model import PoreModel

    pm = PoreModel(MODEL)
    row = open("/root/reference/configs/repeat_config.tsv").read().strip().split("\n")[1].split()
    repeat, prefix, suffix = row[4], row[5], row[6]
    chm = build_flanked_repeat(repeat, prefix[-50:], suffix[:50], pm)
    return pm, chm, repeat, prefix, suffix


def test_align_pallas_on_chip_matches_scan():
    from strique_tpu.ops.align import align_batch

    rng = np.random.default_rng(0)
    B, N, M = 8, 2048, 40
    p = AlignParams()
    template = rng.uniform(60, 120, M).astype(np.float32)
    signals = rng.uniform(60, 120, (B, N)).astype(np.float32)
    for i in range(4):
        st = 200 + i * 60
        signals[i, st : st + M] = template + rng.normal(0, 0.5, M)
    na = rng.integers(N - 600, N - 100, B).astype(np.int32)
    ref = align_batch(signals, na, template, p, impl="xla")
    got = align_batch(signals, na, template, p, impl="pallas")
    np.testing.assert_allclose(np.asarray(ref["score"]), np.asarray(got["score"]), atol=1e-2)
    np.testing.assert_array_equal(np.asarray(ref["j_end"]), np.asarray(got["j_end"]))
    np.testing.assert_array_equal(np.asarray(ref["is_gap"]), np.asarray(got["is_gap"]))
    np.testing.assert_array_equal(np.asarray(ref["jpos"]), np.asarray(got["jpos"]))


def test_viterbi_pallas_on_chip_real_hmm(c9_assets):
    """Compiled-Mosaic vs XLA-scan parity for BOTH Viterbi forwards.

    Exactness pairs kernels running the same arithmetic: the factored
    Pallas forward against the factored scan (bit-identical claim), and
    the dense Pallas forward against the dense scan.  Counts must agree
    across all four decoders.
    """
    from strique_tpu.ops import viterbi as V
    from strique_tpu.ops.viterbi_pallas import CHUNK_T, PaddedHMM, viterbi_pallas_batch

    pm, chm, repeat, prefix, suffix = c9_assets
    ph = PaddedHMM(chm)
    assert ph.fspec is not None
    seq = prefix[-50:] + repeat * 12 + suffix[:50]
    sig = pm.generate_signal(seq, samples=6).astype(np.float32)
    T = len(sig)
    tpad = (T + CHUNK_T - 1) // CHUNK_T * CHUNK_T
    obs = np.zeros((2, tpad), np.float32)
    obs[0, :T] = sig
    obs[1, : T - 48] = sig[:-48]
    lens = np.array([T, T - 48], np.int32)
    dev = (jnp.asarray(chm.log_start, jnp.float32),
           jnp.asarray(np.maximum(chm.log_trans, V.NEG), jnp.float32),
           jnp.asarray(chm.log_end, jnp.float32), jnp.asarray(chm.mu, jnp.float32),
           jnp.asarray(chm.sigma, jnp.float32), jnp.asarray(chm.is_uniform),
           jnp.asarray(chm.log_uni, jnp.float32))

    # factored Mosaic forward vs factored scan: bit-identical paths
    logps_f, paths_f = viterbi_pallas_batch(jnp.asarray(obs), jnp.asarray(lens), ph)
    spec, weights = V.stage_factored(chm.factored)
    weights = tuple(map(jnp.asarray, weights))
    logps_fs, paths_fs = V.viterbi_scan_factored_batch(
        jnp.asarray(obs), jnp.asarray(lens), dev, spec, weights)

    # dense Mosaic forward vs dense scan
    ph_dense = PaddedHMM(chm)
    ph_dense.fspec = None
    logps_d, paths_d = viterbi_pallas_batch(jnp.asarray(obs), jnp.asarray(lens), ph_dense)

    for k in range(2):
        t = int(lens[k])
        np.testing.assert_array_equal(np.asarray(paths_f[k])[:t],
                                      np.asarray(paths_fs[k])[:t],
                                      err_msg=f"factored pallas vs scan, read {k}")
        assert np.isclose(float(logps_f[k]), float(logps_fs[k]), rtol=1e-5)
        lp_ref, p_ref = V.viterbi_scan(jnp.asarray(obs[k]), jnp.int32(lens[k]), *dev)
        np.testing.assert_array_equal(np.asarray(paths_d[k])[:t],
                                      np.asarray(p_ref)[:t],
                                      err_msg=f"dense pallas vs scan, read {k}")
        assert np.isclose(float(logps_d[k]), float(lp_ref), rtol=1e-4)
        counts = {V.count_repeats(np.asarray(p)[:t], t, chm)
                  for p in (paths_f[k], paths_fs[k], paths_d[k], p_ref)}
        assert len(counts) == 1, f"count disagreement on read {k}: {counts}"

    assert V.count_repeats(np.asarray(paths_f[0]), int(lens[0]), chm) == 12


def test_split_fused_two_phase_on_chip(c9_assets):
    """The split pipeline (default), the fused single-D2H tail and the
    two-phase host-bounds path must produce identical detection rows on
    the compiled chip kernels."""
    from strique_tpu.detect.counter import RepeatCounter

    pm, chm, repeat, prefix, suffix = c9_assets
    rng = np.random.default_rng(5)
    backbone = "".join(rng.choice(list("ACTG"), 600))
    sigs = []
    expected = []
    for n_rep in (7, 12, 19, 26):
        seq = backbone[:300] + prefix + repeat * n_rep + suffix + backbone[-300:]
        sigs.append(pm.generate_signal(seq, samples=8, noise=True, rng=rng))
        expected.append(n_rep)

    split = RepeatCounter(MODEL)
    split.add_target("c9", repeat, prefix, suffix)
    assert split.split
    res_split = split.detect_many("c9", sigs, "+")

    fused = RepeatCounter(MODEL)
    fused.split = False
    fused.add_target("c9", repeat, prefix, suffix)
    assert fused.fused
    res_fused = fused.detect_many("c9", sigs, "+")

    two_phase = RepeatCounter(MODEL)
    two_phase.fused = False
    two_phase.add_target("c9", repeat, prefix, suffix)
    res_two = two_phase.detect_many("c9", sigs, "+")

    for e, rs, rf, rt in zip(expected, res_split, res_fused, res_two):
        assert rs == rf, f"split row != fused row: {rs} vs {rf}"
        assert rf[0] == e, f"fused count {rf[0]} != {e}"
        assert rt[0] == e
        assert rf[4:6] == rt[4:6]  # offset/ticks
        assert abs(rf[1] - rt[1]) < 1e-4 and abs(rf[2] - rt[2]) < 1e-4
        assert np.isclose(rf[3], rt[3], rtol=1e-6)


def test_modification_on_chip(c9_assets):
    """5mC calling on the compiled chip kernels: the mod HMM factorizes to
    diagonals only (no silent chains), so this pins the diag-only factored
    variant's Mosaic numerics; canonical vs mCpG-generated reads must
    separate cleanly with exact counts."""
    from strique_tpu.detect.counter import RepeatCounter
    from strique_tpu.pore_model import PoreModel

    pm, chm, repeat, prefix, suffix = c9_assets
    mod_file = "/root/reference/models/r9_4_450bps_mCpG.model"
    pm_mod = PoreModel(mod_file)
    counter = RepeatCounter(MODEL, mod_model_file=mod_file)
    counter.add_target("c9", repeat, prefix, suffix)
    rng = np.random.default_rng(3)
    backbone = "".join(rng.choice(list("ACTG"), 400))
    n_rep = 14
    seq = backbone[:200] + prefix + repeat * n_rep + suffix + backbone[-200:]
    sigs = [pm.generate_signal(seq, samples=8, noise=True, rng=rng),
            pm_mod.generate_signal(seq, samples=8, noise=True, rng=rng)]
    res = counter.detect_many("c9", sigs, "+")
    for r, kind in zip(res, ("canonical", "mod")):
        assert r[0] == n_rep, f"{kind}: count {r[0]} != {n_rep}"
        assert r[6] not in ("-", ""), f"{kind}: no mod pattern"
    rate_can = res[0][6].count("1") / len(res[0][6])
    rate_mod = res[1][6].count("1") / len(res[1][6])
    assert rate_can < 0.3 and rate_mod > 0.7, (rate_can, rate_mod)


def test_counts_exact_on_chip(c9_assets):
    """End-to-end exactness on the production TPU path (Pallas align +
    Pallas Viterbi + fused tail), both strands."""
    from strique_tpu.detect.counter import RepeatCounter, reverse_complement

    pm, chm, repeat, prefix, suffix = c9_assets
    counter = RepeatCounter(MODEL)
    counter.add_target("c9", repeat, prefix, suffix)
    rng = np.random.default_rng(11)
    backbone = "".join(rng.choice(list("ACTG"), 500))
    for strand in "+-":
        sigs, expected = [], []
        for n_rep in (9, 15, 22):
            seq = backbone[:250] + prefix + repeat * n_rep + suffix + backbone[-250:]
            if strand == "-":
                seq = reverse_complement(seq)
            sigs.append(pm.generate_signal(seq, samples=8))
            expected.append(n_rep)
        got = [r[0] for r in counter.detect_many("c9", sigs, strand)]
        assert got == expected, f"strand {strand}: {got} != {expected}"


def test_align_wave_on_chip_matches_column():
    """Compiled wavefront vs column kernel on the real chip: the value
    streams are identical by construction (the wave carries the column
    cummax as a running lane max); this pins the Mosaic lowering of
    both against each other and the XLA scan."""
    from strique_tpu.ops.align import align_batch

    rng = np.random.default_rng(21)
    B, N, M = 8, 2048, 60
    p = AlignParams()
    template = rng.uniform(60, 120, M).astype(np.float32)
    signals = rng.uniform(60, 120, (B, N)).astype(np.float32)
    for i in range(B):
        st = 100 + i * 120
        signals[i, st : st + M] = template + rng.normal(0, 0.5, M)
    na = rng.integers(N - 600, N - 100, B).astype(np.int32)
    col = align_batch(signals, na, template, p, impl="pallas_col")
    wave = align_batch(signals, na, template, p, impl="pallas_wave")
    xla = align_batch(signals, na, template, p, impl="xla")
    for k in ("score", "j_end", "is_gap", "jpos", "j_begin"):
        np.testing.assert_array_equal(np.asarray(col[k]), np.asarray(wave[k]),
                                      err_msg=f"{k} col vs wave")
    np.testing.assert_array_equal(np.asarray(xla["jpos"]), np.asarray(wave["jpos"]))
    np.testing.assert_allclose(np.asarray(xla["score"]), np.asarray(wave["score"]),
                               atol=1e-2)


def test_ultralong_two_pass_count_exact(c9_assets, monkeypatch):
    """A ~4M-sample read must count exactly within a 3.5 GB pointer
    budget: the one-pass plane would need ~14 GB, so the counter's align
    routes through the checkpointed two-pass (pass-1 score-only forward
    + windowed pointer recompute).  The reference's full-matrix SeqAn DP
    (src/align_raw.h:117-158) exhausts RAM at this scale."""
    from strique_tpu.detect.counter import RepeatCounter

    pm, chm, repeat, prefix, suffix = c9_assets
    monkeypatch.setenv("STRIQUE_PTR_BUDGET_GB", "3.5")
    counter = RepeatCounter(MODEL)
    counter.add_target("c9", repeat, prefix, suffix)
    rng = np.random.default_rng(3)
    n_rep = 100
    # locus embedded in a backbone long enough for a ~4M-sample signal
    bb = "".join(rng.choice(list("ACTG"), 540_000))
    seq = bb[:270_000] + prefix + repeat * n_rep + suffix + bb[270_000:]
    sig = pm.generate_signal(seq, samples=9, noise=True, rng=rng)
    assert len(sig) >= 3_900_000, len(sig)
    out = counter.detect("c9", sig, "+")
    assert out[0] == n_rep, out
    assert out[1] > 4.0 and out[2] > 4.0  # QC-grade flank scores


def test_golden_cli_on_chip(tmp_path):
    """The full index+count CLI flow on the real chip must reproduce the
    PARITY.md golden row for the bundled read (reference
    docs/installation/test.md:16): count 733 in default semantics,
    offset 1633, ticks 40758 — hardware regressions in the end-to-end
    path go red here, not just kernel parity."""
    import subprocess
    import sys

    idx = tmp_path / "reads.fofn"
    env = dict(__import__("os").environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strique_tpu_cache")
    r = subprocess.run(
        [sys.executable, "-m", "strique_tpu.cli", "index", "/root/reference/data",
         "--out_prefix", "/root/reference/data"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    idx.write_text(r.stdout)
    r = subprocess.run(
        [sys.executable, "-m", "strique_tpu.cli", "count", str(idx), MODEL,
         "/root/reference/configs/repeat_config.tsv",
         "--algn", "/root/reference/data/c9orf72.sam",
         "--config", "/root/reference/configs/STRique.json"],
        capture_output=True, text=True, env=env, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [l.split("\t") for l in r.stdout.strip().split("\n")[1:]]
    row = next(x for x in rows if x[0].startswith("ce47b364"))
    assert row[1] == "c9orf72" and row[2] == "-"
    assert int(row[3]) == 733          # PARITY.md default-mode count
    assert int(row[7]) == 1633         # offset: exact vs reference
    assert int(row[8]) == 40758        # ticks: exact vs reference
    assert abs(float(row[4]) - 6.3156) < 0.1


def test_golden_cli_mod_on_chip(tmp_path):
    """The reference CI's exact command — golden count WITH --mod_model
    (reference .travis.yml:99-102) — on the real chip, pinning the full
    row including the mod column (734 units, 70 methylated; see
    tests/test_golden.py for the CPU-tier pin in both semantics)."""
    import subprocess
    import sys

    idx = tmp_path / "reads.fofn"
    env = dict(__import__("os").environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strique_tpu_cache")
    r = subprocess.run(
        [sys.executable, "-m", "strique_tpu.cli", "index", "/root/reference/data",
         "--out_prefix", "/root/reference/data"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    idx.write_text(r.stdout)
    r = subprocess.run(
        [sys.executable, "-m", "strique_tpu.cli", "count", str(idx), MODEL,
         "/root/reference/configs/repeat_config.tsv",
         "--algn", "/root/reference/data/c9orf72.sam",
         "--config", "/root/reference/configs/STRique.json",
         "--mod_model", "/root/reference/models/r9_4_450bps_mCpG.model"],
        capture_output=True, text=True, env=env, timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [l.split("\t") for l in r.stdout.strip().split("\n")[1:]]
    row = next(x for x in rows if x[0].startswith("ce47b364"))
    assert int(row[3]) == 733 and int(row[7]) == 1633 and int(row[8]) == 40758
    mod = row[9]
    assert set(mod) <= {"0", "1"} and len(mod) == 734 and mod.count("1") == 70
