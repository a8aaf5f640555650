"""Pallas kernel parity vs the XLA scan kernels (interpreter mode on CPU).

The same kernels run compiled on TPU; these tests pin the math. TPU
execution parity is exercised by bench.py on real hardware.
"""
import numpy as np
import pytest

from strique_tpu.ops.reference import AlignParams


def test_align_pallas_matches_scan():
    import jax.numpy as jnp

    from strique_tpu.ops.align import align_batch

    rng = np.random.default_rng(0)
    B, N, M = 8, 512, 40
    p = AlignParams()
    template = rng.uniform(60, 120, M).astype(np.float32)
    signals = rng.uniform(60, 120, (B, N)).astype(np.float32)
    for i in range(4):
        st = 50 + i * 60
        signals[i, st : st + M] = template + rng.normal(0, 0.5, M)
    na = rng.integers(300, 500, B).astype(np.int32)
    ref = align_batch(signals, na, template, p, impl="xla")
    got = align_batch(signals, na, template, p, impl="pallas")
    np.testing.assert_allclose(np.asarray(ref["score"]), np.asarray(got["score"]), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(ref["j_end"]), np.asarray(got["j_end"]))
    np.testing.assert_array_equal(np.asarray(ref["is_gap"]), np.asarray(got["is_gap"]))
    np.testing.assert_array_equal(np.asarray(ref["jpos"]), np.asarray(got["jpos"]))


def test_align_pallas_affine_params():
    from strique_tpu.ops.align import align_batch

    rng = np.random.default_rng(1)
    p = AlignParams(gap_open_h=-3.0, gap_extension_h=-0.5, gap_open_v=-20.0, gap_extension_v=-4.0)
    B, N, M = 8, 256, 24
    template = rng.uniform(60, 120, M).astype(np.float32)
    signals = rng.uniform(60, 120, (B, N)).astype(np.float32)
    na = np.full(B, N - 10, np.int32)
    ref = align_batch(signals, na, template, p, impl="xla")
    got = align_batch(signals, na, template, p, impl="pallas")
    np.testing.assert_allclose(np.asarray(ref["score"]), np.asarray(got["score"]), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(ref["jpos"]), np.asarray(got["jpos"]))


def test_viterbi_pallas_matches_scan():
    import jax.numpy as jnp

    from strique_tpu.hmm.graph import CompiledHMM
    from strique_tpu.ops.viterbi import viterbi_scan
    from strique_tpu.ops.viterbi_pallas import PaddedHMM, viterbi_pallas
    from tests.test_viterbi import random_hmm

    rng = np.random.default_rng(2)
    S, T, Tpad = 24, 400, 512
    for trial in range(2):
        hmm = random_hmm(rng, S)
        chm = CompiledHMM(names=[str(i) for i in range(S)], log_start=hmm[0], log_trans=hmm[1],
                          log_end=hmm[2], mu=hmm[3], sigma=hmm[4], is_uniform=hmm[5], log_uni=hmm[6])
        ph = PaddedHMM(chm)
        obs = np.zeros(Tpad, np.float32)
        obs[:T] = rng.uniform(60, 120, T)
        dev = [jnp.asarray(x, jnp.float32) if x.dtype != bool else jnp.asarray(x) for x in hmm]
        lp_ref, p_ref = viterbi_scan(jnp.asarray(obs), jnp.int32(T), *dev)
        lp, path = viterbi_pallas(jnp.asarray(obs), jnp.int32(T), ph)
        assert np.isclose(float(lp), float(lp_ref), rtol=1e-4), f"trial {trial}"
        np.testing.assert_array_equal(np.asarray(path)[:T], np.asarray(p_ref)[:T])


def test_viterbi_pallas_real_hmm():
    """Kernel parity on the real c9orf72 flanked HMM (uniform states,
    -inf structure, silent-eliminated long-range edges)."""
    import jax.numpy as jnp

    from strique_tpu.hmm.models import build_flanked_repeat
    from strique_tpu.ops.viterbi import viterbi_scan
    from strique_tpu.ops.viterbi_pallas import PaddedHMM, viterbi_pallas_batch
    from strique_tpu.pore_model import PoreModel

    pm = PoreModel("/root/reference/models/r9_4_450bps.model")
    row = open("/root/reference/configs/repeat_config.tsv").read().strip().split("\n")[1].split()
    repeat, prefix, suffix = row[4], row[5][-50:], row[6][:50]
    chm = build_flanked_repeat(repeat, prefix, suffix, pm)
    ph = PaddedHMM(chm)
    seq = prefix + repeat * 8 + suffix
    sig = pm.generate_signal(seq, samples=6).astype(np.float32)
    T = len(sig)
    tpad = 1024
    obs = np.zeros((2, tpad), np.float32)
    obs[0, :T] = sig
    obs[1, : T - 40] = sig[:-40]
    lens = np.array([T, T - 40], np.int32)
    dev = (jnp.asarray(chm.log_start, jnp.float32), jnp.asarray(chm.log_trans, jnp.float32),
           jnp.asarray(chm.log_end, jnp.float32), jnp.asarray(chm.mu, jnp.float32),
           jnp.asarray(chm.sigma, jnp.float32), jnp.asarray(chm.is_uniform),
           jnp.asarray(chm.log_uni, jnp.float32))
    logps, paths = viterbi_pallas_batch(jnp.asarray(obs), jnp.asarray(lens), ph)
    for k in range(2):
        lp_ref, p_ref = viterbi_scan(jnp.asarray(obs[k]), jnp.int32(lens[k]), *dev)
        assert np.isclose(float(logps[k]), float(lp_ref), rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(paths[k])[: lens[k]],
                                      np.asarray(p_ref)[: lens[k]])
    # count decode must be exact through the pallas path
    from strique_tpu.ops.viterbi import count_repeats

    assert count_repeats(np.asarray(paths[0]), int(lens[0]), chm) == 8


def test_align_wave_matches_column_and_scan():
    """The wavefront kernel must be BIT-identical to the column kernel
    and the XLA scan kernel: it carries the column cummax as a running
    per-lane value (same max-sets, same add expression trees), so the
    float32 value stream is the same by construction.  Guards scores,
    end columns and full tracebacks across gap-parameter branches."""
    from strique_tpu.ops.align import align_batch

    rng = np.random.default_rng(7)
    for p in (AlignParams(),
              AlignParams(gap_open_h=-3.0, gap_extension_h=-0.5,
                          gap_open_v=-20.0, gap_extension_v=-4.0),
              AlignParams(gap_open_h=1.0, gap_extension_h=0.5)):
        B, N, M = 8, 512, 40
        template = rng.uniform(60, 120, M).astype(np.float32)
        signals = rng.uniform(60, 120, (B, N)).astype(np.float32)
        for i in range(4):
            st = 50 + i * 60
            signals[i, st : st + M] = template + rng.normal(0, 0.5, M)
        na = rng.integers(300, 500, B).astype(np.int32)
        col = align_batch(signals, na, template, p, impl="pallas_col")
        wave = align_batch(signals, na, template, p, impl="pallas_wave")
        xla = align_batch(signals, na, template, p, impl="xla")
        for k in ("score", "j_end", "is_gap", "jpos", "j_begin"):
            np.testing.assert_array_equal(np.asarray(col[k]), np.asarray(wave[k]),
                                          err_msg=f"{k} col vs wave")
            np.testing.assert_array_equal(np.asarray(xla[k]), np.asarray(wave[k]),
                                          err_msg=f"{k} xla vs wave")


def test_align_wave_score_only_matches():
    """with_ptr=False must produce the identical bottom-row score stream
    (the pass-1 mode of the checkpointed ultra-long path)."""
    import jax.numpy as jnp

    from strique_tpu.ops.align_pallas import align_forward_wave, pad_template

    rng = np.random.default_rng(11)
    B, N, M = 8, 256, 24
    p = AlignParams()
    template = rng.uniform(60, 120, M).astype(np.float32)
    signals = rng.uniform(60, 120, (B, N)).astype(np.float32)
    na = np.full(B, N - 10, np.int32)
    tp, m = pad_template(template)
    ptr, bs = align_forward_wave(jnp.asarray(signals), jnp.asarray(na),
                                 jnp.asarray(tp), p, m, True)
    none_ptr, bs2 = align_forward_wave(jnp.asarray(signals), jnp.asarray(na),
                                       jnp.asarray(tp), p, m, False)
    assert none_ptr is None and ptr is not None
    np.testing.assert_array_equal(np.asarray(bs), np.asarray(bs2))


def test_align_longread_two_pass_matches(monkeypatch):
    """The checkpointed two-pass path (pass-1 score-only + state
    checkpoints, pass-2 windowed pointer recompute from the restart
    state) must be BIT-identical to the one-pass wavefront: the restart
    state equals the full DP state, so every recomputed value matches.
    Also pins the align_core auto-route when the pointer plane exceeds
    the HBM budget (the ultra-long regime, VERDICT round-3 item 3)."""
    from strique_tpu.ops.align import align_batch, align_batch_longread, align_core

    rng = np.random.default_rng(13)
    B, N, M = 8, 4096, 40
    p = AlignParams()
    template = rng.uniform(60, 120, M).astype(np.float32)
    signals = rng.uniform(60, 120, (B, N)).astype(np.float32)
    for i in range(B):
        st = int(rng.integers(0, N - 3 * M))
        signals[i, st : st + M] = template + rng.normal(0, 0.5, M)
    na = rng.integers(N // 2, N, B).astype(np.int32)
    one = align_batch(signals, na, template, p, impl="pallas_wave")
    two = align_batch_longread(signals, na, template, p, ckpt_steps=512)
    for k in ("score", "j_end", "is_gap", "jpos", "j_begin"):
        np.testing.assert_array_equal(np.asarray(one[k]), np.asarray(two[k]),
                                      err_msg=k)
    # auto-route: a tiny budget must push align_core through the
    # two-pass path and still produce identical outputs
    monkeypatch.setenv("STRIQUE_PTR_BUDGET_GB", "0.0001")
    routed = align_core(signals, na, template, p, impl="pallas_wave")
    for k in ("score", "j_end", "is_gap", "jpos", "j_begin"):
        np.testing.assert_array_equal(np.asarray(one[k]), np.asarray(routed[k]),
                                      err_msg=f"routed {k}")


def test_align_fused_pair_matches(monkeypatch):
    """Flank fusion (per-row templates, one kernel stream for both
    flanks) must be bit-identical to two separate wave calls — scores,
    end columns, gap flags and positions, for unequal template lengths
    and across the 64-row call boundary."""
    from strique_tpu.ops.align import align_batch, align_fused_pair

    rng = np.random.default_rng(17)
    B, N = 8, 512
    p = AlignParams()
    t_pre = rng.uniform(60, 120, 40).astype(np.float32)
    t_suf = rng.uniform(60, 120, 28).astype(np.float32)
    signals = rng.uniform(60, 120, (B, N)).astype(np.float32)
    for i in range(B):
        st = 40 + i * 50
        signals[i, st : st + 40] = t_pre + rng.normal(0, 0.5, 40)
        signals[i, st + 60 : st + 88] = t_suf + rng.normal(0, 0.5, 28)
    na = rng.integers(400, 500, B).astype(np.int32)
    monkeypatch.setenv("STRIQUE_ALIGN_FUSE", "force")
    pre, suf = align_fused_pair(signals, na, t_pre, t_suf, p)
    ref_pre = align_batch(signals, na, t_pre, p, impl="pallas_wave")
    ref_suf = align_batch(signals, na, t_suf, p, impl="pallas_wave")
    for name, got, ref in (("pre", pre, ref_pre), ("suf", suf, ref_suf)):
        for k in ("score", "j_end", "is_gap", "jpos", "j_begin"):
            np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]),
                                          err_msg=f"{name} {k}")


def test_align_longread_degenerate_reads():
    """Two-pass edge cases: reads with no template match (j_end may be
    0/virtual-column), a read shorter than the template, and a read
    whose alignment sits at the very end of the signal — all must agree
    bitwise with the one-pass kernel (cold restarts, window clamping)."""
    from strique_tpu.ops.align import align_batch, align_batch_longread

    rng = np.random.default_rng(23)
    B, N, M = 8, 2048, 40
    p = AlignParams()
    template = rng.uniform(60, 120, M).astype(np.float32)
    signals = np.full((B, N), 200.0, np.float32)  # far from the template
    na = np.full(B, N - 10, np.int32)
    signals[1] = rng.uniform(60, 120, N)
    na[2] = 8  # shorter than the template
    signals[3, N - 60 : N - 20] = template  # match at the signal's end
    na[3] = N - 10
    one = align_batch(signals, na, template, p, impl="pallas_wave")
    two = align_batch_longread(signals, na, template, p, ckpt_steps=256)
    for k in ("score", "j_end", "is_gap", "jpos", "j_begin"):
        np.testing.assert_array_equal(np.asarray(one[k]), np.asarray(two[k]),
                                      err_msg=k)


def test_longread_requires_bounded_horizontal_gaps():
    """Free/positive horizontal gap costs admit unbounded spans — no
    exact window exists, so the two-pass must refuse loudly instead of
    silently truncating (align_core falls back to the one-pass plane
    for such configs)."""
    import pytest as _pytest

    from strique_tpu.ops.align import align_batch_longread
    from strique_tpu.ops.align_pallas import wave_span_bound_steps

    p = AlignParams(gap_open_h=1.0, gap_extension_h=0.5)
    assert wave_span_bound_steps(p, 40) is None
    sig = np.zeros((8, 256), np.float32)
    na = np.full(8, 250, np.int32)
    tmpl = np.zeros(16, np.float32)
    with _pytest.raises(ValueError, match="negative horizontal gap"):
        align_batch_longread(sig, na, tmpl, p)


def test_align_longread_sharded_over_devices():
    """The device-sharded two-pass front-end (8-wide groups round-robined
    over the mesh's devices, pass-1 dispatches fanned out before the
    first sync) must be bit-identical to the one-pass kernel and the
    single-device two-pass — on the virtual 8-device CPU mesh."""
    import jax

    from strique_tpu.ops.align import (align_batch, align_batch_longread,
                                       align_longread_sharded)

    rng = np.random.default_rng(31)
    B, N, M = 24, 2048, 40  # 3 groups over the devices
    p = AlignParams()
    template = rng.uniform(60, 120, M).astype(np.float32)
    signals = rng.uniform(60, 120, (B, N)).astype(np.float32)
    for i in range(B):
        st = int(rng.integers(0, N - 3 * M))
        signals[i, st : st + M] = template + rng.normal(0, 0.5, M)
    na = rng.integers(N // 2, N, B).astype(np.int32)
    one = align_batch(signals, na, template, p, impl="pallas_wave")
    single = align_batch_longread(signals, na, template, p, ckpt_steps=512)
    sharded = align_longread_sharded(signals, na, template, p,
                                     devices=jax.devices(), ckpt_steps=512)
    for k in ("score", "j_end", "is_gap", "jpos", "j_begin"):
        np.testing.assert_array_equal(np.asarray(one[k]), np.asarray(sharded[k]),
                                      err_msg=f"one-pass vs sharded {k}")
        np.testing.assert_array_equal(np.asarray(single[k]), np.asarray(sharded[k]),
                                      err_msg=f"single vs sharded {k}")


def test_longread_ckpt_steps_below_template_width():
    """ckpt_steps smaller than the template pad width must be clamped
    up: a warm restart at t0 < mp skips pass-2 column-0 boundary forcing
    (advisor round-4 medium).  The span-bound algebra keeps optimal
    paths away from column 0 in warm windows, but a tie at the bound
    edge could flip pointers — the clamp removes the case outright.
    Template M=200 -> mp=256; ckpt_steps=128 pre-clamp admits
    t0=128 < 256 (steep horizontal gaps shrink the span bound so warm
    restarts engage at this test scale); outputs must stay bit-equal to
    the one-pass kernel."""
    from strique_tpu.ops.align import align_batch, align_batch_longread

    rng = np.random.default_rng(29)
    B, N, M = 8, 2048, 200
    p = AlignParams(gap_open_h=-20.0, gap_extension_h=-20.0)
    template = rng.uniform(60, 120, M).astype(np.float32)
    signals = rng.uniform(60, 120, (B, N)).astype(np.float32)
    for i in range(B):
        st = 450 + 20 * i  # alignments end near t ~ 850-1050
        signals[i, st : st + M] = template + rng.normal(0, 0.5, M)
    na = np.full(B, N - 10, np.int32)
    one = align_batch(signals, na, template, p, impl="pallas_wave")
    two = align_batch_longread(signals, na, template, p, ckpt_steps=128)
    for k in ("score", "j_end", "is_gap", "jpos", "j_begin"):
        np.testing.assert_array_equal(np.asarray(one[k]), np.asarray(two[k]),
                                      err_msg=k)


def test_wave_unroll_snaps_to_chunk_divisor():
    """WAVE_UNROLL values that do not divide CHUNK (24, 48, 96...) would
    silently skip the last CHUNK % unroll DP steps of every chunk
    (advisor round-4 medium); the env value must snap to a power-of-two
    divisor of CHUNK."""
    from strique_tpu.ops.align_pallas import CHUNK, _snap_unroll

    for req, want in ((5, 8), (8, 8), (16, 16), (24, 16), (48, 32),
                      (96, 64), (128, 128), (1000, 128)):
        got = _snap_unroll(req)
        assert got == want, (req, got)
        assert CHUNK % got == 0
