"""Viterbi kernel tests: device scan vs float64 NumPy oracle, decode helpers."""
import numpy as np
import pytest

from strique_tpu.ops.reference import viterbi_np


def random_hmm(rng, S):
    """Random left-to-right-ish HMM in the compiled dense form."""
    log_trans = np.full((S, S), -np.inf)
    for u in range(S):
        targets = rng.choice(S, size=min(S, 4), replace=False)
        probs = rng.dirichlet(np.ones(len(targets)))
        for v, p in zip(targets, probs):
            log_trans[u, v] = np.log(p)
    log_start = np.log(rng.dirichlet(np.ones(S)))
    log_end = np.log(rng.uniform(0.01, 1, S))
    mu = rng.uniform(60, 120, S)
    sigma = rng.uniform(1, 4, S)
    is_uniform = rng.random(S) < 0.2
    log_uni = np.full(S, -np.log(60.0))
    return log_start, log_trans, log_end, mu, sigma, is_uniform, log_uni


def test_scan_matches_oracle():
    import jax.numpy as jnp

    from strique_tpu.ops.viterbi import viterbi_scan

    rng = np.random.default_rng(0)
    S, T, Tpad = 12, 50, 64
    for trial in range(5):
        hmm = random_hmm(rng, S)
        obs = rng.uniform(60, 120, T)
        logp_o, path_o = viterbi_np(obs, *hmm)
        obs_pad = np.zeros(Tpad, np.float32)
        obs_pad[:T] = obs
        dev = [jnp.asarray(x, jnp.float32) if x.dtype != bool else jnp.asarray(x) for x in hmm]
        logp_d, path_d = viterbi_scan(jnp.asarray(obs_pad), jnp.int32(T), *dev)
        np.testing.assert_array_equal(np.asarray(path_d)[:T], path_o, err_msg=f"trial {trial}")
        assert np.isclose(float(logp_d), logp_o, rtol=1e-4)


def test_scan_padding_invariance():
    import jax.numpy as jnp

    from strique_tpu.ops.viterbi import viterbi_scan

    rng = np.random.default_rng(1)
    S, T = 8, 40
    hmm = random_hmm(rng, S)
    obs = rng.uniform(60, 120, T)
    paths = []
    for Tpad in (48, 96):
        obs_pad = np.zeros(Tpad, np.float32)
        obs_pad[:T] = obs
        dev = [jnp.asarray(x, jnp.float32) if x.dtype != bool else jnp.asarray(x) for x in hmm]
        logp, path = viterbi_scan(jnp.asarray(obs_pad), jnp.int32(T), *dev)
        paths.append((float(logp), np.asarray(path)[:T]))
    assert np.isclose(paths[0][0], paths[1][0], rtol=1e-5)
    np.testing.assert_array_equal(paths[0][1], paths[1][1])


def test_path_logp_f64_consistency():
    from strique_tpu.hmm.graph import CompiledHMM
    from strique_tpu.ops.viterbi import path_logp_f64

    rng = np.random.default_rng(2)
    S, T = 6, 30
    log_start, log_trans, log_end, mu, sigma, is_uniform, log_uni = random_hmm(rng, S)
    obs = rng.uniform(60, 120, T)
    logp, path = viterbi_np(obs, log_start, log_trans, log_end, mu, sigma, is_uniform, log_uni)
    chm = CompiledHMM(names=[str(i) for i in range(S)], log_start=log_start, log_trans=log_trans,
                      log_end=log_end, mu=mu, sigma=sigma, is_uniform=is_uniform, log_uni=log_uni)
    assert np.isclose(path_logp_f64(obs, path, chm), logp, rtol=1e-10)


def test_mod_pattern_decode():
    from strique_tpu.hmm.graph import CompiledHMM
    from strique_tpu.ops.viterbi import mod_pattern

    names = ["s0", "e0", "base0m", "mod0m"]
    chm = CompiledHMM(names=names, log_start=np.zeros(4), log_trans=np.zeros((4, 4)),
                      log_end=np.zeros(4), mu=np.zeros(4), sigma=np.ones(4),
                      is_uniform=np.zeros(4, bool), log_uni=np.zeros(4),
                      meta={"anchor_states": np.array([True, True, False, False]),
                            "mod_states": np.array([False, False, False, True])})
    # s0 base base e0 s0 mod e0 s0 base e0
    path = np.array([0, 2, 2, 1, 0, 3, 1, 0, 2, 1])
    assert mod_pattern(path, len(path), chm) == "010"

def test_mod_pattern_vectorized_matches_scalar():
    """Randomized parity: the vectorized decode == the per-sample walk."""
    from strique_tpu.hmm.graph import CompiledHMM
    from strique_tpu.ops.viterbi import mod_pattern

    rng = np.random.default_rng(7)
    names = ["s0", "e0", "base0m", "mod0m"]
    chm = CompiledHMM(names=names, log_start=np.zeros(4), log_trans=np.zeros((4, 4)),
                      log_end=np.zeros(4), mu=np.zeros(4), sigma=np.ones(4),
                      is_uniform=np.zeros(4, bool), log_uni=np.zeros(4),
                      meta={"anchor_states": np.array([True, True, False, False]),
                            "mod_states": np.array([False, False, False, True])})

    def scalar(path, t_actual):
        path = np.asarray(path)[:t_actual]
        anchor = chm.meta["anchor_states"][path]
        mod = chm.meta["mod_states"][path]
        out, in_unit = [], False
        for t in range(len(path)):
            if anchor[t]:
                in_unit = False
                continue
            if not in_unit:
                out.append("1" if mod[t] else "0")
                in_unit = True
        return "".join(out)

    for _ in range(50):
        t = int(rng.integers(1, 200))
        path = rng.integers(0, 4, t)
        assert mod_pattern(path, t, chm) == scalar(path, t)
