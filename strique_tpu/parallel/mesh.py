"""Device-mesh parallelism: data-parallel reads, state-sharded Viterbi.

The reference's only parallelism is a fork-based worker pool over reads
(reference scripts/STRique.py:733-830).  The TPU-native equivalents:

  * **data parallelism**: batches of reads sharded over a ``data`` mesh
    axis with ``shard_map`` — pure per-read DP, model tensors replicated,
    no cross-read communication;
  * **model (state) parallelism**: the dense Viterbi transition matrix
    sharded column-wise over a ``model`` axis; each step computes the
    max-plus product for its local state columns and reassembles the
    full score vector with an ``all_gather`` riding ICI.  This is the
    scaling path for HMMs whose state space outgrows one chip's VMEM.

Both compose on a 2-D mesh (reads x states).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(f, mesh, in_specs, out_specs, check: bool = True):
    kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    if not check:
        # outputs replicated through collectives can't always be statically
        # inferred (e.g. values produced from all_gather across 'model')
        try:
            return _shard_map(f, check_vma=False, **kwargs)
        except TypeError:
            return _shard_map(f, check_rep=False, **kwargs)
    return _shard_map(f, **kwargs)

from ..ops.viterbi import emission_logp


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Initialize multi-host JAX (idempotent); returns this process' index.

    With no arguments, initializes from the cluster environment when one
    is detectable (TPU pod metadata / JAX coordinator env vars).  After
    initialization, ``make_mesh`` spans all hosts' devices and the
    ``data`` axis shards reads across the pod; per-host TSV shards
    concatenate to the final output exactly like the reference's
    unordered collector stream.
    """
    import os

    # NB: the idempotency guard must not be jax.process_count() — that
    # call itself initializes the XLA backend, after which initialize()
    # refuses to run
    if jax.distributed.is_initialized():
        return jax.process_index()
    explicit = coordinator is not None or num_processes is not None
    env_cluster = any(os.environ.get(k) for k in (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS"))
    if explicit or env_cluster:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes, process_id=process_id)
    return jax.process_index()


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh; default 1-D ``data`` axis over all devices."""
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": len(devices)}
    shape = tuple(axes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh {axes} does not match {len(devices)} devices")
    return Mesh(np.array(devices).reshape(shape), tuple(axes.keys()))


# ---------------------------------------------------------------------------
# data-parallel flank alignment
# ---------------------------------------------------------------------------

def batched_align(mesh: Mesh | None, signals, n_actual, template, params,
                  impl: str = "auto"):
    """Batched alignment sharded over the ``data`` axis.

    signals: (B, N) float32; n_actual: (B,) int32; template: (M,) float32.
    B must be divisible by the data-axis size when a mesh is given.  Each
    shard runs the production kernel (`ops.align.align_core`): the Pallas
    forward on TPU, the XLA scan elsewhere.
    """
    from ..ops.align import align_core

    template_np = np.asarray(template, np.float32)
    inner = lambda s, n: align_core(s, n, template_np, params, impl)
    if mesh is None:
        return inner(signals, n_actual)
    fn = shard_map(inner, mesh,
                   in_specs=(P("data"), P("data")),
                   out_specs=P("data"))
    return fn(signals, n_actual)


# ---------------------------------------------------------------------------
# state-sharded (tensor-parallel) Viterbi
# ---------------------------------------------------------------------------

def _tp_viterbi_shard(obs, t_actual, log_start_l, log_trans_l, log_end_l,
                      mu_l, sigma_l, is_uniform_l, log_uni_l, axis: str):
    """Per-shard body: owns S_local state columns of the transition matrix.

    Carry is the FULL (replicated) score vector; each step computes the
    max-plus update for the local columns and all-gathers the pieces.
    """
    T = obs.shape[0]
    s_local = log_trans_l.shape[1]
    iota_l = jnp.arange(s_local, dtype=jnp.int32)

    def emit_l(x):
        return emission_logp(x, mu_l, sigma_l, is_uniform_l, log_uni_l)

    score_l0 = log_start_l + emit_l(obs[0])
    score0 = jax.lax.all_gather(score_l0, axis, tiled=True)  # (S,)
    shift0 = jnp.max(score0)
    score0 = score0 - shift0

    def step(carry, xt):
        score, acc = carry  # score: full (S,), small magnitude
        x, t = xt
        cand = score[:, None] + log_trans_l  # (S, S_local)
        best_l = jnp.max(cand, axis=0)
        bp_l = jnp.argmax(cand, axis=0).astype(jnp.int16)
        new_l = best_l + emit_l(x)
        new = jax.lax.all_gather(new_l, axis, tiled=True)  # (S,) — ICI collective
        shift = jnp.max(new)
        live = t < t_actual
        score = jnp.where(live, new - shift, score)
        acc = jnp.where(live, acc + shift, acc)
        my_base = jax.lax.axis_index(axis) * s_local
        bp_l = jnp.where(live, bp_l, (iota_l + my_base).astype(jnp.int16))
        return (score, acc), bp_l

    ts = jnp.arange(1, T, dtype=jnp.int32)
    (score, acc), bps_l = jax.lax.scan(step, (score0, shift0), (obs[1:], ts))
    # final: local candidates, reduce across shards
    final_l = score[jax.lax.axis_index(axis) * s_local + iota_l] + log_end_l
    best_val_l = jnp.max(final_l)
    best_idx_l = jax.lax.axis_index(axis) * s_local + jnp.argmax(final_l).astype(jnp.int32)
    vals = jax.lax.all_gather(best_val_l, axis)  # (n_shards,)
    idxs = jax.lax.all_gather(best_idx_l, axis)
    k = jnp.argmax(vals)
    logp = vals[k] + acc
    last = idxs[k]
    return logp[None], last[None], bps_l  # bp shard (T-1, S_local)


def sharded_viterbi(mesh: Mesh, obs, t_actual, log_start, log_trans, log_end,
                    mu, sigma, is_uniform, log_uni, data_axis: str = "data",
                    model_axis: str = "model"):
    """Viterbi over a 2-D (reads x states) mesh.

    obs: (B, T) observations sharded over ``data``; the (S, S) transition
    matrix is sharded column-wise over ``model`` and its rows replicated.
    Returns (logp (B,), path (B, T)).
    """
    def one_read(o, t, ls, lt, le, m, s, u, lu):
        return _tp_viterbi_shard(o, t, ls, lt, le, m, s, u, lu, model_axis)

    def shard_fn(obs_b, t_b, ls, lt, le, m, s, u, lu):
        f = jax.vmap(lambda o, t: one_read(o, t, ls, lt, le, m, s, u, lu))
        return f(obs_b, t_b)

    fn = shard_map(
        shard_fn, mesh,
        in_specs=(P(data_axis), P(data_axis), P(model_axis), P(None, model_axis),
                  P(model_axis), P(model_axis), P(model_axis), P(model_axis), P(model_axis)),
        out_specs=(P(data_axis), P(data_axis), P(data_axis, None, model_axis)),
        check=False,
    )
    logp, last, bps = fn(obs, t_actual, log_start, log_trans, log_end,
                         mu, sigma, is_uniform, log_uni)
    logp = logp[:, 0]
    last = last[:, 0]

    # traceback on the reassembled full backpointers (per read)
    def back_one(last_i, bps_i):
        def back(state, bp_t):
            prev = bp_t[state].astype(jnp.int32)
            return prev, state

        first, rev = jax.lax.scan(back, last_i, bps_i, reverse=True)
        return jnp.concatenate([first[None], rev])

    path = jax.vmap(back_one)(last, bps)
    return logp, path
