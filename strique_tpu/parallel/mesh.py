"""Device-mesh parallelism: data-parallel reads over a 1-D mesh.

The reference's only parallelism is a fork-based worker pool over reads
(reference scripts/STRique.py:733-830).  The TPU-native equivalent is
**data parallelism**: batches of reads sharded over a ``data`` mesh axis
with ``shard_map`` — pure per-read DP, model tensors replicated, no
cross-read communication, so multi-chip output is bitwise identical to
single-device.  Multi-host runs initialize through
:func:`init_distributed` and shard reads across the pod the same way.

State (tensor) parallelism over the HMM is deliberately NOT a product
path: every supported HMM has a few hundred states and fits one chip's
VMEM with room to spare (see parallel/experimental.py for the demoted
capability sketch and NOTES.md for the resolution rationale).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P  # noqa: F401 (re-exported)

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
