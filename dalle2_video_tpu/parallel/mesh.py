"""Device mesh + sharding rules.

Replaces the reference's NCCL-via-Accelerate/DeepSpeed plane
(reference trainer.py:30,102,117-124; configs/deepspeed_config.json) with a
single GSPMD `jax.sharding.Mesh`:

  - ``data``  axis: batch (DP) + optimizer-state sharding (ZeRO-equivalent)
  - ``model`` axis: tensor parallelism for attention heads / wide channels

On a v4-8 the default is all-data (`data=N, model=1`); collectives ride ICI
and are inserted by the partitioner from sharding annotations only.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# trace-time mesh discovery for mesh-aware layers (sequence-parallel
# attention): the sharded step factories trace the model under
# ``with active_mesh(mesh):`` so modules deep in the network can reach the
# mesh without threading it through every config/call signature.
_ACTIVE_MESH: Optional[Mesh] = None


@contextlib.contextmanager
def active_mesh(mesh: Optional[Mesh]):
    """Set the mesh visible to get_active_mesh() for the duration (trace
    time — jit bodies run under this context when the factories in
    parallel/sharded.py build the step)."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev


def get_active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def create_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_with(mesh: Mesh, sharding: NamedSharding, tree):
    """Multi-host-aware device_put with an ARBITRARY sharding.

    When more than one process participates, each host passes its
    PROCESS-LOCAL slice along the sharded axes (from a loader sharded with
    shard_index=jax.process_index()) and this assembles the global
    jax.Array across hosts (DCN never carries the batch data)."""
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with the leading axis on `data`
    (multi-host aware — see shard_with)."""
    return shard_with(mesh, batch_sharding(mesh), batch)


def maybe_init_distributed(enabled: bool = False) -> None:
    """Guarded jax.distributed.initialize for multi-host runs (SURVEY §2d
    DCN row). No-op unless explicitly enabled — single-host runs (and this
    environment's single-chip tunnel) must not attempt coordination."""
    if not enabled:
        return
    # Do NOT probe jax.process_count() first: it initializes the XLA
    # backend, after which jax.distributed.initialize() always raises
    # ("must be called before any JAX calls"). Call initialize directly
    # and treat "already initialized" as a no-op.
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        if "already" in str(e).lower():
            return  # second call in the same process — fine
        raise
