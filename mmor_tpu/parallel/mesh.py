"""Device mesh and sharding utilities.

The reference's distributed surface is NCCL/gloo data parallelism via
detectron2 / HF Trainer / DeepSpeed ZeRO-2 (SURVEY.md §2.4). The TPU-native
equivalent is a ``jax.sharding.Mesh`` with ``data`` and ``model`` axes; XLA
inserts the collectives over ICI. Batch leading dims shard on ``data``;
params are replicated (DP) or sharded on ``model`` (TP, optional for the 7B
decoder); optimizer state can shard on ``data`` (ZeRO-style) via
``shard_opt_state``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ('data', 'model') mesh; defaults to all devices on data."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for batch pytrees."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array in the batch with its leading dim on the data axis."""
    spec = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, spec), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params etc.) across the mesh."""
    spec = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, spec), tree)


def zero_sharding(mesh: Mesh, tree):
    """ZeRO-style optimizer-state sharding: shard the largest axis that
    divides the data-axis size, replicate anything too small.

    The TPU analogue of DeepSpeed ZeRO-2's optimizer-state partitioning
    (the reference trains with `--deepspeed ./scripts/zero2.json`).
    """
    n_data = mesh.shape["data"]

    def spec_for(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return NamedSharding(mesh, P())
        for axis, size in enumerate(x.shape):
            if size % n_data == 0 and size >= n_data:
                parts = [None] * x.ndim
                parts[axis] = "data"
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, tree)
