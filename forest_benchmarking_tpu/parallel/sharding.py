"""Multi-chip scaling: shard the problem batch across a device mesh.

The reference has no distributed backend (SURVEY.md section 2.9) — its
"parallelism" is batching experiment settings. The TPU-native equivalent is a
1-D ``jax.sharding.Mesh`` over the batch axis of independent estimation
problems: thousands of tomography/RB/DFE solves per dispatch, partitioned
across chips over ICI. Estimator kernels are elementwise in the batch
dimension, so XLA inserts no cross-chip collectives in the hot loop — scaling
is embarrassingly parallel by construction, and any reductions (e.g. summary
statistics) ride ICI via psum when requested.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_sharded"]

BATCH_AXIS = "batch"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = BATCH_AXIS) -> Mesh:
    """A 1-D mesh over all (or the given) devices, named for the batch axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(mesh: Mesh, x, axis_name: str = BATCH_AXIS):
    """Place an array with its leading (batch) dim sharded across the mesh."""
    spec = P(axis_name, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    """Place an array fully replicated on every device of the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def batch_sharded(fn, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """jit ``fn(shared, batched) -> batched`` with the batch dim sharded.

    ``shared`` is replicated (e.g. the A-matrix / observable stack); the first
    axis of ``batched`` inputs and of every output is partitioned across the
    mesh. Because the estimators are independent per batch element, XLA
    compiles this to fully-local compute per chip.
    """
    def spec_for(x, batched: bool):
        if batched:
            return NamedSharding(mesh, P(axis_name, *([None] * (np.ndim(x) - 1))))
        return NamedSharding(mesh, P())

    def wrapped(shared, batched):
        shared = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(
            x, spec_for(x, False)), shared)
        batched = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(
            x, spec_for(x, True)), batched)
        return fn(shared, batched)

    return jax.jit(wrapped)
