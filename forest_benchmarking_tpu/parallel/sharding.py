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

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_sharded",
           "shard_map_batched"]

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


def shard_map_batched(fn, mesh: Mesh, batched_argnums: Sequence[int] = (0,),
                      fold_key_argnums: Sequence[int] = (),
                      axis_name: str = BATCH_AXIS, check_vma: bool = False):
    """``shard_map`` a per-device kernel over a 1-D batch mesh.

    The generalization behind every sharded protocol entry point
    (``ops.lanes_apg.apg_fused_sharded``, ``quantum_volume.
    sample_heavy_outputs_sharded``): positional args in ``batched_argnums``
    are partitioned on their leading axis across ``axis_name``; args in
    ``fold_key_argnums`` are PRNG keys replicated in, then folded with the
    shard index inside the map (each device derives a distinct stream, so
    the result equals running each shard on its own chip with
    ``fold_in(key, shard)``); everything else is replicated. Every output
    has its leading axis partitioned.

    ``check_vma=False`` by default: estimator kernels mix replicated
    initializers with shard-varying iterates inside ``fori_loop`` carries,
    which the varying-manual-axes checker rejects, and there are no
    collectives inside these maps for the check to protect.
    """
    batched = frozenset(batched_argnums)
    folded = frozenset(fold_key_argnums)

    def wrapped(*args):
        in_specs = tuple(P(axis_name) if i in batched else P()
                         for i in range(len(args)))

        def local(*largs):
            largs = list(largs)
            for i in folded:
                largs[i] = jax.random.fold_in(
                    largs[i], jax.lax.axis_index(axis_name))
            return fn(*largs)

        return jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                             out_specs=P(axis_name),
                             check_vma=check_vma)(*args)

    return wrapped


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
