"""Multi-host initialization and mesh construction.

The reference's distributed story is single-node DDP over NCCL
(train.py:25-36); the TPU-native equivalent is `jax.distributed` process
groups over ICI/DCN.  This module is the launch glue: call
`initialize_distributed()` once per host process (before first device
use), then build meshes with `data_mesh` / `ba_mesh`.

On a pod slice, JAX discovers the coordinator from the TPU environment
automatically; on CPU/GPU fleets pass coordinator_address/num_processes/
process_id explicitly (mirroring the reference's MASTER_ADDR/RANK
rendezvous, train.py:28-35).
"""

import numpy as np


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Initialize the JAX process group (no-op for single-process runs)."""
    import jax

    if num_processes in (None, 1):
        return jax.process_count()
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count()


def data_mesh():
    """1-D mesh over all global devices for data-parallel training."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("data",))


def ba_mesh(n=None):
    """1-D mesh for edge-sharded distributed global BA."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n is not None:
        devs = devs[:n]
    return Mesh(np.array(devs), ("ba",))


def local_batch_slice(global_batch):
    """This host's slice of a globally-sharded leading batch axis."""
    import jax

    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
