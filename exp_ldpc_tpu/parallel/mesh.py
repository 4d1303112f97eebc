"""Device-mesh helpers.

The reference's entire distribution story is a multiprocessing Pool fanning
shots over CPU workers (``/root/reference/python/qldpc/misc/p_sweep.py:18-29``).
The TPU-native equivalent (SURVEY.md §2.4): shard the Monte-Carlo shot batch
over a ``jax.sharding.Mesh`` data axis with ``shard_map``, reduce
logical-failure counts with ``psum`` over ICI, and (for large codes) shard
the check partition over a second model axis.  Multi-host slices join the
same mesh via ``init_distributed`` (DCN for setup, ICI for the collectives).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "init_distributed", "DATA_AXIS", "MODEL_AXIS"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join a multi-host run; returns this host's process index.

    Call once per host before :func:`make_mesh`; afterwards ``jax.devices()``
    is the GLOBAL device list, so meshes built from it span the whole slice
    and the scalar ``psum`` failure reductions ride ICI within the slice.
    With no arguments, coordination parameters come from the environment /
    TPU metadata (the standard ``jax.distributed.initialize()`` behavior) and
    failures degrade to single-process (the expected case outside a pod).
    With EXPLICIT coordination arguments a failure other than
    already-initialized re-raises — silently falling back would let every
    host run the full workload and report duplicated results as one.
    """
    explicit = coordinator_address is not None or num_processes is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if explicit and "already" not in str(e).lower():
            raise
    return jax.process_index()


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh of shape (data, model) over the available devices.

    ``model_parallel`` devices cooperate on one decode (check-partition
    sharding) and should sit on the fastest links, so when the device list is
    not given explicitly the (data, model) grid is laid out with
    ``mesh_utils.create_device_mesh`` (ICI-topology-aware on real TPU
    slices); an explicit ``devices`` sequence is reshaped in order.
    """
    explicit = devices is not None
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    shape = (n // model_parallel, model_parallel)
    if not explicit and n_devices is None:
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_device_mesh(shape, devices=devices)
            return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
        except Exception:
            pass  # odd topologies: fall back to in-order reshape
    grid = np.asarray(devices).reshape(shape)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
