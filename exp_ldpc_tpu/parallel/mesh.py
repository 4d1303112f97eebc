"""Device-mesh helpers.

The reference's entire distribution story is a multiprocessing Pool fanning
shots over CPU workers (``/root/reference/python/qldpc/misc/p_sweep.py:18-29``).
The TPU-native equivalent (SURVEY.md §2.4): shard the Monte-Carlo shot batch
over a ``jax.sharding.Mesh`` data axis with ``shard_map``, reduce
logical-failure counts with ``psum`` over ICI, and (for large codes) shard
the check partition over a second model axis.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "DATA_AXIS", "MODEL_AXIS"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh of shape (data, model) over the available devices.

    ``model_parallel`` devices cooperate on one decode (check-partition
    sharding); the rest of the devices replicate over independent shots.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
