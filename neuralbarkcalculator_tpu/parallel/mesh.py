"""Device mesh and sharding layout for multi-chip execution.

The reference has no distributed code at all (SURVEY.md §2.4): inference is
strictly batch_size=1 on one device (reference models.py:249-262) and
training is single-GPU. This module is therefore new, TPU-first design:

- A 2-D ``(data, model)`` mesh over all available devices. The ``data`` axis
  shards batches (folder inference, training) — the primary scale-out path
  for a ~35M-param FCN. The ``model`` axis spatially partitions the image
  *width* across chips: convolutions sharded on a spatial dim are handled by
  XLA/GSPMD, which inserts the halo-exchange collectives over ICI
  automatically — the CNN equivalent of sequence/context parallelism.
- All shardings are ``NamedSharding`` built from one vocabulary so jitted
  programs (train step, predict step) take their layout from here and
  nothing else.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans slices over DCN (jax.devices() is global).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices: Sequence[Any] | None = None) -> Mesh:
    """Build a ``(data, model)`` mesh.

    n_data defaults to ``len(devices) // n_model``. A 1-chip mesh is valid
    (shape (1, 1)) so single-device and multi-device run the same code path.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = max(1, len(devices) // n_model)
    n = n_data * n_model
    if n > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n} devices, "
            f"have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


@dataclasses.dataclass(frozen=True)
class ShardingRules:
    """The sharding vocabulary every jitted program draws from."""

    mesh: Mesh

    def _ns(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        """Params, optimizer state, scalars: replicated everywhere."""
        return self._ns()

    @property
    def batch(self) -> NamedSharding:
        """[B, ...] host batches: sharded over the data axis only."""
        return self._ns(DATA_AXIS)

    @property
    def image_batch(self) -> NamedSharding:
        """[B, H, W, C] NHWC activations: batch over data, width over model
        (spatial partitioning; GSPMD adds conv halo exchange)."""
        return self._ns(DATA_AXIS, None, MODEL_AXIS, None)

    @property
    def label_batch(self) -> NamedSharding:
        """[B, H, W] labels, sharded to match image_batch."""
        return self._ns(DATA_AXIS, None, MODEL_AXIS)

    @property
    def data_size(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def model_size(self) -> int:
        return self.mesh.shape[MODEL_AXIS]

    @property
    def n_devices(self) -> int:
        return self.data_size * self.model_size


def put_batch(rules: ShardingRules, arrays, spatial: bool = True):
    """Transfer a pytree of host batch arrays to the mesh.

    Image-shaped leaves ([B, H, W, (C)]) get the spatial layout when
    ``spatial``; everything else is sharded on the data axis.
    """
    def place(x):
        x = np.asarray(x)
        if spatial and x.ndim == 4:
            s = rules.image_batch
        elif spatial and x.ndim == 3:
            s = rules.label_batch
        elif x.ndim >= 1:
            s = rules.batch
        else:
            s = rules.replicated
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(place, arrays)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n (and >= m)."""
    return max(m, ((n + m - 1) // m) * m)


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host setup over DCN (SURVEY.md §5.8).

    Call once per host before ``make_mesh``; afterwards ``jax.devices()``
    is global across the slice/pod and the same mesh/sharding code spans
    hosts — XLA routes collectives over ICI within a slice and DCN across
    slices. On TPU pods with the standard environment variables, calling
    with no arguments autodetects everything.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
