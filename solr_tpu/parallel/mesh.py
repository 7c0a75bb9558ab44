"""Device-mesh construction.

The renderer's parallel axis is rays/tiles ("tiles"); scenes are
replicated.  On a multi-host slice the same axis spans hosts x chips —
tile sharding rides ICI within a host-slice and DCN across hosts, which
is the right layout because there is NO inter-tile communication in the
forward pass (rays are independent) and only one psum/reduce-scatter of
scene-parameter grads per step in the backward.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "device_count"]

TILE_AXIS = "tiles"


def device_count() -> int:
    return len(jax.devices())


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = TILE_AXIS,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D mesh over all (or the first n) devices.

    A renderer needs a single sharding axis; host/chip hierarchy is
    handled by device order (jax.devices() enumerates chips of host 0
    first, so contiguous tile blocks stay host-local and image gather
    crosses DCN only once).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))
