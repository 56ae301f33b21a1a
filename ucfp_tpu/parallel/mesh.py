"""Device mesh helpers for the ICI-sharded query path."""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def data_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    """1-D mesh over the first n devices (ICI within a slice)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))
