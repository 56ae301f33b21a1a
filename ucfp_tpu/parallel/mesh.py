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


def data_mesh_2d(n_slices: int, per_slice: int,
                 axes: tuple[str, str] = ("s", "d")) -> Mesh:
    """2-D mesh for multi-slice pods: the inner axis ("d") is ICI within
    a slice, the outer ("s") crosses slices over DCN. The hierarchical
    top-k merge in sharded_knn reduces over "d" first so only k
    candidates per slice ride the slower DCN links."""
    import numpy as np

    devs = jax.devices()
    need = n_slices * per_slice
    if len(devs) < need:
        raise ValueError(f"mesh {n_slices}x{per_slice} needs {need} devices,"
                         f" have {len(devs)}")
    return Mesh(np.array(devs[:need]).reshape(n_slices, per_slice), axes)
