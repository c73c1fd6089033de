"""Mesh construction helpers.

One place decides the device topology; every distributed component takes a
``Mesh`` and axis names instead of talking to ``jax.devices()`` directly.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a mesh from {axis_name: size}; sizes must multiply to #devices.

    Default: all devices on one ``point`` axis (the BA residual axis — the
    biggest win for distribution).
    """
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = {"point": len(devices)}
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            f"mesh {axis_sizes} needs {int(np.prod(sizes))} devices, "
            f"have {len(devices)}")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, names)


def shard_along(mesh: Mesh, axis: str) -> NamedSharding:
    """NamedSharding putting array dim 0 on mesh axis ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
