"""Device-mesh helpers.

The reference has no distributed layer at all (single GPU, PCIe streams —
SURVEY.md §2 P8); multi-chip scaling is new scope mandated by the north star.
Meshes here follow the standard JAX recipe: 1D "x" for single-host chip
scaling, 2D ("host", "chip") for pod slices where the exchange should ride
ICI within a host and DCN across hosts.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def make_mesh_2d(
    n_hosts: int, chips_per_host: int, axes: Tuple[str, str] = ("host", "chip")
) -> Mesh:
    devs = jax.devices()
    n = n_hosts * chips_per_host
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]).reshape(n_hosts, chips_per_host), axes)
