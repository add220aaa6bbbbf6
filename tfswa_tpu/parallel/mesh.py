"""Device mesh construction for SPMD training.

The reference has no distributed anything (SURVEY.md section 2.7); this layer
is new, TPU-native design: a ('data', 'model') mesh over ICI, with GSPMD
inserting the collectives (gradient psum over 'data', tensor-parallel
all-reduces over 'model') from sharding annotations alone.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import MeshConfig


def create_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 2-D ('data', 'model') mesh.

    shape=None uses all devices on the data axis.  shape=(d, m) with d == -1
    derives d from the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    d, m = shape
    if d == -1:
        assert n % m == 0, f"{n} devices not divisible by model axis {m}"
        d = n // m
    assert d * m == n, f"mesh {d}x{m} != {n} devices"
    arr = np.asarray(devices).reshape(d, m)
    return Mesh(arr, axis_names)


def mesh_from_config(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    return create_mesh(shape=(cfg.data_axis, cfg.model_axis), devices=devices)
