"""Device mesh construction and named-axis conventions.

The reference's entire multi-device story is accelerate's layer-wise
pipeline (awq/models/base.py:453-458, SURVEY.md §2.6). TPU-native
replacement: a named ``jax.sharding.Mesh`` with GSPMD — XLA inserts
all-reduce/reduce-scatter over ICI from NamedSharding annotations.

Axes:
  data   — batch / calibration-sample parallelism (DCN-friendly)
  tensor — Megatron-style tensor parallelism within a slice (ICI)
  expert — expert parallelism for MoE (optional third axis)
  pipe   — pipeline (layer-stage) parallelism (optional; see
           parallel/pipeline.py). Only added to the mesh when > 1 so
           existing (data, expert, tensor) callers see the same axis set.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def build_mesh(
    tensor: int = 1,
    data: Optional[int] = None,
    expert: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % (tensor * expert * pipe):
            raise ValueError(
                f"{n} devices not divisible by tensor={tensor} x "
                f"expert={expert} x pipe={pipe}")
        data = n // (tensor * expert * pipe)
    if data * tensor * expert * pipe != n:
        raise ValueError(
            f"mesh {data}x{pipe}x{expert}x{tensor} != {n} devices"
        )
    if pipe > 1:
        arr = np.asarray(devices).reshape(data, pipe, expert, tensor)
        return Mesh(arr, axis_names=("data", "pipe", "expert", "tensor"))
    arr = np.asarray(devices).reshape(data, expert, tensor)
    return Mesh(arr, axis_names=("data", "expert", "tensor"))


def single_device_mesh() -> Mesh:
    return build_mesh(tensor=1, data=1)
