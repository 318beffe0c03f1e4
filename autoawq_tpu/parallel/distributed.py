"""Multi-host initialization and hybrid ICI/DCN meshes.

The reference has no distributed backend at all (SURVEY §2.6 — its
multi-GPU story is accelerate's layer pipeline on one host). TPU-native
equivalent: ``jax.distributed`` process bootstrap plus a hybrid mesh whose
inner axes (``expert``, ``tensor``) ride the ICI torus within each slice
and whose ``data`` axis spans slices over DCN — collectives that cross
hosts are then only the cheap data-parallel ones (gradient/metric psum,
calibration statistics), never the per-layer tensor-parallel traffic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """``jax.distributed.initialize`` wrapper. With no arguments, relies on
    the cluster environment (TPU pods auto-discover via the metadata
    server; GKE/Slurm envs are detected by JAX). Safe to skip entirely on
    a single host."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def hybrid_mesh(tensor: int = 1, expert: int = 1,
                ici_data: Optional[int] = None,
                dcn_data: Optional[int] = None) -> Mesh:
    """(data, expert, tensor) mesh where ``tensor`` (and ``expert``) map to
    ICI-contiguous devices within each slice and the leading ``data``
    factor spans slices over DCN.

    ``dcn_data`` defaults to the process count (one slice per host group);
    ``ici_data`` to whatever remains within a slice.
    """
    from jax.experimental import mesh_utils

    n = jax.device_count()
    if dcn_data is None:
        dcn_data = max(1, jax.process_count())
    per_slice = n // dcn_data
    if ici_data is None:
        if per_slice % (tensor * expert):
            raise ValueError(
                f"{per_slice} per-slice devices not divisible by "
                f"tensor={tensor} x expert={expert}")
        ici_data = per_slice // (tensor * expert)
    if dcn_data * ici_data * expert * tensor != n:
        raise ValueError(
            f"mesh dcn{dcn_data} x ici{ici_data} x expert{expert} x "
            f"tensor{tensor} != {n} devices")

    if dcn_data > 1:
        try:
            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(ici_data, expert, tensor),
                dcn_mesh_shape=(dcn_data, 1, 1),
            )
        except ValueError:
            # devices without slice_index metadata (CPU meshes, emulated
            # runs): fall back to a row-major split — topology-oblivious
            # but shape-correct
            devices = np.asarray(jax.devices()).reshape(
                dcn_data, ici_data, expert, tensor)
    else:
        devices = mesh_utils.create_device_mesh((ici_data, expert, tensor))
        devices = devices[None]  # leading dcn axis of size 1
    arr = np.asarray(devices).reshape(dcn_data * ici_data, expert, tensor)
    return Mesh(arr, axis_names=("data", "expert", "tensor"))
