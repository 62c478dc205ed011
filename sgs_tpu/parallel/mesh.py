"""Device mesh construction for multi-chip / multi-host training.

The reference is single-GPU (SURVEY.md §2 parallelism checklist: no
torch.distributed anywhere); every distributed capability here is new
TPU-native design: meshes over ICI (+DCN for multi-host via
create_hybrid_device_mesh), shard_map-partitioned train steps, psum
gradient reduction.

Axis conventions:
  "data"  — camera/pixel-level data parallelism (batch of views per step)
  "gauss" — Gaussian-primitive sharding (preprocess/KNN fan-out)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"mesh wants {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(axis_sizes)
    return Mesh(arr, axis_names)


def make_hybrid_mesh(axis_names: Sequence[str] = ("data", "gauss")) -> Mesh:
    """Multi-host 2D mesh: the first axis spans hosts over DCN, the second
    spans each host's chips over ICI — so the heavy splat-record
    all_gather (gauss axis) rides ICI while the lighter camera-batch
    gradient reduction (data axis) crosses DCN (scaling-book recipe)."""
    from jax.experimental.mesh_utils import create_hybrid_device_mesh

    n_hosts = jax.process_count()
    local = jax.local_device_count()
    if n_hosts == 1:
        return make_mesh((1, local), axis_names)
    # Granule choice: create_hybrid_device_mesh defaults to grouping by
    # TPU slice_index, but multi-host-single-slice topologies (a v5e pod
    # spans hosts within ONE slice) and CPU processes have fewer slices
    # than processes — group by process instead so the DCN axis always
    # matches process_count (found by the real 2-process run in
    # scripts/multihost_smoke.py; the mocked-process unit test hid it).
    slices = {getattr(d, "slice_index", 0) for d in jax.devices()}
    dev = create_hybrid_device_mesh(
        mesh_shape=(1, local), dcn_mesh_shape=(n_hosts, 1),
        process_is_granule=len(slices) < n_hosts,
    )
    return Mesh(dev, axis_names)
