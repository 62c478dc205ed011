#!/usr/bin/env python
"""Synthesize a train.py --start_checkpoint .npz from a saved PLY snapshot.

The round-3 flagship run was stopped at iteration 3000 by the round
clock and saved only the PLY (no .npz checkpoint in its
checkpoint_iterations). This rebuilds a resumable TrainState from the
PLY: params from the snapshot, fresh Adam moments/zeroed densify stats
(a mild optimizer transient vs a true checkpoint — the reference resume
keeps Adam state, /root/reference/train.py:38-44 — but exact for the
params), sh_degree from the schedule at that iteration, and
spatial_lr_scale recomputed from the dataset's camera extent exactly as
a fresh run would.

Usage: python scripts/make_resume_ckpt.py <point_cloud.ply> <dataset_dir>
       <iteration> <out.npz> [sh_degree=3] [capacity=-1]

capacity=-1 picks ceil(1.6*n) rounded to 4096; pass the original run's
capacity explicitly to reuse its compile tuple (the remote compile
service caches per (sh_degree, capacity, bucket) shape).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if len(sys.argv) < 5:
        print(__doc__, file=sys.stderr)
        raise SystemExit(1)
    ply_path, source, iteration, out = sys.argv[1:5]
    iteration = int(iteration)
    sh_degree = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    capacity_arg = int(sys.argv[6]) if len(sys.argv) > 6 else -1

    import jax

    jax.config.update("jax_platforms", "cpu")

    from sgs_tpu.data.ply import load_gaussian_ply
    from sgs_tpu.data.scene import Scene, pool_from_arrays
    from sgs_tpu.models.gaussians import DensifyStats
    from sgs_tpu.train.checkpoint import save_checkpoint
    from sgs_tpu.train.loop import TrainState
    from sgs_tpu.train.optim import AdamState
    from sgs_tpu.utils.config import ModelParams

    arrays = load_gaussian_ply(ply_path, sh_degree)
    n = arrays["xyz"].shape[0]
    capacity = capacity_arg if capacity_arg > 0 else -(-int(n * 1.6) // 4096) * 4096
    if capacity < n:
        raise SystemExit(f"capacity {capacity} < n {n}")
    pool = pool_from_arrays(arrays, sh_degree, capacity=capacity)
    print(f"# {n} gaussians -> capacity {capacity}", file=sys.stderr)

    args = ModelParams(source_path=source, sh_degree=sh_degree, eval=True)
    scene = Scene(args, load_iteration=None, shuffle=False)
    spatial_lr_scale = float(scene.cameras_extent)
    print(f"# spatial_lr_scale {spatial_lr_scale:.4f}", file=sys.stderr)

    active_sh = min(sh_degree, iteration // 1000)
    state = TrainState(
        pool=pool,
        adam=AdamState.init(pool.params()),
        stats=DensifyStats.zeros(pool.capacity),
    )
    save_checkpoint(out, state, iteration, active_sh, spatial_lr_scale)
    print(f"# wrote {out} at iteration {iteration}, "
          f"active_sh {active_sh}", file=sys.stderr)


if __name__ == "__main__":
    main()
