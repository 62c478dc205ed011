#!/usr/bin/env python
"""Hybrid (data x gauss) vs pure-DP train-step overhead on the virtual
8-device CPU mesh, plus a collective/overlap audit of the compiled HLO.

BASELINE.json's north-star clause asks for parameter gradients
all-reduced over ICI *overlapped* with the backward tile loop. In the
XLA/GSPMD design that overlap is not hand-scheduled: GSPMD inserts the
collectives the shardings imply, and on TPU the latency-hiding scheduler
(LHS) splits each into an async start/done pair and hoists compute
between them. What WE control is the dependency structure: the psums
must not be funneled through one late fused op that depends on the whole
backward. This script verifies that structure on the compiled module:

  1. wall-clock per step, DP(8) vs hybrid(2x4), same total camera batch
  2. per-collective census of the optimized HLO (op kind x count)
  3. schedule audit: positions of the param-grad all-reduces in the
     instruction order vs the last rasterizer backward op — collectives
     that appear BEFORE later backward compute are overlappable (the LHS
     can sink the -done); ones pinned at the very end are not.

CPU HLO keeps collectives synchronous, so this measures structure, not
ICI time; the numbers quantify orchestration overhead (extra gathers,
band assembly) which rides on top of whatever the real mesh adds.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax.numpy as jnp
import numpy as np

WIDTH = HEIGHT = 128
N, CAP = 3000, 4096
ITERS = 8


def build():
    from sgs_tpu.core.camera import Camera
    from sgs_tpu.core.projection import focal2fov, fov2focal
    from sgs_tpu.models.gaussians import GaussianPool

    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(-1, 1, N), rng.uniform(-1, 1, N), rng.uniform(2.5, 6, N)],
        -1,
    ).astype(np.float32)
    cols = rng.uniform(size=(N, 3)).astype(np.float32)
    pool = GaussianPool.from_pcd(pts, cols, 1, capacity=CAP)
    fovx = math.radians(60)
    fovy = focal2fov(fov2focal(fovx, WIDTH), HEIGHT)
    cams, gts = [], []
    for i in range(8):
        th = 2 * math.pi * i / 8
        R = np.array(
            [
                [math.cos(th), 0, math.sin(th)],
                [0, 1, 0],
                [-math.sin(th), 0, math.cos(th)],
            ]
        )
        cams.append(
            Camera.from_Rt(
                R, np.array([0.0, 0.0, 3.5]), fovx, fovy, WIDTH, HEIGHT
            )
        )
        gts.append(rng.uniform(size=(3, HEIGHT, WIDTH)).astype(np.float32))
    return pool, cams, np.stack(gts)


def time_steps(step, state, cam_b, gt_b, bg, lrs):
    state2, m = step(state, cam_b, gt_b, bg, lrs)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state2, m = step(state2, cam_b, gt_b, bg, lrs)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / ITERS * 1e3


def audit_hlo(lowered_compiled, tag):
    """Collective census + schedule positions from the optimized HLO."""
    txt = lowered_compiled.as_text()
    lines = txt.splitlines()
    kinds = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
             "collective-permute")
    census = {k: sum(k in ln and "done" not in ln for ln in lines)
              for k in kinds}
    # schedule audit inside the main computation: where do collectives
    # sit relative to the LAST fusion (≈ end of backward + update)?
    idx = [i for i, ln in enumerate(lines)
           if any(k in ln for k in kinds) and "=" in ln]
    fus = [i for i, ln in enumerate(lines) if " fusion(" in ln or " fusion." in ln]
    frac = (
        [round((i - min(fus)) / max(1, max(fus) - min(fus)), 3) for i in idx]
        if fus and idx else []
    )
    return {"tag": tag, "census": census,
            "collective_positions_0to1_of_compute": frac[:24]}


def main():
    from sgs_tpu.parallel.data_parallel import (
        make_dp_train_step,
        replicate_state,
        shard_camera_batch,
        stack_cameras,
    )
    from sgs_tpu.parallel.hybrid import (
        band_bucket_sample,
        make_hybrid_train_step,
        place_hybrid_state,
        shard_hybrid,
    )
    from sgs_tpu.parallel.mesh import make_mesh
    from sgs_tpu.models.gaussians import DensifyStats
    from sgs_tpu.train.loop import TrainState, instance_bucket_sample
    from sgs_tpu.train.optim import AdamState, make_lr_dict

    import random

    pool, cams, gts = build()
    bg = jnp.zeros(3)
    lrs = {
        "xyz": jnp.float32(1e-4), "features_dc": jnp.float32(2.5e-3),
        "features_rest": jnp.float32(1.25e-4), "opacity": jnp.float32(0.05),
        "scaling": jnp.float32(5e-3), "rotation": jnp.float32(1e-3),
    }
    py_rng = random.Random(0)
    adam = AdamState.init(pool.params())
    stats = DensifyStats.zeros(pool.capacity)
    state0 = TrainState(pool=pool, adam=adam, stats=stats)
    inst_b = instance_bucket_sample(pool, cams, py_rng)

    results = []

    # ---- pure DP over 8 devices (batch 8) ----
    mesh = make_mesh((8,), ("data",))
    state = replicate_state(state0, mesh)
    cam_batch = stack_cameras(cams)
    cam_b, gt_b = shard_camera_batch(cam_batch, jnp.asarray(gts), mesh)
    step = make_dp_train_step(
        mesh, 1, mode="tiled", max_instances=inst_b, backend="xla"
    )
    ms = time_steps(step, state, cam_b, gt_b, bg, lrs)
    results.append({"mode": "dp8", "step_ms": round(ms, 2)})

    # ---- hybrid 2x4 (batch 2, 4 gauss shards) ----
    mesh = make_mesh((2, 4), ("data", "gauss"))
    state = place_hybrid_state(state0, mesh)
    band_b = band_bucket_sample(pool, cams, py_rng, 4, tight=False)
    cam_batch = stack_cameras(cams[:2])
    cam_b, gt_b = shard_camera_batch(cam_batch, jnp.asarray(gts[:2]), mesh)
    step = make_hybrid_train_step(
        mesh, 1, WIDTH, HEIGHT, max_instances_per_band=band_b, backend="xla"
    )
    ms = time_steps(step, state, cam_b, gt_b, bg, lrs)
    # per-camera normalization: dp8 does 8 cameras/step, hybrid 2
    results.append({"mode": "hybrid2x4", "step_ms": round(ms, 2),
                    "band_bucket": band_b})

    # ---- hybrid 2x4 + band record compaction (round 4) ----
    from sgs_tpu.parallel.hybrid import band_record_cap

    # floor=512: the trainer's default 4096 floor would clamp to the
    # toy pool's full capacity and compaction would be a no-op pad
    rec_cap = band_record_cap(pool, cams, py_rng, 4, floor=512)
    step_c = make_hybrid_train_step(
        mesh, 1, WIDTH, HEIGHT, max_instances_per_band=band_b,
        backend="xla", band_rec_cap=rec_cap,
    )
    ms_c = time_steps(step_c, state, cam_b, gt_b, bg, lrs)
    results.append({"mode": "hybrid2x4_compact", "step_ms": round(ms_c, 2),
                    "band_rec_cap": rec_cap})

    lowered = step_c.lower(state, cam_b, gt_b, bg, lrs).compile()
    audit = audit_hlo(lowered, "hybrid2x4_compact")

    for r in results:
        print(json.dumps(r))
    print(json.dumps(audit))
    dp_ms, hy_ms = results[0]["step_ms"], results[1]["step_ms"]
    hyc_ms = results[2]["step_ms"]
    print(json.dumps({
        "per_camera_ms": {"dp8": round(dp_ms / 8, 2),
                          "hybrid2x4": round(hy_ms / 2, 2),
                          "hybrid2x4_compact": round(hyc_ms / 2, 2)},
        "hybrid_overhead_x": round((hy_ms / 2) / (dp_ms / 8), 2),
        "hybrid_compact_overhead_x": round((hyc_ms / 2) / (dp_ms / 8), 2),
    }))


if __name__ == "__main__":
    main()
