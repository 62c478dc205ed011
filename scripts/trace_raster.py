#!/usr/bin/env python
"""Device-side attribution: run fwd+bwd under jax.profiler, parse the
perfetto trace, and print per-op device durations. The tunnel's RPC
latency poisons host-side blocking timers; device trace events are the
only trustworthy per-stage numbers.
"""

import glob
import gzip
import json
import math
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_GAUSSIANS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
WIDTH, HEIGHT = 1920, 1080


def main():
    import jax
    import jax.numpy as jnp

    from sgs_tpu.core.camera import Camera
    from sgs_tpu.core.projection import focal2fov, fov2focal
    from sgs_tpu.models.gaussians import GaussianPool
    from sgs_tpu.ops.ssim import l1_loss
    from sgs_tpu.render.pipeline import render

    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(N_GAUSSIANS, 3)) * 0.6).astype(np.float32)
    cols = rng.uniform(size=(N_GAUSSIANS, 3)).astype(np.float32)
    pool = GaussianPool.from_pcd(
        pts, cols, 3, capacity=N_GAUSSIANS,
        knn_dist2=np.full((N_GAUSSIANS,), 1e-4, np.float32),
    )
    # converged-capture statistics: splat size ~ N^(-1/3) (bench_scale.py)
    shrink = math.log((N_GAUSSIANS / 100_000.0) ** (1.0 / 3.0))
    log_s = rng.uniform(
        -5.2 - shrink, -3.6 - shrink, (N_GAUSSIANS, 3)
    ).astype(np.float32)
    opac_logit = rng.uniform(-1.0, 4.0, (N_GAUSSIANS, 1)).astype(np.float32)
    pool = pool.replace(
        scaling=pool.scaling.at[:].set(jnp.asarray(log_s)),
        opacity=pool.opacity.at[:].set(jnp.asarray(opac_logit)),
    )

    fovx = math.radians(60)
    fovy = focal2fov(fov2focal(fovx, WIDTH), HEIGHT)
    cam = Camera.from_Rt(
        np.eye(3), np.array([0.0, 0.0, 4.5]), fovx, fovy, WIDTH, HEIGHT
    )
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    # tight binning buckets (matches bench.py)
    from sgs_tpu.core.projection import project_gaussians
    from sgs_tpu.render.tiled import (
        instance_count_tight, kernel_row_count, row_count,
    )
    proj0 = project_gaussians(
        pool.xyz, pool.get_covariance(), cam.world_view_transform,
        cam.full_proj_transform, cam.tanfovx, cam.tanfovy, WIDTH, HEIGHT,
    )
    valid0 = (proj0["radius"] > 0) & pool.alive
    inputs0 = pool.render_inputs(0)
    rows0 = int(row_count(proj0["mean2d"], proj0["radius"], valid0, WIDTH, HEIGHT))
    max_rows = -(-int(rows0 * 1.25) // 4096) * 4096
    total0 = int(instance_count_tight(
        proj0["mean2d"], proj0["conic"], inputs0.opacities[..., 0],
        proj0["depth"], proj0["radius"], valid0, WIDTH, HEIGHT, max_rows))
    max_instances = -(-int(total0 * 1.25) // 4096) * 4096
    krows0 = int(kernel_row_count(
        proj0["mean2d"], proj0["conic"], inputs0.opacities[..., 0],
        proj0["depth"], proj0["radius"], valid0, WIDTH, HEIGHT,
        max_instances, max_rows))
    max_krows = -(-int(krows0 * 1.15) // 512) * 512
    print(f"buckets: inst {max_instances} rows {max_rows} krows {max_krows}")

    @jax.jit
    def fwd_bwd(p):
        def loss_fn(params):
            out = render(
                cam, p.with_params(params).render_inputs(3), bg,
                mode="tiled", max_instances=max_instances, backend="pallas",
                max_row_instances=max_rows, max_kernel_rows=max_krows,
            )
            return l1_loss(out["render"], gt)
        return jax.value_and_grad(loss_fn)(p.params())

    r = fwd_bwd(pool)
    jax.block_until_ready(r)

    trace_dir = "/tmp/raster_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            r = fwd_bwd(pool)
        jax.block_until_ready(r)

    # parse perfetto trace
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print("NO TRACE FILE FOUND; contents:")
        for p in glob.glob(os.path.join(trace_dir, "**", "*"), recursive=True):
            print(" ", p)
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # find device lanes (TensorFlow Op / XLA Ops threads on the TPU device)
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        if "XLA Ops" not in tname:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_op[e["name"]] += dur
        total += dur
    print(f"== device XLA op durations over 3 steps (ms), total {total:.1f}")
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:90]:
        print(f"{dur/3:9.3f}  {name[:110]}")
    print("(lane names seen:", sorted(set(tid_names.values()))[:20], ")")


if __name__ == "__main__":
    main()
