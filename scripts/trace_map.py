#!/usr/bin/env python
"""Full device-trace attribution for the production fwd+bwd step:
per-op durations joined with the compiled HLO's op_name scope + source
location, so every fusion/copy/sort in the frame is identifiable.
Prints ops sorted by time with cumulative percentage."""

import glob
import gzip
import json
import math
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_GAUSSIANS = 100_000
WIDTH, HEIGHT = 1920, 1080
STEPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from sgs_tpu.core.camera import Camera
    from sgs_tpu.core.projection import focal2fov, fov2focal
    from sgs_tpu.models.gaussians import GaussianPool
    from sgs_tpu.ops.ssim import l1_loss, ssim
    from sgs_tpu.render.pipeline import render

    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(N_GAUSSIANS, 3)) * 0.6).astype(np.float32)
    cols = rng.uniform(size=(N_GAUSSIANS, 3)).astype(np.float32)
    pool = GaussianPool.from_pcd(
        pts, cols, 3, capacity=N_GAUSSIANS,
        knn_dist2=np.full((N_GAUSSIANS,), 1e-4, np.float32),
    )
    log_s = rng.uniform(-5.2, -3.6, (N_GAUSSIANS, 3)).astype(np.float32)
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
    hr = float(os.environ.get("TRACE_HEADROOM", "1.25"))
    max_rows = -(-int(rows0 * hr) // 4096) * 4096
    total0 = int(instance_count_tight(
        proj0["mean2d"], proj0["conic"], inputs0.opacities[..., 0],
        proj0["depth"], proj0["radius"], valid0, WIDTH, HEIGHT, max_rows))
    max_instances = -(-int(total0 * hr) // 4096) * 4096
    krows0 = int(kernel_row_count(
        proj0["mean2d"], proj0["conic"], inputs0.opacities[..., 0],
        proj0["depth"], proj0["radius"], valid0, WIDTH, HEIGHT,
        max_instances, max_rows))
    khr = float(os.environ.get("TRACE_KHEADROOM", "1.15"))
    max_krows = -(-int(krows0 * khr) // 512) * 512
    print(f"buckets: inst {max_instances} rows {max_rows} krows {max_krows}")

    use_ssim = os.environ.get("TRACE_SSIM", "0") == "1"

    @jax.jit
    def fwd_bwd(p):
        def loss_fn(params):
            out = render(
                cam, p.with_params(params).render_inputs(3), bg,
                mode="tiled", max_instances=max_instances, backend="pallas",
                max_row_instances=max_rows, max_kernel_rows=max_krows,
            )
            if use_ssim:
                return 0.8 * l1_loss(out["render"], gt) + 0.2 * (
                    1.0 - ssim(out["render"], gt)
                )
            return l1_loss(out["render"], gt)
        return jax.value_and_grad(loss_fn)(p.params())

    # op name -> (source, op_name scope) from the compiled HLO
    txt = fwd_bwd.lower(pool).compile().as_text()
    src_of = {}
    pat = re.compile(r"%?([\w.\-]+) = ")
    mpat = re.compile(r'op_name="([^"]*)"')
    spat = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
    for line in txt.splitlines():
        m = pat.search(line)
        if not m:
            continue
        name = m.group(1)
        scope = mpat.search(line)
        src = spat.search(line)
        scope_s = scope.group(1) if scope else ""
        src_s = f"{os.path.basename(src.group(1))}:{src.group(2)}" if src else ""
        if scope_s or src_s:
            src_of[name] = (src_s, scope_s)

    r = fwd_bwd(pool)
    jax.block_until_ready(r)
    trace_dir = "/tmp/raster_trace_map"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(STEPS):
            r = fwd_bwd(pool)
        jax.block_until_ready(r)

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_names, tid_names = {}, {}
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
        pname = pid_names.get(e.get("pid"), "")
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        if "TPU" not in pname or "XLA Ops" not in tname:
            continue
        dur = e.get("dur", 0) / 1e3
        by_op[e["name"]] += dur
        total += dur
    print(f"== per-op device ms/step (total {total/STEPS:.2f})")
    cum = 0.0
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:70]:
        cum += dur
        src, scope = src_of.get(name, ("?", "?"))
        scope_tail = "/".join(scope.split("/")[-2:])[-70:]
        print(
            f"{dur/STEPS:8.3f} {100*cum/total:5.1f}%  {name[:28]:28s} "
            f"{src:26s} {scope_tail}"
        )


if __name__ == "__main__":
    main()
