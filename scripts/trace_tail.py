#!/usr/bin/env python
"""Attribute the WHOLE device trace to source locations: compile fwd+bwd,
build an HLO op-name -> source map, then group traced durations by
source file:line. Answers "where do the ~20 ms of diffuse tail go".
"""

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
    max_instances = 1_019_904
    max_rows = 425_984
    max_krows = 13_312

    @jax.jit
    def fwd_bwd(p):
        def loss_fn(params):
            out = render(
                cam, p.with_params(params).render_inputs(3), bg,
                mode="tiled", max_instances=max_instances, backend="pallas",
                max_row_instances=max_rows, max_kernel_rows=max_krows,
            )
            image = out["render"]
            return 0.8 * l1_loss(image, gt) + 0.2 * (1 - ssim(image, gt))
        return jax.value_and_grad(loss_fn)(p.params())

    # op name -> source location from the compiled HLO
    txt = fwd_bwd.lower(pool).compile().as_text()
    src_of = {}
    pat = re.compile(
        r'%?([\w.\-]+) = .*?source_file="([^"]+)" source_line=(\d+)'
    )
    for line in txt.splitlines():
        m = pat.search(line)
        if m:
            name, f, ln = m.groups()
            src_of[name] = f"{os.path.basename(f)}:{ln}"

    r = fwd_bwd(pool)
    jax.block_until_ready(r)
    trace_dir = "/tmp/raster_trace_tail"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
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

    by_src = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        if "TPU" not in pname or "XLA Ops" not in tname:
            continue
        dur = e.get("dur", 0) / 1e3
        src = src_of.get(e["name"], "<unmapped:" + e["name"][:28] + ">")
        by_src[src] += dur
        total += dur
    print(f"== per-source device ms over 3 steps (total {total:.1f}, "
          f"{total/3:.1f}/step)")
    for src, dur in sorted(by_src.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/3:9.3f}  {src}")


if __name__ == "__main__":
    main()
