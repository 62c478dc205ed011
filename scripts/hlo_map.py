#!/usr/bin/env python
"""Map hot HLO op names from the trace to source locations: compile the
fwd+bwd step, dump HLO, grep the ops of interest with their metadata."""

import math
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_GAUSSIANS = 100_000
WIDTH, HEIGHT = 1920, 1080
_args = sys.argv[1:]
if _args and _args[0].isdigit():  # leading numeric arg = Gaussian count
    N_GAUSSIANS = int(_args.pop(0))
OPS = _args or [
    "fusion.20", "sort.9", "while.38", "dynamic-slice_bitcast_fusion.2",
    "multiply_reduce_fusion", "constant_dynamic-slice_fusion.2",
    "pad_maximum_fusion", "fusion.11", "copy.220", "copy.219", "fusion.12",
    "fusion.32", "sort.34", "copy.222", "while.41", "fusion.197",
]


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
    fovx = math.radians(60)
    fovy = focal2fov(fov2focal(fovx, WIDTH), HEIGHT)
    cam = Camera.from_Rt(
        np.eye(3), np.array([0.0, 0.0, 4.5]), fovx, fovy, WIDTH, HEIGHT
    )
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    # same converged-capture statistics + bucket pre-pass as trace_raster
    shrink = math.log((N_GAUSSIANS / 100_000.0) ** (1.0 / 3.0))
    log_s = rng.uniform(
        -5.2 - shrink, -3.6 - shrink, (N_GAUSSIANS, 3)
    ).astype(np.float32)
    opac_logit = rng.uniform(-1.0, 4.0, (N_GAUSSIANS, 1)).astype(np.float32)
    pool = pool.replace(
        scaling=pool.scaling.at[:].set(jnp.asarray(log_s)),
        opacity=pool.opacity.at[:].set(jnp.asarray(opac_logit)),
    )
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
    rows0 = int(row_count(
        proj0["mean2d"], proj0["radius"], valid0, WIDTH, HEIGHT))
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

    txt = fwd_bwd.lower(pool).compile().as_text()
    lines = txt.splitlines()
    for op in OPS:
        pat = re.compile(r"^\s*%?" + re.escape(op) + r"\b\s*=")
        hits = [i for i, l in enumerate(lines) if pat.search(l)]
        print(f"===== {op}: {len(hits)} definition(s)")
        for i in hits:
            line = lines[i]
            m = re.search(r'metadata=\{[^}]*\}', line)
            head = line.split(" metadata=")[0][:220]
            print("  ", head)
            if m:
                print("    ", m.group(0)[:400])
            # fusions: show the computation's root + a few ops w/ metadata
            cm = re.search(r"calls=(%?[\w.\-]+)", line)
            if cm:
                comp = cm.group(1).lstrip("%")
                crx = re.compile(r"^\s*(ROOT\s+)?%?" + re.escape(comp) + r"\b")
                for j, l2 in enumerate(lines):
                    if crx.search(l2) and "{" in l2 and "=" not in l2.split("{")[0]:
                        k = j
                        metas = []
                        while k < len(lines) and "}" != lines[k].strip():
                            mm = re.search(r'op_name="([^"]+)"', lines[k])
                            if mm:
                                metas.append(mm.group(1))
                            k += 1
                            if k - j > 400:
                                break
                        uniq = []
                        for x in metas:
                            if x not in uniq:
                                uniq.append(x)
                        for x in uniq[:12]:
                            print("      op:", x[:200])
                        break


if __name__ == "__main__":
    main()
