#!/usr/bin/env python
"""Headline benchmark: 1080p fwd+bwd frames/sec on one TPU chip.

Renders + differentiates a trained-scale Gaussian scene at 1920x1080
through the current production render path and reports frames/sec for a
full forward+backward (the BASELINE.md target is >= 30 fps @ 1080p/chip).

Scene selection:
  * default: the committed flagship trained snapshot
    (assets/flagship/point_cloud.ply) — an ACTUALLY-TRAINED model.
  * --ply <point_cloud.ply>: any reference-format 3DGS PLY.
  * --synthetic: 100k synthetic Gaussians with converged-model statistics.

Resilience: the remote-compile service behind the axon tunnel is known to
flake transiently (round-3 post-mortem: the driver's official bench run
died rc=1 inside a pre-pass compile). Every jitted call here is wrapped
in a retry with backoff, and if the PLY scene fails outright the bench
falls back to the synthetic scene so a number is ALWAYS recorded. The
metric name is stable across rounds; the scene is reported in a separate
"scene" field.

Prints the headline JSON line on stdout, then a render-only
(forward, no grad) line — the metric the reference's abstract actually
states: real-time novel-view RENDERING >= 30 fps @1080p
(/root/reference/README.md:14) — then (unless --headline_only or the
scale run fails) a line for the BASELINE configs[2] garden-scale
workload — 5M Gaussians @1080p, panning-capture geometry with
visibility compaction (scripts/bench_scale.py --capture) — so the
driver's BENCH record captures the target workload every round
(VERDICT r4 weak #6):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "scene": ...}
"""

import json
import math
import sys
import time
import traceback

import numpy as np

N_GAUSSIANS = 100_000
WIDTH, HEIGHT = 1920, 1080
WARMUP, ITERS = 2, 10
BASELINE_FPS = 30.0
RETRIES = 3
RETRY_SLEEP_S = 20.0


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _retry(label, fn, *args, **kwargs):
    """Run fn with retries: the remote-compile tunnel flakes transiently."""
    last = None
    for attempt in range(1, RETRIES + 1):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — deliberate: record + retry
            last = e
            _log(f"# {label}: attempt {attempt}/{RETRIES} failed: "
                 f"{type(e).__name__}: {e}")
            if attempt < RETRIES:
                time.sleep(RETRY_SLEEP_S * attempt)
    raise last


def _build_ply_scene(ply_path):
    """(pool, cam) from a trained PLY snapshot, camera auto-framed."""
    from sgs_tpu.core.camera import Camera
    from sgs_tpu.core.projection import focal2fov, fov2focal
    from sgs_tpu.data.ply import load_gaussian_ply
    from sgs_tpu.data.scene import pool_from_arrays

    arrays = load_gaussian_ply(ply_path, 3)
    n = arrays["xyz"].shape[0]
    pool = pool_from_arrays(arrays, 3, capacity=-(-n // 4096) * 4096)
    center = arrays["xyz"].mean(axis=0)
    radius = float(
        np.percentile(np.linalg.norm(arrays["xyz"] - center, axis=1), 97)
    )
    _log(f"# ply model: {n} gaussians, extent r={radius:.2f}")
    fovx = math.radians(60)
    fovy = focal2fov(fov2focal(fovx, WIDTH), HEIGHT)
    # frame the bounding sphere at ~2.2 radii (typical capture orbit)
    dist = 2.2 * max(radius, 1e-3)
    cam = Camera.from_Rt(
        np.eye(3), np.array([-center[0], -center[1], -center[2] + dist]),
        fovx, fovy, WIDTH, HEIGHT,
    )
    return pool, cam


def _build_synthetic_scene():
    """(pool, cam): 100k synthetic Gaussians, converged-model statistics."""
    import jax.numpy as jnp

    from sgs_tpu.core.camera import Camera
    from sgs_tpu.core.projection import focal2fov, fov2focal
    from sgs_tpu.models.gaussians import GaussianPool

    rng = np.random.default_rng(0)
    # trained-model statistics: small anisotropic splats (screen footprint
    # ~1-2 tiles) with mostly-opaque alphas, object ~2 units across viewed
    # from ~4.5 units — matching converged capture scenes rather than the
    # fat isotropic 3-NN init state.
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
    return pool, cam


def _measure(pool, cam):
    """Compile + time ITERS fwd+bwd frames; every jitted call retried."""
    import jax
    import jax.numpy as jnp

    from sgs_tpu.core.projection import project_gaussians
    from sgs_tpu.ops.ssim import l1_loss
    from sgs_tpu.render.pipeline import render
    from sgs_tpu.render.tiled import (
        instance_count_tight,
        kernel_row_count,
        row_count,
    )

    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    # size the instance + row buffers from count pre-passes, tight (exact
    # ellipse/tile) binning — the production path. Headroom is 1.05-1.08x:
    # the scene and camera are FIXED here, so the pre-pass counts are
    # exact and every instance-scale op (fills, sorts, gathers, kernel
    # DMA) scales with the bucket; the trainer uses larger headroom +
    # overflow-regrow because its counts vary per camera.
    proj = _retry(
        "projection pre-pass",
        lambda: jax.block_until_ready(project_gaussians(
            pool.xyz, pool.get_covariance(), cam.world_view_transform,
            cam.full_proj_transform, cam.tanfovx, cam.tanfovy, WIDTH, HEIGHT,
        )),
    )
    valid = (proj["radius"] > 0) & pool.alive
    inputs = pool.render_inputs(0)
    rows = int(_retry(
        "row-count pre-pass",
        lambda: row_count(proj["mean2d"], proj["radius"], valid,
                          WIDTH, HEIGHT),
    ))
    max_rows = -(-int(rows * 1.08) // 4096) * 4096
    total = int(_retry(
        "instance-count pre-pass",
        lambda: instance_count_tight(
            proj["mean2d"], proj["conic"], inputs.opacities[..., 0],
            proj["depth"], proj["radius"], valid, WIDTH, HEIGHT, max_rows,
        ),
    ))
    max_instances = -(-int(total * 1.08) // 4096) * 4096
    krows = int(_retry(
        "kernel-row-count pre-pass",
        lambda: kernel_row_count(
            proj["mean2d"], proj["conic"], inputs.opacities[..., 0],
            proj["depth"], proj["radius"], valid, WIDTH, HEIGHT,
            max_instances, max_rows,
        ),
    ))
    max_krows = -(-int(krows * 1.05) // 512) * 512
    _log(f"# instances: {total} (capacity {max_instances}, "
         f"rows {rows}/{max_rows}, kernel rows {krows}/{max_krows})")

    def render_fn(params):
        return render(
            cam, pool.with_params(params).render_inputs(3), bg,
            mode="tiled", max_instances=max_instances, backend="pallas",
            max_row_instances=max_rows, max_kernel_rows=max_krows,
        )["render"]

    def loss_fn(params):
        return l1_loss(render_fn(params), gt)

    # ITERS full fwd+bwd frames in ONE dispatch (lax.scan): dispatching
    # each frame separately pays the axon tunnel's per-call RPC overhead
    # (~10 ms/frame host-side, vs 68 ms device time — device-trace
    # verified with scripts/trace_map.py). The tiny parameter update
    # threads a data dependency through the scan so XLA cannot hoist the
    # loop-invariant render out of the loop; 1e-12 perturbations do not
    # change instance counts.
    @jax.jit
    def bench_scan(params):
        def body(prm, _):
            loss, grads = jax.value_and_grad(loss_fn)(prm)
            prm2 = jax.tree.map(lambda a, g: a - 1e-12 * g, prm, grads)
            return prm2, loss
        _, losses = jax.lax.scan(body, params, None, length=ITERS)
        return losses

    # compile + warmup (retried: this is where the round-3 run died)
    _retry("bench-scan compile",
           lambda: jax.block_until_ready(bench_scan(pool.params())))

    t0 = time.perf_counter()
    losses = bench_scan(pool.params())
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / ITERS
    fwd_bwd_fps = 1.0 / dt

    # Forward-only novel-view rendering — the metric the reference's
    # abstract actually states (>=30 fps @1080p, /root/reference/
    # README.md:14 measures VIEWING, not training). Same production
    # path, no grad. A tiny image-dependent perturbation threads a data
    # dependency so XLA cannot hoist the loop-invariant render.
    render_fps = None
    try:
        @jax.jit
        def view_scan(params):
            def body(prm, _):
                img = render_fn(prm)
                eps = 1e-12 * img[0, 0, 0]
                prm2 = jax.tree.map(lambda a: a + eps, prm)
                return prm2, img.sum()
            _, sums = jax.lax.scan(body, params, None, length=ITERS)
            return sums

        _retry("view-scan compile",
               lambda: jax.block_until_ready(view_scan(pool.params())))
        t0 = time.perf_counter()
        jax.block_until_ready(view_scan(pool.params()))
        render_fps = ITERS / (time.perf_counter() - t0)
    except Exception:  # noqa: BLE001 — the headline number stands alone
        _log("# render-only measure failed (headline unaffected):\n"
             + traceback.format_exc())
    return fwd_bwd_fps, render_fps


def main():
    ply_path = None
    scene = "synthetic_100k"
    if len(sys.argv) >= 3 and sys.argv[1] == "--ply":
        ply_path = sys.argv[2]
        scene = "ply"
    elif "--synthetic" not in sys.argv[1:]:
        # default to the committed flagship trained snapshot when present:
        # the recorded headline then measures an ACTUALLY-TRAINED model
        # (converged on the ray-traced honest-GT scene), not hand-tuned
        # synthetic statistics. `--synthetic` forces the old scene.
        import os
        _flagship = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "assets", "flagship", "point_cloud.ply",
        )
        if os.path.exists(_flagship):
            ply_path = _flagship
            scene = "flagship_ply"

    fps = render_fps = None
    if ply_path is not None:
        try:
            pool, cam = _build_ply_scene(ply_path)
            fps, render_fps = _measure(pool, cam)
        except Exception:  # noqa: BLE001 — fall back, never lose the round
            _log("# PLY scene failed after retries; falling back to "
                 "synthetic:\n" + traceback.format_exc())
            fps = None
    if fps is None:
        scene = "synthetic_100k"
        pool, cam = _build_synthetic_scene()
        fps, render_fps = _measure(pool, cam)

    print(
        json.dumps(
            {
                "metric": "1080p_fwd_bwd_frames_per_sec_per_chip",
                "value": round(fps, 4),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 4),
                "scene": scene,
            }
        ),
        flush=True,
    )

    if render_fps is not None:
        print(
            json.dumps(
                {
                    "metric": "1080p_render_only_frames_per_sec_per_chip",
                    "value": round(render_fps, 4),
                    "unit": "frames/s",
                    "vs_baseline": round(render_fps / BASELINE_FPS, 4),
                    "scene": scene,
                }
            ),
            flush=True,
        )

    if "--headline_only" in sys.argv[1:]:
        return
    try:
        import os

        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "scripts"),
        )
        import bench_scale

        r = _retry("5M garden scale",
                   lambda: bench_scale.run_config(5_000_000, capture=True))
        print(
            json.dumps(
                {
                    "metric": "garden5m_1080p_fwd_bwd_frames_per_sec_per_chip",
                    "value": r["fps"],
                    "unit": "frames/s",
                    "vs_baseline": round(r["fps"] / BASELINE_FPS, 4),
                    "scene": "synthetic_5m_panning_capture",
                }
            ),
            flush=True,
        )
    except Exception:  # noqa: BLE001 — the headline line is already out
        _log("# 5M scale line failed (headline already recorded):\n"
             + traceback.format_exc())


if __name__ == "__main__":
    main()
