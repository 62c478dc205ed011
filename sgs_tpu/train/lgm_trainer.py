"""Latent/structured training loop — the train_lgm equivalent.

Mirrors /root/reference/train_lgm.py:37-192: requires sh_degree == 0, the
model is re-decoded every iteration before rendering (gradient flows
through the decoder into latents + structure params), densification and LR
scheduling are disabled, and a single Adam (lr = 1e-3/2, eps = 1e-15)
covers every parameter. Checkpoints store the full parameter pytree.
"""

from __future__ import annotations

import os
import random
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sgs_tpu.models.latent import LatentGaussianModel
from sgs_tpu.ops.ssim import l1_loss, psnr, ssim
from sgs_tpu.render.pipeline import render
from sgs_tpu.utils.config import ModelParams, OptimizationParams, PipelineParams, save_cfg_args

LGM_LR = 1.0e-3 / 2
LGM_EPS = 1e-15


def make_lgm_train_step(
    lambda_dssim: float, active_sh_degree: int, optimizer,
    mode: str = "tiled", max_instances: int = 0, backend: str = "xla",
    max_row_instances: int = 0, max_kernel_rows: int = 0,
):
    @jax.jit
    def step(params, opt_state, static_model, camera, gt_image, bg):
        def loss_fn(p):
            model = static_model.with_params(p)
            out = render(
                camera, model.render_inputs(active_sh_degree), bg,
                mode=mode, max_instances=max_instances or None,
                backend=backend, max_row_instances=max_row_instances,
                max_kernel_rows=max_kernel_rows,
            )
            image = out["render"]
            ll1 = l1_loss(image, gt_image)
            loss = (1 - lambda_dssim) * ll1 + lambda_dssim * (1 - ssim(image, gt_image))
            return loss, (ll1, out["overflow"])

        (loss, (ll1, ovf)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # non-finite gradient guard (see train/loop.py train_step)
        grads = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, ll1, ovf

    return step


def save_lgm_checkpoint(path: str, model: LatentGaussianModel, iteration: int) -> None:
    flat = jax.tree_util.tree_flatten_with_path(model.trainable_params())[0]
    arrays = {"iteration": np.asarray(iteration)}
    for keypath, leaf in flat:
        key = "/".join(str(k.key) if hasattr(k, "key") else str(k) for k in keypath)
        arrays[f"p:{key}"] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_lgm_checkpoint(path: str, model: LatentGaussianModel):
    z = np.load(path, allow_pickle=False)
    params = model.trainable_params()
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = []
    for keypath, leaf in flat:
        key = "/".join(str(k.key) if hasattr(k, "key") else str(k) for k in keypath)
        leaves.append(jnp.asarray(z[f"p:{key}"]))
    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), leaves
    )
    return model.with_params(params), int(z["iteration"])


def training_lgm(
    dataset: ModelParams,
    opt: OptimizationParams,
    pipe: PipelineParams,
    testing_iterations: List[int],
    saving_iterations: List[int],
    checkpoint_iterations: List[int],
    checkpoint_path: Optional[str] = None,
    scene=None,
    seed: int = 0,
    latent_size: int = 32,
    hidden_size: int = 32,
    gaussians_per_structure: int = 8,
    use_positional_embedding: bool = False,
    downsample_init: float = 1.0,
) -> LatentGaussianModel:
    from sgs_tpu.data.scene import Scene
    from sgs_tpu.data import ply as ply_io

    assert dataset.sh_degree == 0, "train_lgm requires sh_degree == 0"
    model_path = dataset.model_path
    os.makedirs(model_path, exist_ok=True)
    save_cfg_args(model_path, dataset)

    rng = jax.random.PRNGKey(seed)
    py_rng = random.Random(seed)

    # Scene loading for its cameras + point cloud; the pool it builds is
    # ignored (the LGM replaces it) so keep capacity tiny-ish.
    if scene is None:
        scene = Scene(dataset, downsample_init=downsample_init)
    # use the same (possibly downsampled) init cloud Scene fed its pool —
    # the reference hands the downsampled pcd to create_from_pcd directly
    pcd = getattr(scene, "init_pcd", None) or scene.scene_info.point_cloud
    pts = pcd.points
    cols = pcd.colors

    rng, sub = jax.random.split(rng)
    model = LatentGaussianModel.create(
        sub,
        np.zeros((1, 3), np.float32),
        sh_degree=dataset.sh_degree,
        latent_size=latent_size,
        hidden_size=hidden_size,
        gaussians_per_structure=gaussians_per_structure,
        use_positional_embedding=use_positional_embedding,
    )
    rng, sub = jax.random.split(rng)
    model = model.create_from_pcd(sub, pts, cols)
    print(f"Number of structures at initialisation : {model.num_structures}")

    first_iter = 0
    if checkpoint_path:
        model, first_iter = load_lgm_checkpoint(checkpoint_path, model)
        print(f"Restored LGM checkpoint at iteration {first_iter}")

    optimizer = optax.adam(LGM_LR, eps=LGM_EPS)
    params = model.trainable_params()
    opt_state = optimizer.init(params)
    active_sh_degree = dataset.sh_degree

    # instance bucket for the tiled rasterizer: the LGM never densifies
    # and splats mostly shrink during fitting, so a modest 1.5x headroom
    # over the (typically fat) initial footprint holds for the whole run
    raster_mode = getattr(pipe, "rasterizer", "tiled")
    from sgs_tpu.utils.config import resolve_raster_backend

    raster_backend = resolve_raster_backend(
        getattr(pipe, "raster_backend", "auto")
    )
    raster_tight = (
        getattr(pipe, "tight_culling", True) and raster_backend == "pallas"
    )
    max_instances = 0
    max_rows = 0
    max_krows = 0

    def compute_buckets(model_now):
        """Size the instance/row/kernel-row buckets from count pre-passes
        on the first train camera with the CURRENT decoded model."""
        import math as _math

        from sgs_tpu.core import transforms as _tr
        from sgs_tpu.core.projection import project_gaussians
        from sgs_tpu.render.tiled import (
            instance_count,
            instance_count_tight,
            kernel_row_count,
            row_count,
        )

        gi = model_now.render_inputs(active_sh_degree)
        cam0 = scene.getTrainCameras()[0].camera
        cov3d = _tr.build_covariance(gi.scales, gi.rotations)
        proj = project_gaussians(
            gi.means3d, cov3d, cam0.world_view_transform,
            cam0.full_proj_transform, cam0.tanfovx, cam0.tanfovy,
            cam0.image_width, cam0.image_height,
        )
        valid = proj["radius"] > 0
        b_rows = b_krows = 0
        if raster_tight:
            rows = int(row_count(
                proj["mean2d"], proj["radius"], valid,
                cam0.image_width, cam0.image_height,
            ))
            b_rows = 1 << _math.ceil(_math.log2(max(4096, int(rows * 1.5))))
            total = int(instance_count_tight(
                proj["mean2d"], proj["conic"], gi.opacities[..., 0],
                proj["depth"], proj["radius"], valid,
                cam0.image_width, cam0.image_height, b_rows,
            ))
        else:
            total = int(instance_count(
                proj["mean2d"], proj["radius"], valid,
                cam0.image_width, cam0.image_height,
            ))
        b_inst = 1 << _math.ceil(_math.log2(max(4096, int(total * 1.5))))
        if raster_tight:
            krows = int(kernel_row_count(
                proj["mean2d"], proj["conic"], gi.opacities[..., 0],
                proj["depth"], proj["radius"], valid,
                cam0.image_width, cam0.image_height, b_inst, b_rows,
            ))
            b_krows = -(-int(krows * 1.5) // 1024) * 1024
        return b_inst, b_rows, b_krows

    if raster_mode == "tiled":
        max_instances, max_rows, max_krows = compute_buckets(model)
        print(f"instance capacity bucket: {max_instances}"
              + (f" (tight; row bucket {max_rows}, kernel rows {max_krows})"
                 if raster_tight else ""))

    def build_step():
        return make_lgm_train_step(
            opt.lambda_dssim, active_sh_degree, optimizer,
            mode=raster_mode, max_instances=max_instances,
            backend=raster_backend, max_row_instances=max_rows,
            max_kernel_rows=max_krows,
        )

    step_fn = build_step()

    bg_color = jnp.asarray(
        [1.0, 1.0, 1.0] if dataset.white_background else [0.0, 0.0, 0.0], jnp.float32
    )
    from sgs_tpu.viewer import network_gui

    train_cams = scene.getTrainCameras()
    viewpoint_stack: list = []
    ema_loss = 0.0
    t0 = time.time()
    for iteration in range(first_iter + 1, opt.iterations + 1):
        network_gui.serve(
            lambda cam, sm: jnp.clip(
                render(
                    cam,
                    model.with_params(params).render_inputs(active_sh_degree),
                    bg_color, scaling_modifier=sm,
                    mode=raster_mode, max_instances=max_instances or None,
                    backend=raster_backend, max_row_instances=max_rows,
                    max_kernel_rows=max_krows,
                )["render"], 0.0, 1.0,
            ),
            dataset.source_path, iteration, opt.iterations,
        )
        if not viewpoint_stack:
            viewpoint_stack = list(train_cams)
        cam = viewpoint_stack.pop(py_rng.randint(0, len(viewpoint_stack) - 1))

        if opt.random_background:
            rng, sub = jax.random.split(rng)
            bg = jax.random.uniform(sub, (3,), jnp.float32)
        else:
            bg = bg_color

        params, opt_state, loss, ll1, ovf = step_fn(
            params, opt_state, model, cam.camera, jnp.asarray(cam.gt_image), bg
        )
        ema_loss = 0.4 * float(loss) + 0.6 * ema_loss
        # overflow recovery (the reference LGM never drops splats; silent
        # truncation would corrupt the fit): regrow buckets and recompile
        if raster_mode == "tiled" and int(ovf) > 0:
            needed = max_instances + int(ovf)
            while max_instances < int(needed * 1.4):
                max_instances *= 2
            if raster_tight:
                max_rows *= 2
                max_krows *= 2
            print(f"\n[ITER {iteration}] WARNING: instance overflow "
                  f"({int(ovf)} splats dropped); buckets -> "
                  f"{max_instances}/{max_rows}/{max_krows}")
            step_fn = build_step()
        # warmup shrink re-bucket: LGM splats usually SHRINK fast during
        # early fitting (the init footprint is the fat 3-NN one, see
        # models/latent.py create_from_pcd), so re-measure the counts a
        # few times and recompile smaller — every instance-scale raster
        # op is proportional to the bucket. One recompile buys the rest
        # of a 90k-iteration run.
        elif raster_mode == "tiled" and iteration in (200, 1000, 5000):
            nb = compute_buckets(model.with_params(params))
            if nb[0] <= max_instances // 2 or (
                raster_tight and nb[2] and nb[2] <= max_krows // 2
            ):
                max_instances, max_rows, max_krows = nb
                print(f"\n[ITER {iteration}] shrink re-bucket -> "
                      f"{max_instances}/{max_rows}/{max_krows}")
                step_fn = build_step()
        if not pipe.no_tqdm and iteration % 100 == 0:
            print(f"[{iteration}] ema loss {ema_loss:.6f}")

        if iteration in testing_iterations:
            model_now = model.with_params(params)
            report_lgm(
                iteration, scene, model_now, active_sh_degree, bg_color,
                mode=raster_mode, max_instances=max_instances,
                backend=raster_backend, max_row_instances=max_rows,
                max_kernel_rows=max_krows,
            )

        if iteration in saving_iterations:
            model_now = model.with_params(params)
            raw = jax.tree.map(np.asarray, model_now.decode())
            path = os.path.join(
                model_path, f"point_cloud/iteration_{iteration}", "point_cloud.ply"
            )
            ply_io.save_gaussian_ply(
                path, raw["xyz"], raw["features_dc"], raw["features_rest"],
                raw["opacity"], raw["scaling"], raw["rotation"],
            )
            print(f"\n[ITER {iteration}] Saved Gaussians to {path}")

        if iteration in checkpoint_iterations:
            save_lgm_checkpoint(
                os.path.join(model_path, f"chkpnt{iteration}.npz"),
                model.with_params(params), iteration,
            )
            print(f"\n[ITER {iteration}] Saved Checkpoint")

    elapsed = time.time() - t0
    n_iters = opt.iterations - first_iter
    if n_iters > 0:
        print(f"\nLGM: {n_iters} iters in {elapsed:.1f}s ({n_iters/elapsed:.2f} it/s)")
    return model.with_params(params)


def report_lgm(iteration, scene, model, active_sh_degree, bg_color,
               mode="tiled", max_instances=0, backend="xla",
               max_row_instances=0, max_kernel_rows=0):
    for name, cams in (
        ("test", scene.getTestCameras()),
        ("train", scene.getTrainCameras()[:8]),
    ):
        if not cams:
            continue
        l1s, psnrs = [], []
        inputs = model.render_inputs(active_sh_degree)
        for cam in cams:
            out = render(
                cam.camera, inputs, bg_color,
                mode=mode, max_instances=max_instances or None,
                backend=backend, max_row_instances=max_row_instances,
                max_kernel_rows=max_kernel_rows,
            )
            img = jnp.clip(out["render"], 0.0, 1.0)
            gt = jnp.clip(jnp.asarray(cam.gt_image), 0.0, 1.0)
            l1s.append(float(l1_loss(img, gt)))
            psnrs.append(float(psnr(img, gt)))
        print(
            f"\n[ITER {iteration}] Evaluating {name}: "
            f"L1 {np.mean(l1s)} PSNR {np.mean(psnrs)}"
        )
