"""Training orchestration — the framework's train.py body.

Mirrors the reference loop structure (/root/reference/train.py:31-146):
per-iteration jitted train_step; host-side periodic work (SH escalation
every 1000 iters, densify/prune in [densify_from_iter, densify_until_iter]
every densification_interval with size_threshold=20 after the first opacity
reset, opacity reset every opacity_reset_interval plus the white-background
kick at densify_from_iter, PLY saves, .npz checkpoints, losses.tsv rows,
EMA-loss progress bar). The optimizer step is skipped on the final
iteration exactly like the reference (train.py:140-142).

TPU-specific addition: pool capacity management — when free slots drop
under a threshold the pool/optimizer/stats arrays are regrown host-side
(one recompile per growth, ~log2 growths per run).
"""

from __future__ import annotations

import os
import random
import time
from typing import List, Optional

import jax
import jax.numpy as jnp

from sgs_tpu.models.densify import densify_and_prune, reset_opacity
from sgs_tpu.models.gaussians import DensifyStats, GaussianPool, PARAM_FIELDS
from sgs_tpu.ops.ssim import l1_loss, psnr
from sgs_tpu.train import checkpoint as ckpt
from sgs_tpu.train.loop import (
    TrainState,
    eval_render,
    instance_bucket,
    instance_bucket_sample,
    train_step,
)
from sgs_tpu.train.optim import AdamState, make_lr_dict
from sgs_tpu.utils.config import (
    ModelParams,
    OptimizationParams,
    PipelineParams,
    save_cfg_args,
)

GROW_FREE_FRACTION = 0.2  # regrow when free slots < 20% of capacity
GROW_FACTOR = 2.0


def grow_state(state: TrainState, new_capacity: int) -> TrainState:
    pool = state.pool.grown(new_capacity)
    extra = new_capacity - state.pool.capacity
    pad = lambda x: jnp.concatenate(
        [x, jnp.zeros((extra,) + x.shape[1:], x.dtype)], axis=0
    )
    adam = AdamState(
        mu={f: pad(state.adam.mu[f]) for f in PARAM_FIELDS},
        nu={f: pad(state.adam.nu[f]) for f in PARAM_FIELDS},
        step=state.adam.step,
    )
    stats = DensifyStats(
        xyz_gradient_accum=pad(state.stats.xyz_gradient_accum),
        denom=pad(state.stats.denom),
        max_radii2d=pad(state.stats.max_radii2d),
    )
    return TrainState(pool=pool, adam=adam, stats=stats)


def training(
    dataset: ModelParams,
    opt: OptimizationParams,
    pipe: PipelineParams,
    testing_iterations: List[int],
    saving_iterations: List[int],
    checkpoint_iterations: List[int],
    checkpoint_path: Optional[str] = None,
    scene=None,
    seed: int = 0,
    log_every: int = 10,
) -> TrainState:
    from sgs_tpu.data.scene import Scene

    if scene is None:
        scene = Scene(dataset)
    model_path = dataset.model_path
    os.makedirs(model_path, exist_ok=True)
    save_cfg_args(model_path, dataset)
    tsv = open(os.path.join(model_path, "losses.tsv"), "w")
    tsv.write("iteration\ttest_l1\ttest_psnr\tnum_gaussians\n")
    tb = _make_tb_writer(model_path)

    pool = scene.pool
    adam = AdamState.init(pool.params())
    stats = DensifyStats.zeros(pool.capacity)
    state = TrainState(pool=pool, adam=adam, stats=stats)
    raster_mode = getattr(pipe, "rasterizer", "tiled")
    from sgs_tpu.utils.config import resolve_raster_backend

    raster_backend = resolve_raster_backend(
        getattr(pipe, "raster_backend", "auto")
    )
    # tight (exact ellipse/tile) binning: Pallas backend only
    raster_tight = (
        getattr(pipe, "tight_culling", True) and raster_backend == "pallas"
    )
    spatial_lr_scale = scene.cameras_extent
    active_sh_degree = 0
    first_iter = 0

    if checkpoint_path:
        state, first_iter, active_sh_degree, spatial_lr_scale = ckpt.load_checkpoint(
            checkpoint_path
        )
        print(f"Restored checkpoint at iteration {first_iter}")

    bg_color = jnp.asarray(
        [1.0, 1.0, 1.0] if dataset.white_background else [0.0, 0.0, 0.0], jnp.float32
    )
    rng = jax.random.PRNGKey(seed)
    py_rng = random.Random(seed)

    viewpoint_stack: list = []
    ema_loss = 0.0
    train_cams = scene.getTrainCameras()
    print(f"# train cameras {len(train_cams)}")
    print(f"# test cameras {len(scene.getTestCameras())}")

    max_instances = 0
    max_rows = 0
    max_krows = 0
    if raster_mode == "tiled":
        b = instance_bucket_sample(
            state.pool, train_cams, py_rng, tight=raster_tight
        )
        max_instances, max_rows, max_krows = (
            b if raster_tight else (b, 0, 0)
        )
        print(f"instance capacity bucket: {max_instances}"
              + (f" (tight; row bucket {max_rows}, kernel rows {max_krows})"
                 if raster_tight else ""))

    # ---- multi-chip training (--parallel dp | hybrid) ----
    parallel = getattr(pipe, "parallel", "none")
    mesh = None
    dp_steps: dict = {}
    band_bucket = 0
    band_rows = 0
    band_krows = 0
    hy_balance = bool(getattr(pipe, "hy_balance", False))
    hy_compact = bool(getattr(pipe, "hy_compact", True))
    band_rec = 0  # band record-compaction cap (0 = compaction off)
    band_offsets = None  # balanced band boundaries (traced operand)
    band_pad = 0  # static per-band viewport tiles (0 = equal bands)
    if parallel == "dp":
        from sgs_tpu.parallel.data_parallel import replicate_state
        from sgs_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        dp_n = mesh.shape["data"]
        state = replicate_state(state, mesh)
        print(f"data-parallel training over {dp_n} devices "
              f"(camera batch = {dp_n})")
    elif parallel == "hybrid":
        from sgs_tpu.parallel.hybrid import place_hybrid_state
        from sgs_tpu.parallel.mesh import make_hybrid_mesh, make_mesh

        mesh_str = getattr(pipe, "parallel_mesh", "")
        if mesh_str:
            d_n, g_n = (int(x) for x in mesh_str.lower().split("x"))
            mesh = make_mesh((d_n, g_n), ("data", "gauss"))
        else:
            mesh = make_hybrid_mesh()
        dp_n = mesh.shape["data"]
        hy_g = mesh.shape["gauss"]
        assert state.pool.capacity % hy_g == 0, (
            "pool capacity must divide the gauss axis"
        )
        state = place_hybrid_state(state, mesh)
        print(f"hybrid training over {dict(mesh.shape)} "
              f"(camera batch = {dp_n}, {hy_g} Gaussian shards)")
    elif parallel != "none":
        raise ValueError(f"unknown --parallel mode {parallel!r}")

    use_tqdm = not pipe.no_tqdm
    progress = None
    if use_tqdm:
        try:
            from tqdm import tqdm

            progress = tqdm(
                range(first_iter, opt.iterations), desc="Training progress"
            )
        except ImportError:
            progress = None

    from sgs_tpu.viewer import network_gui

    t_start = time.time()
    overflow_events = 0
    for iteration in range(first_iter + 1, opt.iterations + 1):
        t_iter0 = time.time()
        network_gui.serve(
            lambda cam, sm: eval_render(
                state.pool, cam, bg_color, active_sh_degree,
                mode=raster_mode, max_instances=max_instances,
                backend=raster_backend, max_row_instances=max_rows,
                max_kernel_rows=max_krows,
            ),
            dataset.source_path, iteration, opt.iterations,
        )

        if iteration % 1000 == 0 and active_sh_degree < dataset.sh_degree:
            active_sh_degree += 1

        def pop_camera():
            nonlocal viewpoint_stack
            if not viewpoint_stack:
                viewpoint_stack = list(train_cams)
            return viewpoint_stack.pop(
                py_rng.randint(0, len(viewpoint_stack) - 1)
            )

        if opt.random_background:
            rng, sub = jax.random.split(rng)
            bg = jax.random.uniform(sub, (3,), jnp.float32)
        else:
            bg = bg_color

        lrs = {
            k: jnp.float32(v)
            for k, v in make_lr_dict(opt, spatial_lr_scale, iteration).items()
        }
        if parallel == "dp":
            from sgs_tpu.parallel.data_parallel import (
                make_dp_train_step,
                shard_camera_batch,
                stack_cameras,
            )

            cams_b = [pop_camera() for _ in range(dp_n)]
            cam_batch = stack_cameras([c.camera for c in cams_b])
            gt_batch = jnp.stack([jnp.asarray(c.gt_image) for c in cams_b])
            cam_batch, gt_batch = shard_camera_batch(cam_batch, gt_batch, mesh)
            key = (active_sh_degree, max_instances, max_rows,
                   iteration < opt.iterations)
            if key not in dp_steps:
                dp_steps[key] = make_dp_train_step(
                    mesh, active_sh_degree,
                    lambda_dssim=opt.lambda_dssim,
                    freeze_xyz=dataset.freeze_xyz,
                    mode=raster_mode, max_instances=max_instances,
                    backend=raster_backend,
                    apply_update=iteration < opt.iterations,
                    max_row_instances=max_rows,
                )
            state, metrics = dp_steps[key](state, cam_batch, gt_batch, bg, lrs)
        elif parallel == "hybrid":
            from sgs_tpu.parallel.data_parallel import (
                shard_camera_batch,
                stack_cameras,
            )
            from sgs_tpu.parallel.hybrid import make_hybrid_train_step

            cams_b = [pop_camera() for _ in range(dp_n)]
            cam_batch = stack_cameras([c.camera for c in cams_b])
            gt_batch = jnp.stack([jnp.asarray(c.gt_image) for c in cams_b])
            cam_batch, gt_batch = shard_camera_batch(cam_batch, gt_batch, mesh)
            if band_bucket == 0:
                # principled sizing: the same count pre-pass as the
                # single-chip path, run per band viewport (replaces the
                # r2 `max_instances * scale // hy_g` guess)
                from sgs_tpu.parallel.hybrid import band_bucket_sample

                if hy_balance:
                    from sgs_tpu.parallel.hybrid import balance_from_sample

                    band_offsets, band_pad = balance_from_sample(
                        state.pool, train_cams, py_rng, hy_g
                    )
                    print(f"hybrid balanced bands: offsets "
                          f"{band_offsets.tolist()}, pad {band_pad} tiles")
                bb = band_bucket_sample(
                    state.pool, train_cams, py_rng, hy_g,
                    tight=raster_tight,
                    offsets=band_offsets, pad_tiles=band_pad,
                )
                band_bucket, band_rows, band_krows = (
                    bb if raster_tight else (bb, 0, 0)
                )
                if hy_compact:
                    from sgs_tpu.parallel.hybrid import band_record_cap

                    band_rec = band_record_cap(
                        state.pool, train_cams, py_rng, hy_g,
                        offsets=band_offsets,
                    )
                    print(f"hybrid band record cap: {band_rec}")
                print(f"hybrid band instance bucket: {band_bucket}"
                      + (f" (tight; rows {band_rows}, kernel rows "
                         f"{band_krows})" if raster_tight else ""))
            w0 = cams_b[0].camera.image_width
            h0 = cams_b[0].camera.image_height
            key = (active_sh_degree, band_bucket, band_rows, band_krows,
                   w0, h0, band_pad, band_rec, iteration < opt.iterations)
            if key not in dp_steps:
                dp_steps[key] = make_hybrid_train_step(
                    mesh, active_sh_degree, w0, h0,
                    max_instances_per_band=band_bucket,
                    lambda_dssim=opt.lambda_dssim,
                    freeze_xyz=dataset.freeze_xyz,
                    backend=raster_backend,
                    apply_update=iteration < opt.iterations,
                    max_row_instances_per_band=band_rows,
                    max_kernel_rows_per_band=band_krows,
                    band_pad_tiles=band_pad,
                    band_rec_cap=band_rec,
                )
            state, metrics = dp_steps[key](
                state, cam_batch, gt_batch, bg, lrs,
                None if band_offsets is None else jnp.asarray(band_offsets),
            )
        else:
            cam = pop_camera()
            state, metrics = train_step(
                state,
                cam.camera,
                jnp.asarray(cam.gt_image),
                bg,
                lrs,
                active_sh_degree=active_sh_degree,
                lambda_dssim=opt.lambda_dssim,
                freeze_xyz=dataset.freeze_xyz,
                apply_update=iteration < opt.iterations,
                mode=raster_mode,
                max_instances=max_instances,
                backend=raster_backend,
                max_row_instances=max_rows,
                max_kernel_rows=max_krows,
            )

        loss_val = float(metrics["loss"])
        ema_loss = 0.4 * loss_val + 0.6 * ema_loss

        nfg = int(metrics.get("nonfinite_grads", 0))
        if nfg:
            print(
                f"\n[ITER {iteration}] WARNING: {nfg} non-finite gradient "
                "elements zeroed this step (degenerate splat geometry; "
                "see train_step guard)"
            )
            if tb is not None:
                tb.add_scalar("raster/nonfinite_grads", nfg, iteration)

        # Overflow recovery: the step just rendered with truncated deepest
        # tiles. Warn, then regrow the bucket so subsequent views are exact
        # (the overflow count bounds the needed capacity from below).
        ovf = int(metrics.get("overflow", 0))
        if ovf > 0 and parallel == "hybrid":
            band_bucket *= 2
            band_rows = band_rows * 2 if raster_tight else 0
            band_krows = band_krows * 2 if raster_tight else 0
            overflow_events += 1
            print(
                f"\n[ITER {iteration}] WARNING: band instance overflow "
                f"({ovf} splats dropped); band bucket -> {band_bucket}"
            )
        elif ovf > 0 and raster_mode == "tiled":
            needed = max_instances + ovf
            new_bucket = max_instances
            while new_bucket < int(needed * 1.4):
                new_bucket *= 2
            overflow_events += 1
            new_rows = max_rows * 2 if raster_tight else 0
            new_krows = max_krows * 2 if raster_tight else 0
            print(
                f"\n[ITER {iteration}] WARNING: instance overflow "
                f"({ovf} splats dropped this view); bucket "
                f"{max_instances} -> {new_bucket}"
                + (f", rows {max_rows} -> {new_rows}, kernel rows "
                   f"{max_krows} -> {new_krows}" if raster_tight else "")
            )
            max_instances = new_bucket
            max_rows = new_rows
            max_krows = new_krows
            if tb is not None:
                tb.add_scalar("raster/overflow_instances", ovf, iteration)

        # per-iteration scalars, exactly the reference's three
        # (train.py:176-178; elapsed in ms like the cuda-event pair)
        if tb is not None:
            tb.add_scalar("train_loss_patches/l1_loss", float(metrics["l1"]), iteration)
            tb.add_scalar("train_loss_patches/total_loss", loss_val, iteration)
            tb.add_scalar("iter_time", (time.time() - t_iter0) * 1000.0, iteration)
        if progress is not None and iteration % log_every == 0:
            progress.set_postfix({"Loss": f"{ema_loss:.7f}"})
            progress.update(log_every)

        # ------------------------------------------------ periodic host work
        if iteration in testing_iterations:
            training_report(
                tsv, iteration, scene, state.pool, active_sh_degree, bg_color,
                mode=raster_mode, max_instances=max_instances,
                backend=raster_backend, max_row_instances=max_rows,
                max_kernel_rows=max_krows, tb=tb,
                log_gt_images=iteration == min(testing_iterations),
            )

        if iteration in saving_iterations:
            print(f"\n[ITER {iteration}] Saving Gaussians")
            scene.save(state.pool, iteration)

        if iteration < opt.densify_until_iter:
            if (
                iteration > opt.densify_from_iter
                and iteration % opt.densification_interval == 0
            ):
                free = state.pool.capacity - int(state.pool.num_alive)
                if free < GROW_FREE_FRACTION * state.pool.capacity:
                    new_cap = int(
                        -(-state.pool.capacity * GROW_FACTOR // 256) * 256
                    )
                    print(
                        f"\n[ITER {iteration}] Growing pool "
                        f"{state.pool.capacity} -> {new_cap}"
                    )
                    state = grow_state(state, new_cap)
                size_threshold = (
                    20.0 if iteration > opt.opacity_reset_interval else 0.0
                )
                rng, sub = jax.random.split(rng)
                new_pool, new_adam, new_stats, info = densify_and_prune(
                    state.pool, state.adam, state.stats, sub,
                    max_grad=opt.densify_grad_threshold,
                    min_opacity=0.005,
                    extent=scene.cameras_extent,
                    max_screen_size=size_threshold,
                    percent_dense=opt.percent_dense,
                )
                state = TrainState(pool=new_pool, adam=new_adam, stats=new_stats)
                dropped = int(info["n_dropped_overflow"])
                if dropped:
                    print(f"\n[ITER {iteration}] WARNING: dropped {dropped} "
                          "densified Gaussians (pool full)")
                if raster_mode == "tiled":
                    b = instance_bucket_sample(
                        state.pool, train_cams, py_rng, tight=raster_tight
                    )
                    new_bucket, new_rows, new_krows = (
                        b if raster_tight else (b, 0, 0)
                    )
                    # hysteresis: grow immediately, shrink only on a 4x
                    # drop (every bucket change recompiles the train step)
                    if new_bucket > max_instances or new_bucket * 4 <= max_instances:
                        print(f"\n[ITER {iteration}] instance bucket "
                              f"{max_instances} -> {new_bucket}")
                        max_instances = new_bucket
                    if new_rows > max_rows or new_rows * 4 <= max_rows:
                        max_rows = new_rows
                    if new_krows > max_krows or new_krows * 4 <= max_krows:
                        max_krows = new_krows
                if parallel == "hybrid" and band_bucket > 0:
                    from sgs_tpu.parallel.hybrid import band_bucket_sample

                    if hy_balance:
                        from sgs_tpu.parallel.hybrid import (
                            balance_from_sample,
                        )

                        new_off, new_pad = balance_from_sample(
                            state.pool, train_cams, py_rng, hy_g
                        )
                        # offsets retarget freely (traced operand); the
                        # static pad only grows or shrinks on 2x slack
                        band_offsets = new_off
                        if new_pad > band_pad or new_pad * 2 <= band_pad:
                            band_pad = new_pad
                    bb = band_bucket_sample(
                        state.pool, train_cams, py_rng, hy_g,
                        tight=raster_tight,
                        offsets=band_offsets, pad_tiles=band_pad,
                    )
                    nb, nbr, nbk = bb if raster_tight else (bb, 0, 0)
                    # same grow-fast / shrink-on-4x hysteresis as above
                    if nb > band_bucket or nb * 4 <= band_bucket:
                        print(f"\n[ITER {iteration}] band bucket "
                              f"{band_bucket} -> {nb}")
                        band_bucket = nb
                    if nbr > band_rows or nbr * 4 <= band_rows:
                        band_rows = nbr
                    if nbk > band_krows or nbk * 4 <= band_krows:
                        band_krows = nbk

            if iteration % opt.opacity_reset_interval == 0 or (
                dataset.white_background and iteration == opt.densify_from_iter
            ):
                new_pool, new_adam = reset_opacity(state.pool, state.adam)
                state = TrainState(
                    pool=new_pool, adam=new_adam, stats=state.stats
                )

            if parallel == "dp":
                # host-side pool surgery may leave leaves uncommitted /
                # differently placed; pin the new state back to the mesh
                from sgs_tpu.parallel.data_parallel import replicate_state

                state = replicate_state(state, mesh)
            elif parallel == "hybrid":
                from sgs_tpu.parallel.hybrid import place_hybrid_state

                state = place_hybrid_state(state, mesh)

        if iteration in checkpoint_iterations:
            print(f"\n[ITER {iteration}] Saving Checkpoint")
            ckpt.save_checkpoint(
                os.path.join(model_path, f"chkpnt{iteration}.npz"),
                state, iteration, active_sh_degree, spatial_lr_scale,
            )

    if progress is not None:
        progress.close()
    tsv.close()
    if tb is not None:
        tb.close()
    elapsed = time.time() - t_start
    iters = opt.iterations - first_iter
    if iters > 0:
        print(f"\nTrained {iters} iterations in {elapsed:.1f}s "
              f"({iters / elapsed:.2f} it/s)")
    return state


def _make_tb_writer(model_path: str):
    """Optional tensorboard writer (reference train.py:166-172)."""
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(model_path)
    except Exception:
        print("Tensorboard not available: not logging progress")
        return None


def training_report(
    tsv, iteration: int, scene, pool: GaussianPool, active_sh_degree: int, bg_color,
    mode: str = "reference", max_instances: int = 0, backend: str = "xla",
    max_row_instances: int = 0, max_kernel_rows: int = 0,
    tb=None, full_train_set: bool = False, log_gt_images: bool = False,
) -> None:
    """Test/train-subset L1+PSNR eval (train.py:174-217) + TSV row.

    full_train_set evaluates the WHOLE train list like the reference's
    get_psnr.py:198-201 (the trainer's default is the range(5,30) subsample
    of train.py:185); log_gt_images mirrors train.py:195-196 (GTs only at
    the first testing iteration)."""
    train_cams = scene.getTrainCameras()
    if full_train_set:
        train_eval = list(train_cams)
    else:
        train_eval = (
            [train_cams[i % len(train_cams)] for i in range(5, 30)]
            if train_cams
            else []
        )
    configs = (
        {"name": "test", "cameras": scene.getTestCameras()},
        {"name": "train", "cameras": train_eval},
    )
    n_gaussians = int(pool.num_alive)
    for config in configs:
        cams = config["cameras"]
        if not cams:
            continue
        l1_sum, psnr_sum = 0.0, 0.0
        for idx, cam in enumerate(cams):
            image = eval_render(
                pool, cam.camera, bg_color, active_sh_degree,
                mode=mode, max_instances=max_instances, backend=backend,
                max_row_instances=max_row_instances,
                max_kernel_rows=max_kernel_rows,
            )
            gt = jnp.clip(jnp.asarray(cam.gt_image), 0.0, 1.0)
            if tb is not None and idx < 5:
                import numpy as _np

                name = getattr(cam, "image_name", str(idx))
                tb.add_images(
                    config["name"] + f"_view_{name}/render",
                    _np.asarray(image)[None], global_step=iteration,
                )
                if log_gt_images:
                    tb.add_images(
                        config["name"] + f"_view_{name}/ground_truth",
                        _np.asarray(gt)[None], global_step=iteration,
                    )
            l1_sum += float(l1_loss(image, gt))
            psnr_sum += float(psnr(image, gt))
        l1_avg = l1_sum / len(cams)
        psnr_avg = psnr_sum / len(cams)
        print(
            f"\n[ITER {iteration}] Evaluating {config['name']}: "
            f"L1 {l1_avg} PSNR {psnr_avg}"
        )
        print(f"# of Gaussians: {n_gaussians}")
        if config["name"] == "test" and tsv is not None:
            tsv.write(f"{iteration}\t{l1_avg}\t{psnr_avg}\t{n_gaussians}\n")
            tsv.flush()
        if tb is not None:
            tb.add_scalar(
                config["name"] + "/loss_viewpoint - l1_loss", l1_avg, iteration
            )
            tb.add_scalar(
                config["name"] + "/loss_viewpoint - psnr", psnr_avg, iteration
            )
    if tb is not None:
        import numpy as _np

        tb.add_histogram(
            "scene/opacity_histogram",
            _np.asarray(pool.get_opacity)[_np.asarray(pool.alive)],
            iteration,
        )
        tb.add_scalar("total_points", n_gaussians, iteration)
