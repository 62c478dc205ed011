"""Hybrid 2D-mesh training: camera data-parallelism x Gaussian sharding.

Mesh axes ("data", "gauss"): every device owns one camera of the batch
(data axis) AND one shard of the Gaussian pool (gauss axis). Per device:
project/color the local shard, all_gather splat records over the gauss
axis (ICI), composite the owned image row band of the owned camera. The
batched band-sharded image leaves shard_map and the loss (L1 + SSIM) runs
in jit-land, where GSPMD auto-partitions the SSIM convolutions (halo
exchange across bands) and the backward's cross-device reductions.

This composes the two 1D modes (parallel/data_parallel.py and
parallel/tile_shard.py) into the full pod-slice recipe: DCN-friendly axis
outermost (data), ICI collectives on the inner gauss axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from sgs_tpu.core import sh as sh_lib
from sgs_tpu.core import transforms
from sgs_tpu.core.camera import Camera
from sgs_tpu.core.projection import project_gaussians
from sgs_tpu.parallel.tile_shard import band_height
from sgs_tpu.render.tiled import rasterize_tiled


def make_hybrid_render(
    mesh: Mesh,
    width: int,
    height: int,
    active_sh_degree: int,
    max_instances_per_band: int,
    data_axis: str = "data",
    gauss_axis: str = "gauss",
):
    """Returns render_fn(params /gauss-sharded/, alive, cam_batch /data/,
    bg) -> (B, 3, Hp, W) band-assembled images (crop Hp with [:height])."""
    n_gauss = mesh.shape[gauss_axis]
    bh = band_height(height, n_gauss)

    def per_device(params, alive, camera, bg):
        # camera leaves arrive with a leading local-batch dim of 1
        camera = jax.tree.map(lambda x: x[0], camera)
        xyz = params["xyz"]
        scales = jnp.exp(params["scaling"])
        rots = transforms.normalize(params["rotation"], eps=1e-12)
        opac = jax.nn.sigmoid(params["opacity"])[:, 0]
        cov3d = transforms.build_covariance(scales, rots)
        proj = project_gaussians(
            xyz, cov3d, camera.world_view_transform, camera.full_proj_transform,
            camera.tanfovx, camera.tanfovy, width, height,
        )
        shs = jnp.concatenate(
            [params["features_dc"], params["features_rest"]], axis=1
        )
        dirs = xyz - camera.camera_center[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        rgb = sh_lib.sh_to_rgb_clamped(active_sh_degree, shs, dirs)
        valid = (proj["radius"] > 0) & alive

        rec = jnp.concatenate(
            [
                proj["mean2d"], proj["depth"][:, None], proj["conic"], rgb,
                opac[:, None], proj["radius"].astype(jnp.float32)[:, None],
                valid.astype(jnp.float32)[:, None],
            ],
            axis=1,
        )
        all_rec = jax.lax.all_gather(rec, gauss_axis, tiled=True)

        band = jax.lax.axis_index(gauss_axis)
        y_off = (band * bh).astype(jnp.float32)
        band_mean2d = all_rec[:, 0:2] - jnp.asarray([0.0, 1.0]) * y_off
        img_band, _ = rasterize_tiled(
            band_mean2d, all_rec[:, 2], all_rec[:, 3:6], all_rec[:, 6:9],
            all_rec[:, 9], all_rec[:, 10].astype(jnp.int32),
            all_rec[:, 11] > 0.5, bg, width, bh,
            max_instances=max_instances_per_band,
        )
        # (1 local camera, band rows, W, 3)
        return img_band.transpose(1, 2, 0)[None]

    render_sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(gauss_axis), P(gauss_axis), P(data_axis), P()),
        out_specs=P(data_axis, gauss_axis),
        check_vma=False,
    )

    def render_fn(params, alive, cam_batch, bg):
        img = render_sharded(params, alive, cam_batch, bg)  # (B, Hp, W, 3)
        return img.transpose(0, 3, 1, 2)[:, :, :height, :]

    return render_fn


def shard_hybrid(params, alive, cam_batch, gt_batch, mesh,
                 data_axis="data", gauss_axis="gauss"):
    """Device-put the training inputs with the hybrid layout."""
    gspec = NamedSharding(mesh, P(gauss_axis))
    dspec = NamedSharding(mesh, P(data_axis))
    params = jax.tree.map(lambda x: jax.device_put(x, gspec), params)
    alive = jax.device_put(alive, gspec)
    cam_batch = jax.tree.map(lambda x: jax.device_put(x, dspec), cam_batch)
    gt_batch = jax.device_put(gt_batch, dspec)
    return params, alive, cam_batch, gt_batch
