"""Gaussian-primitive + tile sharding — the north-star multi-chip renderer.

The BASELINE recipe (SURVEY.md §2 parallelism checklist): Gaussians shard
across devices, each device projects/culls/colors only its own shard, the
compacted 2D splat records (10 floats — much lighter than the 59-float
parameters) are all_gather'ed over ICI, and each device composites only
the image ROW BAND it owns (tile ownership). Autodiff through shard_map
transposes the all_gather into a reduce-scatter of splat-record gradients
back to the owning shard — the "param-grad reduction overlapped with the
backward tile loop" falls out of XLA's scheduling.

Constraints: the image height is padded so every band is a whole number of
16px tile rows; the Gaussian capacity must divide by the axis size.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from sgs_tpu.core import sh as sh_lib
from sgs_tpu.core import transforms
from sgs_tpu.core.camera import Camera
from sgs_tpu.core.projection import TILE, project_gaussians
from sgs_tpu.render.tiled import rasterize_tiled


def band_height(height: int, n_dev: int) -> int:
    """Rows per device band, padded to whole tiles."""
    tile_rows = -(-height // TILE)
    bands = -(-tile_rows // n_dev)
    return bands * TILE


def row_load_histogram(mean2d, radius, valid, width: int, height: int):
    """(tiles_y,) rect-binned instance count per image TILE ROW — the
    load signal for balanced band partitioning. One N-scale run fill
    (+w at each Gaussian's first tile row, -w past its last, cumsum):
    no instance expansion needed."""
    from sgs_tpu.render.tiled import _tile_rects

    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    min_x, max_x, min_y, max_y = _tile_rects(mean2d, radius, tiles_x, tiles_y)
    live = valid & (radius > 0) & (max_x > min_x) & (max_y > min_y)
    w = jnp.where(live, max_x - min_x, 0).astype(jnp.int32)
    diff = (
        jnp.zeros((tiles_y + 1,), jnp.int32)
        .at[jnp.where(live, min_y, tiles_y)].add(w, mode="drop")
        .at[jnp.where(live, max_y, tiles_y)].add(-w, mode="drop")
    )
    return jnp.cumsum(diff)[:tiles_y]


def balanced_band_offsets(hist, n_bands: int):
    """Host-side band boundaries from a tile-row load histogram.

    Splits the tile rows into n_bands CONTIGUOUS bands at cumulative-load
    quantiles (each band >= 1 tile row), so front-loaded scenes don't
    idle the chips that own empty bands (equal-HEIGHT bands give the
    top band all the work on a ground-heavy capture). Static per few
    hundred iterations: recompute at densify/re-bucket events; the step
    takes the offsets as a TRACED operand so rebalancing never
    recompiles (only a pad_tiles growth does).

    Returns (offsets (n_bands,) np.int32 first tile row per band,
             pad_tiles int — max band tile rows, every band's static
             viewport height)."""
    import numpy as np

    hist = np.maximum(np.asarray(hist, np.float64), 0.0)
    tiles_y = hist.shape[0]
    if n_bands > tiles_y:
        # fewer tile rows than bands (tiny eval images): one row per
        # band, trailing bands own nothing — matches the legacy
        # equal-height layout, which the assembly crop already handles
        return np.arange(n_bands, dtype=np.int32), 1
    c = np.cumsum(hist)
    total = max(c[-1], 1.0)
    offs = [0]
    for b in range(1, n_bands):
        t = total * b / n_bands
        # first row index whose cumulative load reaches the quantile
        idx = int(np.searchsorted(c, t, side="left")) + 1
        idx = max(offs[-1] + 1, min(idx, tiles_y - (n_bands - b)))
        offs.append(idx)
    offsets = np.asarray(offs, np.int32)
    rows = np.diff(np.concatenate([offsets, [tiles_y]]))
    return offsets, int(rows.max())


def make_sharded_render(
    mesh: Mesh,
    width: int,
    height: int,
    active_sh_degree: int,
    max_instances_per_band: int,
    axis: str = "gauss",
):
    """Returns render_fn(params, alive, camera, bg, tap) -> (3, Hp, W) image
    (Hp = padded height; crop with [:height]). params is the raw pool param
    dict sharded over `axis` on the leading (capacity) dimension."""
    n_dev = mesh.shape[axis]
    bh = band_height(height, n_dev)
    h_pad = bh * n_dev

    def per_device(params, alive, camera, bg, tap):
        # ---- stage 1: project + color OWN Gaussian shard ----
        xyz = params["xyz"]
        scales = jnp.exp(params["scaling"])
        rots = transforms.normalize(params["rotation"], eps=1e-12)
        opac = jax.nn.sigmoid(params["opacity"])[:, 0]
        cov3d = transforms.build_covariance(scales, rots)
        # project with the TRUE height (h_pad would stretch the NDC->pixel
        # mapping); padding only affects band assignment
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
        mean2d = proj["mean2d"] + tap[:, :2] * jnp.asarray(
            [0.5 * width, 0.5 * height], jnp.float32
        )
        valid = (proj["radius"] > 0) & alive

        # ---- stage 2: all_gather compact splat records over ICI ----
        rec = jnp.concatenate(
            [
                mean2d,
                proj["depth"][:, None],
                proj["conic"],
                rgb,
                opac[:, None],
                proj["radius"].astype(jnp.float32)[:, None],
                valid.astype(jnp.float32)[:, None],
            ],
            axis=1,
        )  # (N/D, 12)
        all_rec = jax.lax.all_gather(rec, axis, tiled=True)  # (N, 12)

        # ---- stage 3: composite OWN row band ----
        band = jax.lax.axis_index(axis)
        y_off = (band * bh).astype(jnp.float32)
        band_mean2d = all_rec[:, 0:2] - jnp.asarray([0.0, 1.0]) * y_off
        img_band, _ = rasterize_tiled(
            band_mean2d,
            all_rec[:, 2],
            all_rec[:, 3:6],
            all_rec[:, 6:9],
            all_rec[:, 9],
            all_rec[:, 10].astype(jnp.int32),
            all_rec[:, 11] > 0.5,
            bg,
            width,
            bh,
            max_instances=max_instances_per_band,
        )  # (3, bh, W)
        return img_band.transpose(1, 2, 0)  # rows-major for band concat

    render_sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )

    def render_fn(params, alive, camera: Camera, bg, tap=None):
        if tap is None:
            tap = jnp.zeros((params["xyz"].shape[0], 3), jnp.float32)
        img = render_sharded(params, alive, camera, bg, tap)  # (Hp, W, 3)
        return img.transpose(2, 0, 1)[:, :height, :]

    return render_fn
