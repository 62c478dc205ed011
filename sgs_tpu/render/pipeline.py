"""Public render() — the framework's equivalent of the reference renderer
wrapper (/root/reference/gaussian_renderer/__init__.py:18-100).

Functional contract (returned dict keys match the reference):
  render            (3, H, W) float32
  viewspace_points  the caller-supplied screen-space tap array; differentiate
                    the loss w.r.t. it to obtain the densification gradient
                    (the JAX analogue of `screenspace_points.grad`)
  visibility_filter (N,) bool, radii > 0
  radii             (N,) int32

Screen-space gradient units match the CUDA backward: dL/dmean2D is the
gradient w.r.t. the NDC-space center (pixel-space gradient x 0.5*size), so
the reference's densify_grad_threshold=0.0002 transfers unchanged. The tap
is injected as `pixel_center += tap * [0.5*W, 0.5*H]`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from sgs_tpu.core import sh as sh_lib
from sgs_tpu.core import transforms
from sgs_tpu.core.camera import Camera
from sgs_tpu.core.projection import project_gaussians
from sgs_tpu.render import reference


@struct.dataclass
class GaussianInputs:
    """Activated per-Gaussian attributes handed to the rasterizer — the same
    alternatives the CUDA rasterizer accepts: exactly one of
    {scales+rotations, cov3d_precomp} and one of {shs, colors_precomp}."""

    means3d: jnp.ndarray  # (N, 3)
    opacities: jnp.ndarray  # (N, 1) activated (sigmoid applied)
    scales: Optional[jnp.ndarray] = None  # (N, 3) activated (exp applied)
    rotations: Optional[jnp.ndarray] = None  # (N, 4) unit-normalized wxyz
    cov3d_precomp: Optional[jnp.ndarray] = None  # (N, 6)
    shs: Optional[jnp.ndarray] = None  # (N, K, 3)
    colors_precomp: Optional[jnp.ndarray] = None  # (N, 3)
    sh_degree: int = struct.field(pytree_node=False, default=0)
    alive: Optional[jnp.ndarray] = None  # (N,) bool mask for padded pools


def render(
    camera: Camera,
    gaussians: GaussianInputs,
    bg_color: jnp.ndarray,
    scaling_modifier: float = 1.0,
    vspace_tap: Optional[jnp.ndarray] = None,
    chunk_size: int = 256,
    pixel_block: int = 16384,
    mode: str = "reference",
    max_instances: Optional[int] = None,
    backend: str = "xla",
    max_row_instances: Optional[int] = None,
    max_kernel_rows: Optional[int] = None,
    max_visible: Optional[int] = None,
) -> dict:
    """mode: "reference" (O(N*P) oracle) or "tiled" (production binned
    rasterizer; max_instances is its static instance capacity, default
    8x the Gaussian count; backend selects the XLA or Pallas forward).

    max_row_instances (Pallas backend only) enables TIGHT binning: the
    exact ellipse/tile intersection culls (Gaussian, tile) pairs whose
    alpha is < 1/255 everywhere in the tile — bit-identical images,
    ~35% fewer instances. It is the static tile-ROW capacity; size it
    with render.tiled.row_count (0/None disables).

    max_kernel_rows (Pallas backend only) buckets the padded chunk-row
    layout below its analytic worst case (~2x the typical need); size it
    with render.tiled.kernel_row_count (0/None = worst case).

    max_visible compacts the binning inputs to the visible subset (size
    with render.tiled.visible_count): the N-scale binning passes then
    cost the visible count, not the pool capacity — the garden-scale
    cut for pools where one frustum sees a fraction of N."""
    g = gaussians
    n = g.means3d.shape[0]

    if g.cov3d_precomp is not None:
        cov3d = g.cov3d_precomp
    else:
        cov3d = transforms.build_covariance(g.scales, g.rotations, scaling_modifier)

    proj = project_gaussians(
        g.means3d,
        cov3d,
        camera.world_view_transform,
        camera.full_proj_transform,
        camera.tanfovx,
        camera.tanfovy,
        camera.image_width,
        camera.image_height,
    )

    if g.colors_precomp is not None:
        rgb = g.colors_precomp
    else:
        dirs = g.means3d - camera.camera_center[None, :]
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        rgb = sh_lib.sh_to_rgb_clamped(g.sh_degree, g.shs, dirs)

    mean2d = proj["mean2d"]
    if vspace_tap is None:
        vspace_tap = jnp.zeros((n, 3), dtype=jnp.float32)
    half_size = jnp.array(
        [0.5 * camera.image_width, 0.5 * camera.image_height], dtype=jnp.float32
    )
    mean2d = mean2d + vspace_tap[:, :2] * half_size[None, :]

    valid = proj["radius"] > 0
    if g.alive is not None:
        valid = valid & g.alive

    if mode == "tiled":
        from sgs_tpu.render.tiled import rasterize_tiled

        if max_instances is None:
            max_instances = -(-8 * n // 1024) * 1024
        image, overflow = rasterize_tiled(
            mean2d,
            proj["depth"],
            proj["conic"],
            rgb,
            g.opacities[..., 0],
            proj["radius"],
            valid,
            bg_color,
            camera.image_width,
            camera.image_height,
            max_instances=max_instances,
            backend=backend,
            max_row_instances=(
                max_row_instances if backend == "pallas" and max_row_instances
                else 0
            ),
            max_kernel_rows=(
                max_kernel_rows if backend == "pallas" and max_kernel_rows
                else 0
            ),
            max_visible=max_visible if max_visible else 0,
        )
    elif mode == "reference":
        overflow = jnp.int32(0)
        image = reference.rasterize_sorted(
            mean2d,
            proj["depth"],
            proj["conic"],
            rgb,
            g.opacities[..., 0],
            valid,
            bg_color,
            camera.image_width,
            camera.image_height,
            radius=proj["radius"],
            chunk_size=chunk_size,
            pixel_block=pixel_block,
        )
    else:
        raise ValueError(f"unknown rasterizer mode {mode!r}")
    radii = jnp.where(
        valid, proj["radius"], jnp.zeros_like(proj["radius"])
    )
    return {
        "render": image,
        "viewspace_points": vspace_tap,
        "visibility_filter": radii > 0,
        "radii": radii,
        # instances dropped by the static capacity this view (0 = exact
        # render). Callers must surface this — silent truncation is a
        # quality bug (tiled mode only; the oracle never overflows).
        "overflow": overflow,
    }
