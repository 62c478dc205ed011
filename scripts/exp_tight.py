#!/usr/bin/env python
"""Validate the exact ellipse/tile intersection math for tight culling.

For a Gaussian with conic (ca, cb, cc), opacity op, mean (mx, my):
a tile contributes EXACTLY ZERO unless some pixel (x, y) in its 16x16
box has alpha = op * exp(power) >= ALPHA_MIN with power <= 0, i.e.
P(dx, dy) = 0.5*(ca dx^2 + cc dy^2) + cb dx dy <= tau = ln(op/ALPHA_MIN).

Per tile row ty (pixel box y in [16ty, 16ty+15]), the set of x with
min_{y in box} P <= tau is an interval (projection of a convex set).
This script checks the closed-form interval against brute force over
random conics, then measures the instance reduction on bench-like stats.
"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

ALPHA_MIN = 1.0 / 255.0
TILE = 16


def x_interval_row(mx, my, ca, cb, cc, tau, y0, y1):
    """Exact continuous x-interval [xlo, xhi] (pixel coords) where
    min_{y in [y0, y1]} P(x - mx, y - my) <= tau. Empty -> xlo > xhi.

    Vectorized closed form:
      - Ellipse x-extremum x_ext = sqrt(2 tau cc / det), det = ca*cc - cb^2,
        attained at dy_ext = -(cb/cc) dx_ext.
      - If my + dy_at_that_x within [y0, y1]: bound is the full extremum.
      - Else: clamp dy to the nearer bound yb, solve the 1D quadratic
        0.5 ca dx^2 + cb yb dx + (0.5 cc yb^2 - tau) <= 0.
    """
    dy0 = y0 - my
    dy1 = y1 - my
    det = ca * cc - cb * cb  # > 0 for valid conics
    # x extent of the full ellipse P <= tau
    x_ext = np.sqrt(np.maximum(2.0 * tau * cc / np.maximum(det, 1e-30), 0.0))
    # dy of the rightmost point: dy = -(cb/cc) * dx
    dy_right = -(cb / cc) * x_ext
    dy_left = (cb / cc) * x_ext

    def roots_at(dyb):
        # 0.5 ca dx^2 + cb dyb dx + (0.5 cc dyb^2 - tau) = 0
        A = 0.5 * ca
        B = cb * dyb
        C = 0.5 * cc * dyb * dyb - tau
        disc = B * B - 4 * A * C
        ok = disc >= 0
        sq = np.sqrt(np.maximum(disc, 0.0))
        lo = (-B - sq) / (2 * A)
        hi = (-B + sq) / (2 * A)
        return ok, lo, hi

    # right endpoint
    dyb_r = np.clip(dy_right, dy0, dy1)
    in_r = dyb_r == dy_right
    okr, _, hi_r = roots_at(dyb_r)
    xhi = np.where(in_r, x_ext, np.where(okr, hi_r, -np.inf))
    # left endpoint
    dyb_l = np.clip(dy_left, dy0, dy1)
    in_l = dyb_l == dy_left
    okl, lo_l, _ = roots_at(dyb_l)
    xlo = np.where(in_l, -x_ext, np.where(okl, lo_l, np.inf))
    return mx + xlo, mx + xhi


def brute_interval(mx, my, ca, cb, cc, tau, y0, y1, xmin, xmax):
    xs = np.arange(int(math.floor(xmin)) - 2, int(math.ceil(xmax)) + 3)
    ys = np.linspace(y0, y1, 201)
    dx = xs[:, None] - mx
    dy = ys[None, :] - my
    P = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    ok = (P <= tau).any(axis=1)
    if not ok.any():
        return None
    return xs[ok].min(), xs[ok].max()


def main():
    rng = np.random.default_rng(0)
    bad = 0
    for trial in range(3000):
        # random PSD conic
        l1 = rng.uniform(0.001, 0.5)
        l2 = rng.uniform(0.001, 0.5)
        th = rng.uniform(0, math.pi)
        c, s = math.cos(th), math.sin(th)
        ca = l1 * c * c + l2 * s * s
        cc = l1 * s * s + l2 * c * c
        cb = (l1 - l2) * s * c
        op = rng.uniform(0.01, 0.99)
        tau = math.log(op / ALPHA_MIN)
        if tau <= 0:
            continue
        mx, my = rng.uniform(0, 100, 2)
        y0 = rng.uniform(-40, 140)
        y1 = y0 + 15.0
        xlo, xhi = x_interval_row(
            np.float64(mx), my, ca, cb, cc, tau, y0, y1
        )
        bi = brute_interval(mx, my, ca, cb, cc, tau, y0, y1,
                            mx - 200, mx + 200)
        if bi is None:
            # brute found nothing: closed form must be empty or grazing
            # (sub-pixel sliver) — require width < 2 px
            if xhi - xlo > 2.0:
                bad += 1
                print("FALSE POSITIVE wide", trial, xlo, xhi)
            continue
        blo, bhi = bi
        # closed form must COVER the brute pixel range (conservative)
        if xlo > blo + 1e-6 or xhi < bhi - 1e-6:
            bad += 1
            print("MISS", trial, (xlo, xhi), (blo, bhi))
        # and not exceed it by more than ~1.5 px (tightness, continuous vs grid)
        if xlo < blo - 2.0 or xhi > bhi + 2.0:
            bad += 1
            print("LOOSE", trial, (xlo, xhi), (blo, bhi))
    print(f"validated closed-form interval: {bad} failures / 3000 trials")


if __name__ == "__main__":
    main()


def estimate_reduction():
    """Instance count: rect vs tight on the bench scene's statistics."""
    import jax.numpy as jnp
    from sgs_tpu.core.camera import Camera
    from sgs_tpu.core.projection import focal2fov, fov2focal, project_gaussians
    from sgs_tpu.core import transforms
    from sgs_tpu.models.gaussians import GaussianPool
    from sgs_tpu.render.tiled import _tile_rects

    N = 100_000
    W, H = 1920, 1080
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(N, 3)) * 0.6).astype(np.float32)
    cols = rng.uniform(size=(N, 3)).astype(np.float32)
    pool = GaussianPool.from_pcd(
        pts, cols, 3, capacity=N,
        knn_dist2=np.full((N,), 1e-4, np.float32),
    )
    log_s = rng.uniform(-5.2, -3.6, (N, 3)).astype(np.float32)
    opac_logit = rng.uniform(-1.0, 4.0, (N, 1)).astype(np.float32)
    pool = pool.replace(
        scaling=pool.scaling.at[:].set(jnp.asarray(log_s)),
        opacity=pool.opacity.at[:].set(jnp.asarray(opac_logit)),
    )
    fovx = math.radians(60)
    fovy = focal2fov(fov2focal(fovx, W), H)
    cam = Camera.from_Rt(np.eye(3), np.array([0.0, 0.0, 4.5]), fovx, fovy, W, H)
    inp = pool.render_inputs(3)
    cov = transforms.build_covariance(inp.scales, inp.rotations, 1.0)
    pr = project_gaussians(
        inp.means3d, cov, cam.world_view_transform, cam.full_proj_transform,
        cam.tanfovx, cam.tanfovy, W, H,
    )
    mean2d = np.asarray(pr["mean2d"], np.float64)
    conic = np.asarray(pr["conic"], np.float64)
    radius = np.asarray(pr["radius"])
    op = np.asarray(inp.opacities[:, 0], np.float64)
    tiles_x, tiles_y = -(-W // TILE), -(-H // TILE)
    min_x, max_x, min_y, max_y = (
        np.asarray(a) for a in _tile_rects(
            jnp.asarray(mean2d, jnp.float32), jnp.asarray(radius),
            tiles_x, tiles_y)
    )
    ok = radius > 0
    rect_total = int(np.sum(np.where(ok, (max_x - min_x) * (max_y - min_y), 0)))
    tau = np.log(np.maximum(op, 1e-9) / ALPHA_MIN)
    tight_total = 0
    rows_total = 0
    for g in np.nonzero(ok & (tau > 0))[0]:
        for ty in range(min_y[g], max_y[g]):
            rows_total += 1
            y0, y1 = 16.0 * ty, 16.0 * ty + 15.0
            xlo, xhi = x_interval_row(
                mean2d[g, 0], mean2d[g, 1], conic[g, 0], conic[g, 1],
                conic[g, 2], tau[g], y0, y1,
            )
            # tile interval, intersected with the reference rect
            if xhi < xlo:
                continue
            txlo = max(int(np.floor(xlo / 16.0)), min_x[g])
            txhi = min(int(np.floor(xhi / 16.0)) + 1, max_x[g])
            tight_total += max(0, txhi - txlo)
    print(f"rect instances: {rect_total}")
    print(f"row instances (level-1): {rows_total}")
    print(f"tight instances: {tight_total} "
          f"({100.0 * tight_total / rect_total:.1f}% of rect)")


if __name__ == "__main__" and "--estimate" in sys.argv:
    estimate_reduction()
