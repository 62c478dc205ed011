"""Independent brute-force numpy renderer used only by tests.

A direct, loop-based transcription of the rasterization spec (SURVEY.md
§2.9): per-pixel front-to-back alpha compositing over globally depth-sorted
Gaussians with the CUDA cutoffs. Written independently from the vectorized
JAX implementation so the two can cross-validate.
"""

import math

import numpy as np


def brute_force_render(
    mean2d, depth, conic, rgb, opacity, valid, bg, width, height, radius=None
):
    order = np.argsort(np.where(valid, depth, np.inf), kind="stable")
    img = np.zeros((height, width, 3), dtype=np.float64)
    tiles_x = -(-width // 16)
    tiles_y = -(-height // 16)
    for py in range(height):
        for px in range(width):
            T = 1.0
            C = np.zeros(3)
            for i in order:
                if not valid[i]:
                    continue
                if radius is not None:
                    # CUDA tile-rect footprint test
                    r = float(radius[i])
                    rminx = min(tiles_x, max(0, int((mean2d[i, 0] - r) / 16)))
                    rmaxx = min(tiles_x, max(0, int((mean2d[i, 0] + r + 15) / 16)))
                    rminy = min(tiles_y, max(0, int((mean2d[i, 1] - r) / 16)))
                    rmaxy = min(tiles_y, max(0, int((mean2d[i, 1] + r + 15) / 16)))
                    if not (rminx <= px // 16 < rmaxx and rminy <= py // 16 < rmaxy):
                        continue
                dx = mean2d[i, 0] - px
                dy = mean2d[i, 1] - py
                a, b, c = conic[i]
                power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                if power > 0.0:
                    continue
                alpha = min(0.99, opacity[i] * math.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                T_new = T * (1 - alpha)
                if T_new < 1e-4:
                    break
                C = C + T * alpha * rgb[i]
                T = T_new
            img[py, px] = C + T * np.asarray(bg)
    return img.transpose(2, 0, 1).astype(np.float32)
