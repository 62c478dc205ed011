#!/usr/bin/env python
"""Gaussian parameter analysis — the MyGaussianModel.test() equivalent.

Loads a trained PLY, verifies the vectorize round trip, plots opacity
histograms and appearance-PCA variance-explained curves (SVG), and writes
low-rank PCA-reconstructed PLYs (/root/reference/scene/my_gaussian_model.py:61-137).

Usage: python analyze_model.py --ply <point_cloud.ply> --out my_tests/
"""

import os
import sys
from argparse import ArgumentParser

import numpy as np


def main(argv=None):
    from sgs_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = ArgumentParser(description="Gaussian model analysis")
    parser.add_argument("--ply", required=True)
    parser.add_argument("--out", default="my_tests")
    parser.add_argument("--sh_degree", type=int, default=3)
    parser.add_argument("--rank", type=int, default=3)
    args = parser.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sgs_tpu.data.ply import load_gaussian_ply, save_gaussian_ply
    from sgs_tpu.data.scene import pool_from_arrays
    from sgs_tpu.models.vectorized import (
        compute_normalization,
        from_vector,
        pca_project,
        vectorized,
    )

    os.makedirs(args.out, exist_ok=True)
    arrays = load_gaussian_ply(args.ply, args.sh_degree)
    pool = pool_from_arrays(arrays, args.sh_degree)
    shape_p, app_p = vectorized(pool)

    # round-trip check (the reference's allclose assertion)
    shape_p2, app_p2 = vectorized(from_vector(args.sh_degree, shape_p, app_p))
    assert np.allclose(shape_p, shape_p2, rtol=1e-3, atol=1e-4)
    assert np.allclose(app_p, app_p2, rtol=1e-4, atol=1e-5)
    print(f"vectorize round trip OK ({shape_p.shape}, {app_p.shape})")

    # opacity histograms
    opac = shape_p[:, 3]
    for cumulative, name in ((False, "opacities_hist"), (True, "opacities_hist_cumulative")):
        plt.hist(opac, bins=20, cumulative=cumulative)
        plt.xlabel("Opacity")
        plt.ylabel("Number of components" + (" (cumulative)" if cumulative else ""))
        plt.savefig(os.path.join(args.out, f"{name}.svg"))
        plt.close()

    # PCA of appearance params, normalized + unnormalized
    mean, std = compute_normalization(app_p)
    for use_std, tag in ((None, "unnormalized"), (std, "normalized")):
        recon, ratio = pca_project(app_p, args.rank, mean=mean, std=use_std)
        xs = np.arange(len(ratio)) + 1
        plt.plot(xs, ratio, marker=".")
        plt.title(f"PCA of {tag} appearance (SH) parameters")
        plt.xlabel("# of PCA dimensions")
        plt.ylabel("Ratio of variance explained")
        plt.savefig(os.path.join(args.out, f"appearance_{tag}_PCA_variance_explained.svg"))
        plt.close()
        plt.plot(xs, np.cumsum(ratio), marker=".")
        plt.title(f"PCA of {tag} appearance (SH) parameters")
        plt.xlabel("# of PCA dimensions")
        plt.ylabel("Ratio of variance explained (cumulative)")
        plt.savefig(
            os.path.join(args.out, f"appearance_{tag}_PCA_variance_explained_cumulative.svg")
        )
        plt.close()

        pca_pool = from_vector(args.sh_degree, shape_p, recon)
        out_arrays = pca_pool.compact_arrays()
        save_gaussian_ply(
            os.path.join(args.out + f"_ply_{tag[:6]}", "point_cloud.ply"),
            out_arrays["xyz"], out_arrays["features_dc"],
            out_arrays["features_rest"], out_arrays["opacity"],
            out_arrays["scaling"], out_arrays["rotation"],
        )
        print(f"{tag}: top-{args.rank} PCA explains {np.cumsum(ratio)[args.rank - 1]:.3f}")
    print("Done.")


if __name__ == "__main__":
    main(sys.argv[1:])
