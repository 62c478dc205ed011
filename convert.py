#!/usr/bin/env python
"""COLMAP dataset preparation pipeline.

Mirrors /root/reference/convert.py: feature_extractor -> exhaustive_matcher
-> mapper -> image_undistorter subprocess chain, sparse/0 layout fixup, and
optional 1/2, 1/4, 1/8 image pyramids (PIL-based — no ImageMagick needed).
Requires a `colmap` binary on PATH (or --colmap_executable).
"""

import logging
import os
import shutil
import subprocess
import sys
from argparse import ArgumentParser


def run(cmd: list, step: str) -> None:
    print("+", " ".join(cmd))
    result = subprocess.run(cmd)
    if result.returncode != 0:
        logging.error(f"{step} failed with code {result.returncode}. Exiting.")
        sys.exit(result.returncode)


def resize_images(source_path: str) -> None:
    from PIL import Image

    files = os.listdir(os.path.join(source_path, "images"))
    for factor, sub in ((2, "images_2"), (4, "images_4"), (8, "images_8")):
        os.makedirs(os.path.join(source_path, sub), exist_ok=True)
        for file in files:
            src = os.path.join(source_path, "images", file)
            dst = os.path.join(source_path, sub, file)
            with Image.open(src) as im:
                im.resize((im.width // factor, im.height // factor)).save(dst)


def main(argv=None):
    parser = ArgumentParser("Colmap converter")
    parser.add_argument("--no_gpu", action="store_true")
    parser.add_argument("--skip_matching", action="store_true")
    parser.add_argument("--source_path", "-s", required=True, type=str)
    parser.add_argument("--camera", default="OPENCV", type=str)
    parser.add_argument("--colmap_executable", default="", type=str)
    parser.add_argument("--resize", action="store_true")
    args = parser.parse_args(argv)
    colmap = args.colmap_executable or "colmap"
    if shutil.which(colmap) is None:
        logging.error(
            f"COLMAP binary {colmap!r} not found on PATH — install COLMAP or "
            "pass --colmap_executable. (This environment ships no COLMAP; "
            "pre-reconstructed datasets load directly via train.py -s.)"
        )
        sys.exit(1)
    use_gpu = "0" if args.no_gpu else "1"
    sp = args.source_path

    if not args.skip_matching:
        os.makedirs(sp + "/distorted/sparse", exist_ok=True)
        run([colmap, "feature_extractor",
             "--database_path", sp + "/distorted/database.db",
             "--image_path", sp + "/input",
             "--ImageReader.single_camera", "1",
             "--ImageReader.camera_model", args.camera,
             "--SiftExtraction.use_gpu", use_gpu], "Feature extraction")
        run([colmap, "exhaustive_matcher",
             "--database_path", sp + "/distorted/database.db",
             "--SiftMatching.use_gpu", use_gpu], "Feature matching")
        run([colmap, "mapper",
             "--database_path", sp + "/distorted/database.db",
             "--image_path", sp + "/input",
             "--output_path", sp + "/distorted/sparse",
             "--Mapper.ba_global_function_tolerance=0.000001"], "Mapper")

    run([colmap, "image_undistorter",
         "--image_path", sp + "/input",
         "--input_path", sp + "/distorted/sparse/0",
         "--output_path", sp,
         "--output_type", "COLMAP"], "Undistortion")

    os.makedirs(sp + "/sparse/0", exist_ok=True)
    for file in os.listdir(sp + "/sparse"):
        if file == "0":
            continue
        shutil.move(os.path.join(sp, "sparse", file),
                    os.path.join(sp, "sparse", "0", file))

    if args.resize:
        print("Copying and resizing...")
        resize_images(sp)
    print("Done.")


if __name__ == "__main__":
    main(sys.argv[1:])
