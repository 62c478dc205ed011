#!/usr/bin/env python
"""Batch driver: Zero123/Objaverse mesh-initialized training with frozen
structure (mirrors /root/reference/train_zero123.py — --freeze_xyz and
densification disabled via --densify_until_iter -1)."""

import json
import os
import subprocess
import sys

json_path = os.environ.get(
    "ZERO123_MANIFEST", "/mnt/data/datasets/objaverse/uid_to_objects.json"
)
views_root = os.environ.get(
    "ZERO123_VIEWS", "/mnt/data/datasets/zero123/views_release_10000"
)

with open(json_path) as f:
    objects_list = list(json.load(f).items())
for uid, glb_path in objects_list:
    subprocess.run(
        [sys.executable, "train.py", "-s", f"{views_root}/{uid}",
         "--iterations", "30000", "--freeze_xyz", "--densify_until_iter", "-1",
         "--no_tqdm", "--eval", "--model_path", f"output_zero123/{uid}",
         "--obj_path", glb_path, "--white_background"],
        check=False,
    )
