#!/usr/bin/env python
"""Run down the production-vs-isolated gather gap (VERDICT r5 task 2/3).

scripts/exp_payload.py measured the two big 5M payload moves at ~120 +
176 ms ISOLATED, while the production trace groups them at 225 + 366 ms
— a ~2x gap hypothesized as fusion grouping / folded transpose / HBM
pressure. This script A/Bs the production pipeline itself through the
layout flags added in round 5 (render/tiled.py):

  base               PAYLOAD_LANES=16, no barrier, split grad halves
  narrow             PAYLOAD_LANES=12 (25% fewer random gather bytes)
  barrier            PACK_BARRIER=True (pack gather fenced from the
                     kernel-operand transpose — folded-transpose test)
  gradsingle         GRAD_SINGLE_TABLE=True (one 16-lane reduction
                     buffer: one gather + one cumsum chain)
  narrow+barrier / narrow+gradsingle / all

plus (100k only) merged-vs-two-gather culling (TWO_GATHER_MAX_ROWS=0).

Usage: python scripts/exp_prodgap.py [--5m] [--100k] [--variants a,b,..]
Prints one JSON line per (scale, variant): fwd+bwd ms over ITERS frames.
Every variant recompiles (expect minutes each through the remote compile
service at 5M).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

VARIANTS = {
    "base": {},
    "narrow": {"PAYLOAD_LANES": 12},
    "barrier": {"PACK_BARRIER": True},
    "gradsingle": {"GRAD_SINGLE_TABLE": True},
    "narrow+barrier": {"PAYLOAD_LANES": 12, "PACK_BARRIER": True},
    "narrow+gradsingle": {"PAYLOAD_LANES": 12, "GRAD_SINGLE_TABLE": True},
    "all": {
        "PAYLOAD_LANES": 12, "PACK_BARRIER": True, "GRAD_SINGLE_TABLE": True,
    },
    "merged_cull": {"TWO_GATHER_MAX_ROWS": 0},  # 100k A/B: r4 data flow
}

DEFAULTS = {
    "PAYLOAD_LANES": 16,
    "PACK_BARRIER": False,
    "GRAD_SINGLE_TABLE": False,
    "TWO_GATHER_MAX_ROWS": 768 * 1024,
}


def main():
    args = sys.argv[1:]
    do_5m = "--5m" in args or "--100k" not in args
    do_100k = "--100k" in args or "--5m" not in args
    names = None
    for a in args:
        if a.startswith("--variants"):
            names = a.split("=", 1)[1].split(",")
    import jax

    import bench_scale
    import sgs_tpu.render.tiled as tiled_mod

    scales = ([100_000] if do_100k else []) + ([5_000_000] if do_5m else [])
    for n in scales:
        variant_names = names or (
            ["base", "narrow", "barrier", "gradsingle", "narrow+gradsingle",
             "all", "merged_cull"]
            if n <= 200_000
            else ["base", "narrow", "barrier", "gradsingle",
                  "narrow+gradsingle", "all"]
        )
        for name in variant_names:
            for k, v in DEFAULTS.items():
                setattr(tiled_mod, k, v)
            for k, v in VARIANTS[name].items():
                setattr(tiled_mod, k, v)
            jax.clear_caches()
            t0 = time.time()
            r = bench_scale.run_config(n, capture=(n >= 1_000_000))
            r = {
                "scale": n, "variant": name,
                "ms": r["fwd_bwd_ms"], "fps": r["fps"],
                "compile_s": r["compile_s"],
                "wall_s": round(time.time() - t0, 1),
            }
            print(json.dumps(r), flush=True)
    for k, v in DEFAULTS.items():
        setattr(tiled_mod, k, v)


if __name__ == "__main__":
    main()
