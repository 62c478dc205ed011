"""Device-trace timing helper: the ONLY trustworthy timer via the axon
tunnel (host-side blocking timers read ~0.1 ms for multi-ms device work
until the queue saturates; see PERF_NOTES.md).

Usage:
    from dtime import device_ms
    ms, by_op = device_ms(jitted_fn, args, iters=3)
"""

import glob
import gzip
import json
import os
import shutil
import tempfile
from collections import defaultdict


def device_ms(fn, args, iters=3, top=0):
    """Total device XLA-op time per iteration (ms) + per-op breakdown."""
    import jax

    r = fn(*args)
    jax.block_until_ready(r)

    trace_dir = tempfile.mkdtemp(prefix="dtime_")
    try:
        with jax.profiler.trace(trace_dir):
            for _ in range(iters):
                r = fn(*args)
            jax.block_until_ready(r)

        paths = glob.glob(
            os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
        )
        if not paths:
            raise RuntimeError("no trace produced")
        with gzip.open(paths[0], "rt") as f:
            trace = json.load(f)
        events = trace["traceEvents"]
        pid_names, tid_names = {}, {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            if e.get("ph") == "M" and e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
        by_op = defaultdict(float)
        total = 0.0
        for e in events:
            if e.get("ph") != "X":
                continue
            pname = pid_names.get(e.get("pid"), "")
            tname = tid_names.get((e.get("pid"), e.get("tid")), "")
            if "TPU" not in pname and "tpu" not in pname.lower():
                continue
            if "XLA Ops" not in tname:
                continue
            dur = e.get("dur", 0) / 1e3
            by_op[e["name"]] += dur / iters
            total += dur / iters
        if top:
            for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
                print(f"    {dur:9.3f}  {name[:100]}")
        return total, dict(by_op)
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
