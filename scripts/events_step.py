#!/usr/bin/env python
"""Print the last recorded step of a tensorboard events file (cheap
TFRecord walk, no TF import) — used to monitor long TPU training runs
without touching the trainer process.

Usage: python scripts/events_step.py <events-file-or-model-dir>
"""

import glob
import os
import struct
import sys


def last_step(path: str):
    last = None
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            (ln,) = struct.unpack("<Q", hdr)
            if ln > 10_000_000:  # desynced walk (partial flush): stop
                break
            f.read(4)
            data = f.read(ln)
            f.read(4)
            if len(data) < ln:  # partial record at the write frontier:
                break           # don't parse a half-flushed proto
            i = 0
            while i < len(data):
                tag = data[i]
                i += 1
                if tag == 0x09:  # wall_time (double)
                    i += 8
                elif tag == 0x10:  # step (varint)
                    v = 0
                    sh = 0
                    while True:
                        b = data[i]
                        i += 1
                        v |= (b & 0x7F) << sh
                        sh += 7
                        if not b & 0x80:
                            break
                    if v:
                        last = v
                    break
                else:
                    break
    return last


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else "."
    if os.path.isdir(target):
        files = sorted(
            glob.glob(os.path.join(target, "events.out.tfevents.*")),
            key=os.path.getmtime,
        )
        if not files:
            raise SystemExit(f"no events files under {target}")
        target = files[-1]
    print(last_step(target))


if __name__ == "__main__":
    main()
