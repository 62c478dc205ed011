"""General helpers mirroring /root/reference/utils/general_utils.py."""

from __future__ import annotations

import random
import sys
from datetime import datetime

import numpy as np


def safe_state(silent: bool, seed: int = 0) -> None:
    """Timestamping stdout wrapper + RNG seeding (general_utils.py:112-133).

    Device selection is XLA's job — no cuda:0 pinning equivalent needed.
    """
    old_f = sys.stdout

    class F:
        def __init__(self, silent):
            self.silent = silent

        def write(self, x):
            if not self.silent:
                if x.endswith("\n"):
                    old_f.write(
                        x.replace(
                            "\n",
                            " [{}]\n".format(datetime.now().strftime("%d/%m %H:%M:%S")),
                        )
                    )
                else:
                    old_f.write(x)

        def flush(self):
            old_f.flush()

    sys.stdout = F(silent)
    random.seed(seed)
    np.random.seed(seed)
