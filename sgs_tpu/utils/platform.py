"""Platform selection helper.

The axon site config force-registers the TPU platform and ignores the
JAX_PLATFORMS env var, so CLIs honor SGS_FORCE_CPU=1 via a config update
(must run before first device use). Useful for CPU-only eval work and when
the TPU tunnel is congested.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    if os.environ.get("SGS_FORCE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
