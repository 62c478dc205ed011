from sgs_tpu.render.pipeline import GaussianInputs, render  # noqa: F401
