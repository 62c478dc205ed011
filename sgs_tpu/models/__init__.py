from sgs_tpu.models.gaussians import GaussianPool, DensifyStats  # noqa: F401
