from sgs_tpu.core import sh, transforms, projection, camera  # noqa: F401
