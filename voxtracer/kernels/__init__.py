from voxtracer.kernels import traverse  # noqa: F401
