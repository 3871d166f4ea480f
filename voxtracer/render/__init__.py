from voxtracer.render import film, accumulator, driver  # noqa: F401
