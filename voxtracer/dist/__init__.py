from voxtracer.dist import mesh, shard  # noqa: F401
