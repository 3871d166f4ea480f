from voxtracer.world.svo import SvoSpace, DeviceSvo, EMPTY  # noqa: F401
from voxtracer.world import dense, worldgen  # noqa: F401
