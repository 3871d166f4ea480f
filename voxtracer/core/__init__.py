from voxtracer.core import camera, color, rng, sampling, spectra, vecmath  # noqa: F401
