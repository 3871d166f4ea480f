"""voxtracer — a TPU-native voxel path-tracing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MinusKelvin/raytrace-voxels (progressive spectral path tracing over a
hash-consed sparse voxel octree with procedural terrain, sun NEE,
exponential-atmosphere fog, and a wavelength->color spectral pipeline).

Layer map (see SURVEY.md §7.1):
  core/     math, camera, RNG, sampling, color/spectra
  world/    SVO (hash-consed host builder + flat device table), dense grids,
            procedural worldgen
  kernels/  jnp oracle + production renderers, Pallas TPU kernels
  render/   accumulation, film IO (EXR/PNG), frame drivers
  dist/     multi-chip sharding (jax.sharding / shard_map)
  app/      CLI entry points
"""

__version__ = "0.1.0"
