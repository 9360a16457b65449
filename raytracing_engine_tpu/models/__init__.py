"""Renderer model families.

- ``golden``      — scalar numpy reference (the missing upstream tests' anchor)
- ``conemarch``   — vectorized jnp depth-pyramid renderer (reference parity)
- ``pallas_renderer`` — Pallas TPU kernels for depth + shading
- ``wavefront``   — north-star wavefront path tracer (triangles/BVH/NEE)
"""
