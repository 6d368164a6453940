"""Pure NumPy kernels — no Ray imports here.

Everything Ray-side (`apollo_ray.stages`) calls into these; tests pin
their numerics against scalar reference ports.
"""
