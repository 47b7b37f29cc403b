"""Compute-path ops: ray-primitive intersectors, BVH traversal, kernels.

All ops are batched over rays (SoA arrays), jit-compatible, and where
meaningful differentiable. The reference's per-ray recursive C++
(src/scene.cpp:229-506) becomes vectorized wavefront code here.
"""
