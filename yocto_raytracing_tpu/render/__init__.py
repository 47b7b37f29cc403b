"""The render path: camera rays, texture sampling, shading, wavefront loop."""
