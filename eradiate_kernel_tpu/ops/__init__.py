"""Compiled compute-path components: acceleration structures and Pallas
TPU kernels (the OptiX/Embree analog layer, SURVEY §2.5)."""
