"""Pallas TPU kernels for the hot ops.

Kernels here are optional accelerations of the XLA formulations in
``flacx.ops`` — every one has a pure-XLA equivalent used as fallback (and
as the test oracle).
"""
