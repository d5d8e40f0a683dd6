"""flacx — a TPU-native batched FLAC codec.

The reference implementation (turlando/flac-py, mounted at /root/reference) is
a sample-serial, bit-serial pure-Python FLAC encoder/decoder.  flacx rebuilds
the same capability TPU-first:

* frame-parallel ``[batch, block_size]`` analysis pipelines under ``jax.jit``
  (windowed autocorrelation, all-order Levinson-Durbin via ``lax.scan``,
  error-feedback coefficient quantization, fused fixed-predictor diffs),
* exact exhaustive Rice parameter / partition-order search as a segmented
  reduction tree,
* a prefix-sum bit packer that replaces the reference's one-call-per-bit
  ``Put.uint`` (reference flac/binary.py:168-206),
* CRC-8/CRC-16 via table-free GF(2) polynomial folding on device,
* multi-chip scale-out through ``jax.sharding`` meshes (data-parallel over
  frames, optional sequence sharding inside a block).

Host-side modules (``flacx.format``, ``flacx.bitio``, ``flacx.crc``,
``flacx.coded_number``, ``flacx.oracle``) carry the FLAC stream grammar and a
pure-Python/numpy oracle codec used for golden tests and for the tiny
sequential pieces (metadata headers) that have no business on a TPU.

Import layering: this top-level module stays import-light (no jax) so the
host-only oracle/CLI paths don't pay device initialisation; device pipelines
live under ``flacx.ops`` / ``flacx.encoder`` / ``flacx.decoder``.
"""

__version__ = "0.1.0"

__all__ = [
    "format",
    "bitio",
    "crc",
    "coded_number",
    "utils",
]
