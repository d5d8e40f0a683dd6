"""Pure-Python/numpy oracle codec.

This is the *semantic twin* of the reference implementation
(/root/reference/flac): byte-identical output for valid inputs, with the
reference's crash defects fixed (mono channel header, digital silence,
fixed/LPC ties, negative-shift quantization — SURVEY.md §2.3).  It exists to

* pin golden byte-compatibility tests against reference-encoded files,
* serve as the numerically exact oracle every device kernel is tested
  against, and
* handle the tiny sequential tail the device pipeline doesn't bother with
  (the final short block of a stream).

It is NOT the production path — that is ``flacx.encoder`` / ``flacx.decoder``
(batched JAX/Pallas pipelines).
"""

from flacx.oracle.encoder import EncoderParameters, encode_stream
from flacx.oracle.decoder import decode_stream

__all__ = ["EncoderParameters", "encode_stream", "decode_stream"]
