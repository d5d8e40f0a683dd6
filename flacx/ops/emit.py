"""Subframe → symbol-stream emission (device).

Every subframe occupies a FIXED slot layout regardless of its kind; unused
slots carry zero length and vanish in the bit packer.  This keeps shapes
static under jit while encoding the fully dynamic FLAC grammar:

  [header(1) | warmup(T) | lpc-meta(1) | coefs(T) | res-meta(1) |
   N × (param?, zero-run, payload)]

A Rice-coded residual sample needs at most two symbols: an arbitrary-length
zero run (the unary quotient) and a ``1``-terminated payload
``(1 << k) | remainder`` of ``k+1 ≤ 31`` bits — the whole quotient+stop-bit+
remainder pattern of the reference's ``put_rice_int``
(flac/encoder.py:798-807) collapses into them.
"""

from __future__ import annotations

import jax.numpy as jnp

from flacx.ops.rice import RicePlan

KIND_CONSTANT, KIND_VERBATIM, KIND_FIXED, KIND_LPC = 0, 1, 2, 3


def subframe_slot_count(max_taps: int, n: int) -> int:
    return 1 + max_taps + 1 + max_taps + 1 + 3 * n


def subframe_symbols(kind: jnp.ndarray, order: jnp.ndarray, bps: jnp.ndarray,
                     x: jnp.ndarray, taps: jnp.ndarray, shift: jnp.ndarray,
                     precision: int, zz: jnp.ndarray, plan: RicePlan,
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Emit symbols for a batch of subframes.

    Args:
      kind: ``[B, C]`` in {constant, verbatim, fixed, lpc}.
      order: ``[B, C]`` predictor order (0 for constant/verbatim).
      bps: ``[B, C]`` effective sample size (incl. the side-channel bit).
      x: ``[B, C, N]`` integer samples of the emitted (virtual) channel.
      taps: ``[B, C, T]`` chosen integer predictor taps.
      shift: ``[B, C]`` LPC shift.
      zz: ``[B, C, N]`` zigzag residual magnitudes (0 at ``i < order``).
      plan: exact Rice plan for these residuals.
    Returns:
      ``(values u32, lengths i32)`` of shape ``[B, C, slots]``.
    """
    b, c, n = x.shape
    t = taps.shape[-1]
    x64 = x.astype(jnp.int64)
    bps_mask = ((jnp.int64(1) << bps.astype(jnp.int64)) - 1)[..., None]

    is_pred = kind >= KIND_FIXED
    is_lpc = kind == KIND_LPC

    # --- subframe header (1 bit pad + 6-bit type + wasted flag = 8 bits)
    type_code = jnp.where(
        kind == KIND_CONSTANT, 0,
        jnp.where(kind == KIND_VERBATIM, 1,
                  jnp.where(kind == KIND_FIXED, 8 + order, 32 + order - 1)))
    hdr_v = (type_code.astype(jnp.uint32) << 1)[..., None]
    hdr_l = jnp.full((b, c, 1), 8, jnp.int32)

    # --- warmup slots (constant value rides in slot 0)
    ti = jnp.arange(t, dtype=jnp.int32)
    warm_active = is_pred[..., None] & (ti < order[..., None])
    const_active = (kind == KIND_CONSTANT)[..., None] & (ti == 0)
    warm_v = (x64[..., :t] & bps_mask).astype(jnp.uint32)
    warm_l = jnp.where(warm_active | const_active, bps[..., None], 0
                       ).astype(jnp.int32)

    # --- LPC meta ((precision-1)<<5 | shift, 9 bits) and coefficients
    meta_v = (((precision - 1) << 5) | shift.astype(jnp.uint32))[..., None]
    meta_l = jnp.where(is_lpc, 9, 0)[..., None].astype(jnp.int32)
    coef_mask = jnp.uint32((1 << precision) - 1)
    coef_v = (taps.astype(jnp.uint32) & coef_mask)
    coef_l = jnp.where(is_lpc[..., None] & (ti < order[..., None]),
                       precision, 0).astype(jnp.int32)

    # --- residual meta (2-bit method + 4-bit partition order)
    method = (plan.width - 4).astype(jnp.uint32)
    rmeta_v = ((method << 4) | plan.porder.astype(jnp.uint32))[..., None]
    rmeta_l = jnp.where(is_pred, 6, 0)[..., None].astype(jnp.int32)

    # --- per-sample triples
    i = jnp.arange(n, dtype=jnp.int32)
    in_resid = is_pred[..., None] & (i >= order[..., None])
    k = plan.k_sample.astype(jnp.int64)

    param_v = plan.k_sample.astype(jnp.uint32)
    param_l = jnp.where(is_pred[..., None] & plan.param_start,
                        plan.width[..., None], 0).astype(jnp.int32)

    zeros_v = jnp.zeros((b, c, n), jnp.uint32)
    zeros_l = jnp.where(in_resid, (zz >> k).astype(jnp.int32), 0)

    pay_rice_v = ((jnp.int64(1) << k) | (zz & ((jnp.int64(1) << k) - 1))
                  ).astype(jnp.uint32)
    pay_verb = (x64 & bps_mask).astype(jnp.uint32)
    is_verb = (kind == KIND_VERBATIM)[..., None]
    pay_v = jnp.where(is_verb, pay_verb, pay_rice_v)
    pay_l = jnp.where(is_verb, bps[..., None],
                      jnp.where(in_resid, (k + 1).astype(jnp.int32), 0)
                      ).astype(jnp.int32)

    trip_v = jnp.stack([param_v, zeros_v, pay_v], axis=-1).reshape(b, c, 3 * n)
    trip_l = jnp.stack([param_l, zeros_l, pay_l], axis=-1).reshape(b, c, 3 * n)

    values = jnp.concatenate(
        [hdr_v, warm_v, meta_v, coef_v, rmeta_v, trip_v], axis=-1)
    lengths = jnp.concatenate(
        [hdr_l, warm_l, meta_l, coef_l, rmeta_l, trip_l], axis=-1)
    return values, lengths
