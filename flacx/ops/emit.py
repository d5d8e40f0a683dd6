"""Subframe → symbol-stream emission (device).

Every subframe occupies a FIXED slot layout regardless of its kind; unused
slots carry zero length and vanish in the bit packer.  This keeps shapes
static under jit while encoding the fully dynamic FLAC grammar:

  [header(1) | warmup(T) | lpc-meta(1) | coefs(T) | res-meta(1) |
   param/sample slots (blocked, see ``subframe_symbols``)]

A Rice-coded residual sample is ONE symbol: value ``(1 << k) | remainder``
emitted with length ``q + 1 + k`` — its leading zeros ARE the unary
quotient, so the whole quotient+stop-bit+remainder pattern of the
reference's ``put_rice_int`` (flac/encoder.py:798-807) collapses into a
single ≤32-bit word (the Rice planner guarantees the cap,
``flacx.ops.rice.CODE_BITS_MAX``).

Partition parameter slots live at STATIC stream positions: a partition can
only start at sample ``order`` (≤ 32) or at a multiple of the finest legal
partition size, so a param slot precedes samples 0..32 and every multiple
of ``psize_min`` — everything else is grammar-free.

The stage is split into composable pieces so the Pallas emit kernel
(``flacx.kernels.emit_tile``) and the XLA fallback share one source of
truth: :func:`subframe_header_symbols` (header region),
:func:`partition_param_symbols` (sparse parameter slots),
:func:`sample_symbols` (per-sample codes), with
:func:`subframe_symbols` composing all three.
"""

from __future__ import annotations

import jax.numpy as jnp

from flacx.ops.rice import RicePlan

KIND_CONSTANT, KIND_VERBATIM, KIND_FIXED, KIND_LPC = 0, 1, 2, 3


def param_slot_positions(n: int, psize_min: int) -> list[int]:
    """Sample indices that may be preceded by a partition-parameter field."""
    pos = set(range(0, min(33, n)))
    pos.update(range(0, n, psize_min))
    return sorted(pos)


def subframe_header_symbols(kind: jnp.ndarray, order: jnp.ndarray,
                            bps: jnp.ndarray, x: jnp.ndarray,
                            taps: jnp.ndarray, shift: jnp.ndarray,
                            precision: int, plan: RicePlan,
                            wasted: jnp.ndarray | None = None,
                            ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Header-region symbols: subframe header, wasted-bits unary, warmup
    (constant value rides in warmup slot 0), LPC meta + coefficients,
    residual meta.  Returns ``(values u32, lengths i32)`` of shape
    ``[B, C, 4 + 2T]``."""
    b, c, n = x.shape
    t = taps.shape[-1]
    # warmup slots are tiny — keep them in exact i64
    x64 = x[..., :t].astype(jnp.int64)
    bps_mask = ((jnp.int64(1) << bps.astype(jnp.int64)) - 1)[..., None]

    is_pred = kind >= KIND_FIXED
    is_lpc = kind == KIND_LPC

    # --- subframe header (1 bit pad + 6-bit type + wasted flag = 8 bits),
    #     followed by the unary wasted count ((w-1) zeros then a 1 = w bits)
    if wasted is None:
        wasted = jnp.zeros((b, c), jnp.int32)
    has_wasted = wasted > 0
    type_code = jnp.where(
        kind == KIND_CONSTANT, 0,
        jnp.where(kind == KIND_VERBATIM, 1,
                  jnp.where(kind == KIND_FIXED, 8 + order, 32 + order - 1)))
    hdr_v = ((type_code.astype(jnp.uint32) << 1)
             | has_wasted.astype(jnp.uint32))[..., None]
    hdr_l = jnp.full((b, c, 1), 8, jnp.int32)
    wst_v = jnp.ones((b, c, 1), jnp.uint32)
    wst_l = jnp.where(has_wasted, wasted, 0)[..., None].astype(jnp.int32)

    # --- warmup slots (constant value rides in slot 0)
    ti = jnp.arange(t, dtype=jnp.int32)
    warm_active = is_pred[..., None] & (ti < order[..., None])
    const_active = (kind == KIND_CONSTANT)[..., None] & (ti == 0)
    warm_v = (x64 & bps_mask).astype(jnp.uint32)
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

    values = jnp.concatenate([hdr_v, wst_v, warm_v, meta_v, coef_v,
                              rmeta_v], axis=-1)
    lengths = jnp.concatenate([hdr_l, wst_l, warm_l, meta_l, coef_l,
                               rmeta_l], axis=-1)
    return values, lengths


def partition_param_symbols(kind: jnp.ndarray, plan: RicePlan, n: int,
                            psize_min: int,
                            ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse partition-parameter symbols at the static slot positions.

    Rice partition: width-bit parameter k.  Escaped partition: width-bit
    all-ones marker followed by the 5-bit raw size E (one fused symbol).
    Returns ``(values u32, lengths i32)`` of shape ``[B, C, P]`` with
    ``P = len(param_slot_positions(n, psize_min))``.
    """
    is_pred = kind >= KIND_FIXED
    # the plan carries param-slot subsampled copies picked from its small
    # per-partition arrays — gathering [..., ppos] from the per-sample
    # expansions instead would force them to materialize in gather
    # layout (~0.8 ms/batch at 1024×2×4608)
    esc_p = plan.esc_param
    kp = plan.k_param.astype(jnp.uint32)
    ones_marker = ((jnp.uint32(1) << plan.width.astype(jnp.uint32)) - 1
                   )[..., None]
    param_v = jnp.where(esc_p, (ones_marker << 5) | kp, kp)
    param_l = jnp.where(is_pred[..., None] & plan.start_param,
                        plan.width[..., None] + jnp.where(esc_p, 5, 0),
                        0).astype(jnp.int32)
    return param_v, param_l


def sample_symbols(kind: jnp.ndarray, order: jnp.ndarray, bps: jnp.ndarray,
                   x: jnp.ndarray, zz: jnp.ndarray, plan: RicePlan,
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample symbols (one per sample): Rice code, escaped raw
    residual, or verbatim sample.  Returns ``(values u32, lengths i32)``
    of shape ``[B, C, N]``.  (The Pallas kernel
    ``flacx.kernels.emit_tile`` reimplements exactly this + the blocked
    slot assembly in VMEM.)"""
    b, c, n = x.shape
    is_pred = kind >= KIND_FIXED
    i = jnp.arange(n, dtype=jnp.int32)
    in_resid = is_pred[..., None] & (i >= order[..., None])
    k = plan.k_sample.astype(zz.dtype)
    one = jnp.ones((), zz.dtype)
    bps_mask = ((jnp.int64(1) << bps.astype(jnp.int64)) - 1)[..., None]

    samp_rice_v = ((one << k) | (zz & ((one << k) - 1))).astype(jnp.uint32)
    samp_rice_l = (zz >> k).astype(jnp.int32) + 1 + plan.k_sample
    # escaped partitions: raw k_sample(=E)-bit two's-complement residual
    # (flac/decoder.py:404-411 read path; E ≤ 31 guaranteed by the plan)
    r_signed = (zz >> 1) ^ -(zz & 1)
    samp_esc_v = (r_signed & ((one << k) - 1)).astype(jnp.uint32)
    esc = plan.esc_sample
    samp_pred_v = jnp.where(esc, samp_esc_v, samp_rice_v)
    samp_pred_l = jnp.where(esc, plan.k_sample, samp_rice_l)
    samp_verb_v = (x.astype(jnp.int64) & bps_mask).astype(jnp.uint32) \
        if jnp.iinfo(x.dtype).bits < 32 else (
            x.astype(jnp.uint32)
            & bps_mask.astype(jnp.int64).astype(jnp.uint32))
    is_verb = (kind == KIND_VERBATIM)[..., None]
    samp_v = jnp.where(is_verb, samp_verb_v, samp_pred_v)
    samp_l = jnp.where(is_verb, bps[..., None],
                       jnp.where(in_resid, samp_pred_l, 0)).astype(jnp.int32)
    return samp_v, samp_l


def blocked_layout_ok(n: int, psize_min: int) -> bool:
    """Whether the blocked (8-aligned, params-before-samples) fast slot
    layout applies — the same condition for the XLA fast path and the
    Pallas emit kernel."""
    return (psize_min >= 40 and psize_min % 8 == 0
            and n % psize_min == 0 and n > psize_min)


def segmented_layout(n: int, psize_min: int
                     ) -> tuple[int, list[int], list[int]] | None:
    """Chunking for the SEGMENTED tile-emit layout (fine partitions).

    For ``psize_min < 40`` (full ``-r 0..15`` searches drive it down to
    1 at block 16384) the blocked layout's 33-param head no longer
    precedes the first grid boundary, so the kernel emits the same
    dense stream as :func:`subframe_symbols`' general branch:
    off-grid head params first (they ride in the HEADER tile string —
    at most one, partition 0's, is nonzero and it precedes the first
    nonzero sample), then ``nseg`` segments of ``[1 param slot,
    psize_min samples]``.

    Returns ``(chunk_segs, extra_idx, mult_idx)`` where ``chunk_segs``
    is the smallest segment count whose slot span is a whole number of
    512-slot packer tiles (the kernel's grid step), and ``extra_idx`` /
    ``mult_idx`` index :func:`param_slot_positions` rows for off-grid
    head params / on-grid segment params.  None when the layout cannot
    be tiled (chunk not sublane-aligned or ``nseg`` not a chunk
    multiple) — callers fall back to the XLA path.
    """
    import math

    if psize_min < 1 or n % psize_min or n <= psize_min:
        return None
    nseg = n // psize_min
    span = psize_min + 1
    chunk = 512 // math.gcd(span, 512)
    if chunk % 8 or nseg % chunk or (chunk * psize_min) % 128:
        return None
    ppos = param_slot_positions(n, psize_min)
    extra = [j for j, pos in enumerate(ppos) if pos % psize_min]
    mult = [j for j, pos in enumerate(ppos) if pos % psize_min == 0]
    assert len(mult) == nseg
    return chunk, extra, mult


def subframe_symbols(kind: jnp.ndarray, order: jnp.ndarray, bps: jnp.ndarray,
                     x: jnp.ndarray, taps: jnp.ndarray, shift: jnp.ndarray,
                     precision: int, zz: jnp.ndarray, plan: RicePlan,
                     psize_min: int,
                     wasted: jnp.ndarray | None = None,
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
      psize_min: finest legal partition size (static).
    Returns:
      ``(values u32, lengths i32)`` of shape ``[B, C, slots]``.
    """
    b, c, n = x.shape
    hdr_v, hdr_l = subframe_header_symbols(kind, order, bps, x, taps,
                                           shift, precision, plan, wasted)
    param_v, param_l = partition_param_symbols(kind, plan, n, psize_min)
    samp_v, samp_l = sample_symbols(kind, order, bps, x, zz, plan)
    ppos = param_slot_positions(n, psize_min)

    def interleave(pv, sv):
        """Emit param slots so each precedes its partition's samples.

        Fast path — BLOCKED layout: the 33 head param slots (at most one
        carries a symbol: partition 0's parameter, preceding sample
        ``order``) are emitted as one block before the first sample
        segment, and every later segment leads with its single param
        slot padded to 8.  Legal because samples ``0..order-1`` are
        zero-length in the sample slots (warmup lives in the header
        region), so the only nonzero head param still precedes the
        first nonzero sample; zero-length slots are position-free.
        8-aligned block boundaries keep every region a cheap aligned
        slice (and make the layout Pallas-tileable).
        """
        if blocked_layout_ok(n, psize_min):
            nseg = n // psize_min
            z7 = jnp.zeros((b, c, 7), pv.dtype)
            rest_p = pv[..., 33:, None]
            rest_z = jnp.zeros((b, c, nseg - 1, 7), pv.dtype)
            rest_s = sv[..., psize_min:].reshape(b, c, nseg - 1, psize_min)
            rest = jnp.concatenate([rest_p, rest_z, rest_s], axis=-1
                                   ).reshape(b, c,
                                             (nseg - 1) * (psize_min + 8))
            return [pv[..., :33], z7, sv[..., :psize_min], rest]
        # General segment layout, valid for ANY psize_min >= 1 (the full
        # -r 0..15 search can drive psize_min down to 1): the head param
        # slots at non-multiple positions < 33 are emitted first (at most
        # one — partition 0's parameter at sample ``order`` — is nonzero,
        # and samples 0..order-1 are zero-length, so it still precedes
        # the first nonzero sample symbol; every later partition start is
        # > order and segment-aligned).  Then each of the n/psize_min
        # segments leads with its own param slot — two reshapes instead
        # of a per-slot Python concat loop (which would build an
        # O(n/psize_min)-node XLA graph).
        nseg = n // psize_min
        extra = [j for j, pos in enumerate(ppos) if pos % psize_min]
        mult = [j for j, pos in enumerate(ppos) if pos % psize_min == 0]
        assert len(mult) == nseg
        seg = jnp.concatenate(
            [pv[..., mult][..., None],
             sv.reshape(b, c, nseg, psize_min)], axis=-1
        ).reshape(b, c, nseg * (psize_min + 1))
        return ([pv[..., extra], seg] if extra else [seg])

    values = jnp.concatenate([hdr_v, *interleave(param_v, samp_v)], axis=-1)
    lengths = jnp.concatenate([hdr_l, *interleave(param_l, samp_l)], axis=-1)
    return values, lengths


def subframe_slot_count(max_taps: int, n: int, psize_min: int) -> int:
    ppos = param_slot_positions(n, psize_min)
    if blocked_layout_ok(n, psize_min):
        nseg = n // psize_min
        samp = 40 + psize_min + (nseg - 1) * (psize_min + 8)
    else:
        nseg = n // psize_min
        samp = (len(ppos) - nseg) + nseg * (psize_min + 1)
    return 4 + 2 * max_taps + samp
