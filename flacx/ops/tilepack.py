"""Kernel-resident emit→pack path: symbols to packed frame words with no
HBM-side transposes.

The classic path (``emit.subframe_symbols`` → ``bitpack.pack_symbols``)
materializes the per-sample symbol arrays in the packer's frame-minor
transposed layout (strided XLA fusions) and pays two whole-array
transposes around the merge kernels.  Here the per-sample symbols are
emitted by ``flacx.kernels.emit_tile`` directly in tile-transposed
``[slot, lane]`` blocks with lanes = frames, the header region rides in
one small tile-string per channel, and both merge stages run on the
transposed layout (``merge_tiles_t`` / ``merge_strings_t``).  The one
remaining transpose is the final ``[G, words, lanes] → [B, words]`` of
the packed output.

Stream string order per frame (zero-padded strings are free):

  [frame header + ch0 subframe header] [ch0 sample tiles ×K]
  [ch1 subframe header] [ch1 sample tiles ×K] ... [pad to 2^m]

No explicit byte-alignment pad symbol is needed: strings are zero-filled
past their length, so the final partial byte is already zero-padded and
``nbytes = ceil(total_bits / 8)`` yields bytes identical to the classic
path's pad-symbol form.
"""

from __future__ import annotations

import jax.numpy as jnp

from flacx.ops import emit
from flacx.ops.rice import RicePlan


def pack_frames_tiled(hdr_values: jnp.ndarray, hdr_lengths: jnp.ndarray,
                      kind: jnp.ndarray, order: jnp.ndarray,
                      bps: jnp.ndarray, x: jnp.ndarray, taps: jnp.ndarray,
                      shift: jnp.ndarray, precision: int, zz: jnp.ndarray,
                      plan: RicePlan, wasted: jnp.ndarray | None,
                      psize_min: int, max_frame_bytes: int,
                      interpret: bool = False,
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Emit + pack a batch of frames through the tile-kernel path.

    Args/semantics match ``emit.subframe_symbols`` +
    ``bitpack.pack_symbols_words`` with ``hdr_*`` the frame-header
    symbols; returns ``(frame_words_le u32 [B, max_frame_bytes // 4],
    total_bits i32 [B], crc16 u32 [B])`` — the words are BYTESWAPPED so
    the byte stream is ``bitcast_convert_type(words, uint8)`` (byte-
    identical to the classic path's ``words_to_bytes``), and the frame
    CRC-16 is already folded from the packed words in VMEM
    (``flacx.kernels.crc_tile``).

    Caller-enforced gates: TPU backend, ``zz.dtype == int32``,
    ``emit.blocked_layout_ok(n, psize_min)`` OR
    ``emit.segmented_layout(n, psize_min)`` non-None, ``B % 128 == 0``,
    ``C <= 2``, ``eff_bps <= 31``.
    """
    from flacx.kernels.bitpack_tile import (TILE, merge_strings_t,
                                            merge_tiles_t)
    from flacx.kernels.emit_tile import (LANES, emit_sample_tiles,
                                         emit_sample_tiles_seg)

    b, c, n = x.shape
    grid_b = b // LANES
    nseg = n // psize_min
    blocked = emit.blocked_layout_ok(n, psize_min)
    if blocked:
        seg_layout = None
        used = 40 + psize_min + (nseg - 1) * (psize_min + 8)
    else:
        seg_layout = emit.segmented_layout(n, psize_min)
        assert seg_layout is not None, "caller must gate on layout"
        used = nseg * (psize_min + 1)
    k_tiles = -(-used // TILE)

    shv, shl = emit.subframe_header_symbols(kind, order, bps, x, taps,
                                            shift, precision, plan, wasted)
    pv, plv = emit.partition_param_symbols(kind, plan, n, psize_min)
    # per-SEGMENT parameters ([B, C, nseg] vs [B, C, N]): the kernel
    # expands them in VMEM, and the unused per-sample k_sample /
    # esc_sample expansion chains are dead-code-eliminated by XLA
    kesc = (plan.k_seg.astype(jnp.int32)
            | (plan.esc_seg.astype(jnp.int32) << 7))
    if seg_layout is not None:
        chunk_segs, extra_idx, mult_idx = seg_layout
        # on-grid params feed the kernel; OFF-grid head params (at most
        # one nonzero — partition 0's, preceding the first nonzero
        # sample) ride in each channel's header string below
        pv_seg = pv[..., jnp.asarray(mult_idx)]
        pl_seg = plv[..., jnp.asarray(mult_idx)]
        extras = jnp.asarray(extra_idx) if extra_idx else None

    def hdr_tile(v, le):
        """[B, S<=TILE] symbol row → transposed tile [grid_b, TILE, LANES]."""
        vt = jnp.pad(v.astype(jnp.uint32),
                     ((0, 0), (0, TILE - v.shape[-1])))
        lt = jnp.pad(le.astype(jnp.int32),
                     ((0, 0), (0, TILE - le.shape[-1])))
        return (vt.reshape(grid_b, LANES, TILE).transpose(0, 2, 1),
                lt.reshape(grid_b, LANES, TILE).transpose(0, 2, 1))

    # the tile-string stack is built DIRECTLY in per-frame stream order
    # ([grid_b, n_str, TILE, LANES] — one mid-axis concat) so the merged
    # output IS the upper merge's input: the round-4 post-merge regroup
    # (two ~67 MB reorder fusions + zero-pad concats to a power-of-two
    # string count per batch) is gone, and the upper merge now takes the
    # true string count (the 10 pad strings of the headline's 22→32
    # round-up rode every merge level)
    groups_v, groups_l = [], []
    for ch in range(c):
        if ch == 0:
            hv = jnp.concatenate([hdr_values, shv[:, 0]], axis=-1)
            hl = jnp.concatenate([hdr_lengths, shl[:, 0]], axis=-1)
        else:
            hv, hl = shv[:, ch], shl[:, ch]
        if seg_layout is not None and extras is not None:
            hv = jnp.concatenate([hv, pv[:, ch, extras]], axis=-1)
            hl = jnp.concatenate([hl, plv[:, ch, extras]], axis=-1)
        ht_v, ht_l = hdr_tile(hv, hl)
        if blocked:
            ev, el = emit_sample_tiles(zz, x, kesc, pv, plv, kind, order,
                                       bps, ch, psize_min,
                                       interpret=interpret)
        else:
            ev, el = emit_sample_tiles_seg(zz, x, kesc, pv_seg, pl_seg,
                                           kind, order, bps, ch,
                                           psize_min, chunk_segs,
                                           interpret=interpret)
        groups_v += [ht_v[:, None], ev.reshape(grid_b, k_tiles, TILE,
                                               LANES)]
        groups_l += [ht_l[:, None], el.reshape(grid_b, k_tiles, TILE,
                                               LANES)]

    n_str = c * (1 + k_tiles)
    vt_all = jnp.concatenate(groups_v, axis=1) \
        .reshape(grid_b * n_str, TILE, LANES)
    lt_all = jnp.concatenate(groups_l, axis=1) \
        .reshape(grid_b * n_str, TILE, LANES)
    tw, tb = merge_tiles_t(vt_all, lt_all, interpret=interpret)

    wt = tw.reshape(grid_b, n_str * TILE, LANES)
    tbs = tb.reshape(grid_b, n_str, LANES)

    cap_words = max_frame_bytes // 4
    out_rows = min(n_str * TILE, (cap_words + 2 + 511) // 512 * 512)
    # single-call upper merge holds the whole [rows, 128] stack (plus
    # roll temporaries) in VMEM; for the tall stacks of segmented
    # layouts (hi-res: 256 strings = 131072 rows = 67 MB input alone)
    # switch to the level-by-level variant, which bounds VMEM per grid
    # step at one string pair and streams levels through HBM
    from flacx.kernels.bitpack_tile import _bswap32
    if wt.shape[1] * LANES * 4 * 3 > 80 * 1024 * 1024:
        from flacx.kernels.bitpack_tile import merge_strings_t_leveled
        packed = merge_strings_t_leveled(wt, tbs, out_rows=out_rows,
                                         interpret=interpret)
        packed = _bswap32(packed)          # one XLA pass (leveled only)
    else:
        # byteswap inside the merge kernel: the byte split downstream
        # becomes a free u8 bitcast instead of a shift/or pass
        packed = merge_strings_t(wt, tbs,
                                 lanes=min(LANES, wt.shape[-1]),
                                 out_rows=out_rows, bswap=True,
                                 interpret=interpret)

    # frame CRC-16 folds on the PRE-transpose packed stack in one VMEM
    # pass (flacx.kernels.crc_tile); only the per-frame zero-tail fix
    # (one clmul on [B]) happens XLA-side
    from flacx.kernels.crc_tile import crc16_packed_t
    from flacx.ops.crcfold import (_barrett, _clmul16, CRC16_POLYNOMIAL,
                                   inverse_power_table)
    total_bits = jnp.sum(tbs, axis=1).reshape(grid_b * LANES)
    folded = crc16_packed_t(packed, le=True, interpret=interpret)
    l2 = out_rows * 4
    inv = jnp.asarray(inverse_power_table(16, CRC16_POLYNOMIAL, l2 + 1))
    nbytes = ((total_bits + 7) // 8).astype(jnp.int32)
    fix = inv[jnp.clip(l2 - nbytes, 0, l2)]
    crc = _barrett(_clmul16(folded, fix), 16, CRC16_POLYNOMIAL, 31)

    frame_words = packed.transpose(0, 2, 1).reshape(b, out_rows)
    frame_words = frame_words[:, :cap_words]
    return frame_words, total_bits, crc
