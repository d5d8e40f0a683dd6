"""Exact exhaustive Rice parameter / partition-order search, batched.

The reference re-sums every partition at every candidate order and uses a
single mean-based parameter estimate (flac/encoder.py:655-753).  Here the
per-partition quantities ``S_k = Σ (zigzag >> k)`` are computed ONCE at the
finest partition level for every k, then coarser partition orders are pairwise
sums up the tree — and the per-partition parameter is the *exact* argmin of
``S_k + (k+1)·count`` over all k, which is strictly better (never worse) than
the reference's estimate while remaining spec-conformant.

Shapes: ``zz`` is ``[..., n]`` zigzag magnitudes with zeros at warmup
positions ``i < order`` (zeros contribute nothing to any ``S_k``), ``order``
is ``[...]``.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

#: Bias added to fallback partition orders outside the user's requested
#: range so they are only selected when every requested order is invalid
#: (the reference asserts in that case, flac/encoder.py:669).
FALLBACK_BIAS = 1 << 40
INVALID = jnp.int64(1 << 50)

#: Hard cap on a complete Rice code (unary quotient + stop bit + remainder)
#: in bits.  The merge-tree bit packer (flacx.ops.bitpack) requires every
#: symbol to fit one 32-bit word, and emitting each residual sample as ONE
#: symbol (value ``(1<<k)|remainder``, length ``q+1+k``) halves the symbol
#: stream, so the parameter search only admits k with
#: ``(max(zz) >> k) + 1 + k <= CODE_BITS_MAX``.  This stays exact and
#: spec-conformant — it only restricts which k are eligible; a partition
#: with no eligible k at any order makes the whole plan infinite, and the
#: encoder's exact-size selection then falls back to a verbatim subframe
#: (which needs no Rice coding at all).
CODE_BITS_MAX = 32


class RicePlan(NamedTuple):
    bits: jnp.ndarray        # [...]   exact residual section size in bits
    porder: jnp.ndarray      # [...]   chosen partition order
    width: jnp.ndarray       # [...]   parameter field width (4 or 5)
    k_sample: jnp.ndarray    # [..., n] Rice parameter covering sample i
    #                          (escape SIZE in escaped partitions)
    param_start: jnp.ndarray  # [..., n] bool: param symbol precedes sample i
    esc_sample: jnp.ndarray  # [..., n] bool: sample i is in an ESCAPED
    #                          partition (raw k_sample-bit two's complement)
    # The same three quantities restricted to the P static param-slot
    # positions ({0..32} ∪ multiples of the finest partition size) —
    # subsampled from the small per-partition arrays, so the emitter's
    # parameter symbols never gather from the [..., n] expansions:
    k_param: jnp.ndarray     # [..., P]
    start_param: jnp.ndarray  # [..., P] bool
    esc_param: jnp.ndarray   # [..., P] bool
    # Parameter/escape at FINEST-grid granularity (one value per
    # psize_min-sample segment, nseg = 2^max_po): partitions are always
    # unions of finest-grid segments, so this is a complete per-sample
    # description in 1/psize_min the footprint — the kernel emitter
    # expands it in VMEM instead of streaming [..., n] expansions
    # through HBM (k_sample/esc_sample stay for the XLA fallback path;
    # XLA dead-code-eliminates whichever chain a program never reads):
    k_seg: jnp.ndarray       # [..., nseg] int8
    esc_seg: jnp.ndarray     # [..., nseg] bool


def zigzag(r: jnp.ndarray) -> jnp.ndarray:
    """Signed int -> non-negative folded int, dtype-preserving.

    (flac/utils.py:91-94; callers must ensure values fit with one spare
    bit — int32 inputs need |r| < 2^30.)
    """
    width = jnp.iinfo(r.dtype).bits - 1
    return (r << 1) ^ (r >> width)


def estimate_bits(zz_sum: jnp.ndarray, count: jnp.ndarray,
                  kmax: int) -> jnp.ndarray:
    """Cheap residual-size estimate used only for candidate *ranking*.

    ``k ≈ floor(log2(mean))`` (libFLAC's estimate, flac/encoder.py:730-753),
    size ≈ ``(Σu >> k) + (k+1)·m``.  Exact sizing happens in
    :func:`exact_plan` for the winning candidate.
    """
    count = jnp.maximum(count, 1)
    mean = zz_sum.astype(jnp.float64) / count
    k = jnp.clip(jnp.floor(jnp.log2(jnp.maximum(mean, 1.0))), 0,
                 kmax).astype(jnp.int64)
    return (zz_sum >> k) + (k + 1) * count


def _closed_form_fine(z: jnp.ndarray, order: jnp.ndarray, nparts_max: int,
                      kmax: int, n_k4: int, sdt, invalid_s):
    """Single-sample-partition closed-form search (see call site)."""
    zb = z.astype(sdt)
    bl = (jnp.int32(jnp.iinfo(z.dtype).bits)
          - jax.lax.clz(z).astype(jnp.int32))  # bitlen
    c1 = (jnp.arange(nparts_max) != 0) | (order[..., None] == 0)
    kstar = jnp.where(
        c1,
        jnp.where((bl >= 2)
                  & ((zb >> jnp.maximum(bl - 2, 0)) == 2),
                  bl - 2, jnp.maximum(bl - 1, 0)),
        bl)
    # smallest k with (z>>k) + k + 1 ≤ 32.  Eligibility is
    # upward-closed in k, and no k < b−5 can be eligible
    # (z>>(b−6) ≥ 32 already busts the cap), so testing candidates
    # b−1 (always eligible for b ≤ 31) down to b−5 and keeping the
    # smallest eligible is exact.
    kmin_q = jnp.maximum(bl - 1, 0)
    for cand in (2, 3, 4, 5):
        kc_ = jnp.maximum(bl - cand, 0)
        ok = (zb >> kc_) + kc_.astype(sdt) + 1 <= CODE_BITS_MAX
        kmin_q = jnp.where(ok, kc_, kmin_q)
    k5f = jnp.clip(kstar, kmin_q, kmax)
    k4f = jnp.clip(kstar, kmin_q, n_k4 - 1)
    cnt_f = c1.astype(sdt)
    # explicit code-cap check at the chosen k (the partition's worst
    # code IS its single value): covers magnitudes ≥ 2^31 (int64
    # inputs) where no k ≤ kmax is eligible, and kmin > 14 for the
    # 4-bit width
    ok5 = (zb >> k5f) + k5f.astype(sdt) + 1 <= CODE_BITS_MAX
    ok4 = (zb >> k4f) + k4f.astype(sdt) + 1 <= CODE_BITS_MAX
    min5 = jnp.where(ok5, (zb >> k5f) + (k5f.astype(sdt) + 1) * cnt_f,
                     invalid_s)
    min4 = jnp.where(ok4, (zb >> k4f) + (k4f.astype(sdt) + 1) * cnt_f,
                     invalid_s)
    return min4, k4f, min5, k5f


def exact_plan(zz: jnp.ndarray, order: jnp.ndarray, porders: Sequence[int],
               preferred: Sequence[int], kmax: int,
               allow_escape: bool = True,
               kernel_stats=None) -> RicePlan:
    """Choose partition order, method width and per-partition parameters.

    Args:
      zz: ``[..., n]`` zigzag magnitudes (int64), zeros at ``i < order``.
      order: ``[...]`` predictor order (partition 0 is short by this much).
      porders: static candidate partition orders (ascending, must divide n;
        always contains 0 as a last-resort fallback).
      preferred: subset of ``porders`` the user actually requested; other
        entries carry :data:`FALLBACK_BIAS`.
      kmax: largest Rice parameter searched (≤ 30).
      allow_escape: admit ESCAPED partitions (raw two's-complement blocks)
        wherever they are strictly smaller than every eligible Rice
        parameter — the reference decodes them (flac/decoder.py:387-411)
        but can never write them (``NotImplementedError``,
        flac/encoder.py:770-772).

    Returns a :class:`RicePlan`; ``bits`` includes the 2-bit coding method
    and 4-bit partition-order fields.
    """
    n = zz.shape[-1]
    lead = zz.shape[:-1]
    max_po = max(porders)
    nparts_max = 1 << max_po
    psize_fine = n >> max_po

    # int32 search arithmetic whenever the input is int32 (wdt-int32
    # encoders, i.e. bps ≤ 24): within the code-length cap every
    # per-partition quantity is tiny — ``q_ok`` at (k, partition)
    # implies EVERY element's ``zz >> k ≤ 31``, so eligible sums are
    # ≤ 31·psize < 2^20 and int32 never wraps where it matters; the
    # int64-emulated chains were ~2× the VPU work and HBM bytes.
    i32 = zz.dtype == jnp.int32
    sdt = jnp.int32 if i32 else jnp.int64
    invalid_s = jnp.asarray(1 << 28 if i32 else INVALID, sdt)

    ks = kernel_stats
    if ks is None:
        zzr = zz.reshape(*lead, nparts_max, psize_fine)
        # Partition maxima: finest level, then halve up the tree.
        m_by_po = {max_po: jnp.max(zzr, axis=-1)}
        for po in range(max_po, 0, -1):
            m = m_by_po[po]
            m_by_po[po - 1] = jnp.maximum(m[..., 0::2], m[..., 1::2])
    else:
        # Kernel-searched levels arrive finished (flacx.kernels.rice_tile
        # reads each zz tile once); only maxima for the escape compare
        # and the coarser-than-tile levels remain to assemble here.
        assert i32, "kernel rice stats are int32-only"
        zzr = None
        m_by_po = {po: t[4] for po, t in ks.levels.items()}

    # Per-(order, partition) running Rice minima, folded over k-CHUNKS:
    # the full ``S[..., nparts, kmax+1]`` sum tensor at the finest level
    # is ~nparts·(kmax+1)·8 bytes per lead element — fine at the default
    # orders (nparts ≤ 32) but multi-GB at -r 14 / block 16384 (nparts
    # 16384), so k is processed in slices sized to keep the in-flight
    # tensor ≤ ~32 KB per lead element.  Each k is still summed exactly
    # once; coarser levels are pairwise adds of the chunk's fine sums.
    n_k4 = min(kmax, 14) + 1  # 4-bit method can express k ≤ 14
    rice_min4, rice_arg4, rice_min5, rice_arg5 = {}, {}, {}, {}
    for po in porders:
        shape = (*lead, 1 << po)
        rice_min4[po] = jnp.full(shape, invalid_s)
        rice_arg4[po] = jnp.zeros(shape, jnp.int32)
        rice_min5[po] = jnp.full(shape, invalid_s)
        rice_arg5[po] = jnp.zeros(shape, jnp.int32)

    # Single-sample partitions (block 16384 at -r 14) get a CLOSED FORM
    # instead of the k loop: bits(k) = (z>>k) + (k+1)·c is convex in k
    # (its forward difference 1·c − [(z>>k) − (z>>(k+1))] is
    # non-decreasing), so the tie-lowest argmin is the first k where the
    # code stops shrinking — k* = b−2 if z>>(b−2) == 2 else b−1 for
    # c = 1 (b = bitlen z), and k* = b for c = 0; the code-length cap is
    # a lower clamp (first eligible k is ≤ b−1, always ≥ one exists).
    # This replaces the hottest ~13 ms/batch update chain of the hi-res
    # plan with one fused pass.
    closed_fine = psize_fine == 1 and max_po in porders
    if closed_fine:
        # z: per-partition value at single-sample partitions IS zz
        z = zz if zzr is None else zzr[..., 0]   # [..., nparts] (= n)
        (rice_min4[max_po], rice_arg4[max_po],
         rice_min5[max_po], rice_arg5[max_po]) = _closed_form_fine(
            z, order, nparts_max, kmax, n_k4, sdt, invalid_s)
        if ks is not None:
            m_by_po[max_po] = z

    if ks is not None:
        for po, (mn4, ag4, mn5, ag5, _m) in ks.levels.items():
            rice_min4[po], rice_arg4[po] = mn4, ag4
            rice_min5[po], rice_arg5[po] = mn5, ag5
        cross = [po for po in porders if po not in m_by_po]
        if cross:
            sk, m_tile = ks.tile_sums        # [..., K, nt], [..., nt]
            t = ks.tile
            ks_all = jnp.arange(kmax + 1, dtype=sdt)
            cur = t
            s, m = sk, m_tile
            for po in sorted(cross, reverse=True):   # finest first
                psize = n >> po
                while cur < psize:
                    s = s[..., 0::2] + s[..., 1::2]
                    m = jnp.maximum(m[..., 0::2], m[..., 1::2])
                    cur *= 2
                m_by_po[po] = m
                nparts = 1 << po
                is_p0 = (jnp.arange(nparts) == 0)
                cnt = psize - order[..., None] * is_p0
                bits_pk = (s + (ks_all[:, None] + 1)
                           * cnt[..., None, :].astype(sdt))
                q_ok = ((m[..., None, :] >> ks_all[:, None]
                         .astype(m.dtype))
                        + ks_all[:, None].astype(m.dtype) + 1
                        <= CODE_BITS_MAX)
                bits_pk = jnp.where(q_ok, bits_pk, invalid_s)
                rice_min5[po] = jnp.min(bits_pk, axis=-2)
                rice_arg5[po] = jnp.argmin(bits_pk, axis=-2) \
                    .astype(jnp.int32)
                sub = bits_pk[..., :n_k4, :]
                rice_min4[po] = jnp.min(sub, axis=-2)
                rice_arg4[po] = jnp.argmin(sub, axis=-2) \
                    .astype(jnp.int32)

    loop_pos = [] if ks is not None else [
        po for po in porders if not (closed_fine and po == max_po)]
    # fold levels the closed form already covered into the k-loop's
    # reduction: summing zzr at the coarsest level the loop still needs
    # skips the [..., nparts_max, kc] stack and its first halving pass
    # per k (~1 ms/batch at block 16384, profiled hi-res r4)
    loop_max = max(loop_pos) if loop_pos else -1
    zzr_loop = (None if not loop_pos else
                zzr if loop_max == max_po else
                zzr.reshape(*lead, max(1 << loop_max, 1),
                            n >> max(loop_max, 0)))
    kmajor = loop_pos and (1 << loop_max) >= 512
    if kmajor:
        # K-MAJOR formulation for many-partition searches: one
        # [..., K, nparts] sums tensor per level with k on SUBLANES and
        # partitions on LANES, so every op runs in the natural tile
        # layout and min/argmin over k is a sublane reduce.  The k-minor
        # chunk loop below put k (≤ 15 wide) on lanes — 8.5× lane waste —
        # and its per-chunk running-min update chains cost ~3 ms/batch
        # at block 16384 (profiled hi-res r4).
        ks_all = jnp.arange(kmax + 1, dtype=sdt)
        zzf = zzr.reshape(*lead, n)
        s = None
        for po in range(loop_max, -1, -1):
            psz = n >> po
            if psz <= 8:
                # explicit slice adds straight from the zigzag array: one
                # fusion producing [..., K, nparts] in the natural
                # K-sublane/nparts-lane layout.  Traffic is identical to
                # halving the previous level (psize·nparts = K·2·nparts
                # elements either way) but the lane-strided halving adds
                # made XLA materialize nparts-major copies + transposes
                # (~2.5 ms/batch at block 16384, profiled hi-res r4).
                zzl = zzf.reshape(*lead, 1 << po, psz)
                sp = None
                for j in range(psz):
                    tj = (zzl[..., j][..., None, :]
                          >> ks_all[:, None].astype(zzf.dtype)
                          ).astype(sdt)
                    sp = tj if sp is None else sp + tj
                s = sp
            elif s is None:
                s = jnp.sum(zzr_loop[..., None, :, :]
                            >> ks_all[:, None, None].astype(zzr_loop.dtype),
                            axis=-1, dtype=sdt)    # [..., K, nparts_lm]
            else:
                s = s[..., 0::2] + s[..., 1::2]
            if po not in loop_pos:
                continue
            nparts = 1 << po
            psize = n >> po
            m = m_by_po[po]
            is_p0 = (jnp.arange(nparts) == 0)
            cnt = psize - order[..., None] * is_p0      # [..., nparts]
            bits_pk = (s + (ks_all[:, None] + 1)
                       * cnt[..., None, :].astype(sdt))  # [..., K, np]
            q_ok = ((m[..., None, :] >> ks_all[:, None].astype(m.dtype))
                    + ks_all[:, None].astype(m.dtype) + 1 <= CODE_BITS_MAX)
            bits_pk = jnp.where(q_ok, bits_pk, invalid_s)
            rice_min5[po] = jnp.min(bits_pk, axis=-2)
            rice_arg5[po] = jnp.argmin(bits_pk, axis=-2).astype(jnp.int32)
            sub = bits_pk[..., :n_k4, :]
            rice_min4[po] = jnp.min(sub, axis=-2)
            rice_arg4[po] = jnp.argmin(sub, axis=-2).astype(jnp.int32)
    kc = max(1, (8192 if i32 else 4096) // max(1 << max(loop_max, 0), 1))
    for k0 in range(0, (kmax + 1) if (loop_pos and not kmajor) else 0, kc):
        k1 = min(k0 + kc, kmax + 1)
        ks_c = jnp.arange(k0, k1, dtype=sdt)
        s = jnp.stack([jnp.sum(zzr_loop >> k, axis=-1, dtype=sdt)
                       for k in range(k0, k1)], axis=-1)
        for po in range(loop_max, -1, -1):
            if po < loop_max:
                s = s[..., 0::2, :] + s[..., 1::2, :]
            if po not in loop_pos:
                continue
            nparts = 1 << po
            psize = n >> po
            m = m_by_po[po]
            is_p0 = (jnp.arange(nparts) == 0)
            cnt = psize - order[..., None] * is_p0  # [..., nparts]
            bits_pk = s + (ks_c + 1) * cnt[..., None].astype(sdt)
            # code-length cap: only k whose worst code fits one word
            q_ok = (m[..., None] >> ks_c.astype(m.dtype)) \
                + ks_c.astype(m.dtype) + 1 <= CODE_BITS_MAX
            bits_pk = jnp.where(q_ok, bits_pk, invalid_s)

            cmin = jnp.min(bits_pk, axis=-1)
            carg = (k0 + jnp.argmin(bits_pk, axis=-1)).astype(jnp.int32)
            take = cmin < rice_min5[po]     # strict: ties keep lower k
            rice_arg5[po] = jnp.where(take, carg, rice_arg5[po])
            rice_min5[po] = jnp.minimum(cmin, rice_min5[po])
            if k0 < n_k4:
                sub = bits_pk[..., : n_k4 - k0]
                cmin4 = jnp.min(sub, axis=-1)
                carg4 = (k0 + jnp.argmin(sub, axis=-1)).astype(jnp.int32)
                take4 = cmin4 < rice_min4[po]
                rice_arg4[po] = jnp.where(take4, carg4, rice_arg4[po])
                rice_min4[po] = jnp.minimum(cmin4, rice_min4[po])

    # materialize the chunked min/argmin results ONCE: each has several
    # consumers below (escape compare, totals, validity any-reduce), and
    # without the barrier XLA happily duplicates the whole k-chunk
    # where/min chain into every consumer fusion (~24 ms/batch at
    # nparts 16384, profiled hi-res r4)
    flat = []
    for po in porders:
        flat += [rice_min4[po], rice_arg4[po],
                 rice_min5[po], rice_arg5[po]]
    flat = list(jax.lax.optimization_barrier(tuple(flat)))
    for i, po in enumerate(porders):
        (rice_min4[po], rice_arg4[po],
         rice_min5[po], rice_arg5[po]) = flat[4 * i: 4 * i + 4]
    if i32:
        # rejoin the int64 tail: remap the int32 invalid sentinel (every
        # eligible int32 bits value is < 2^28, so the mapping is clean)
        for po in porders:
            rice_min4[po] = jnp.where(
                rice_min4[po] >= invalid_s, INVALID,
                rice_min4[po].astype(jnp.int64))
            rice_min5[po] = jnp.where(
                rice_min5[po] >= invalid_s, INVALID,
                rice_min5[po].astype(jnp.int64))

    best_bits = jnp.full(lead, INVALID)
    best_po = jnp.zeros(lead, jnp.int32)
    best_width = jnp.full(lead, 4, jnp.int32)
    k4_levels, k5_levels = {}, {}
    e4_levels, e5_levels = {}, {}

    for po in porders:
        nparts = 1 << po
        psize = n >> po
        m = m_by_po[po]  # [..., nparts]
        is_p0 = (jnp.arange(nparts) == 0)
        cnt = psize - order[..., None] * is_p0  # [..., nparts]

        # ESCAPED partition candidate (all-ones parameter, 5-bit raw size
        # E, then count E-bit two's-complement residuals — the grammar the
        # reference can read but never write, flac/decoder.py:387-411 vs
        # encoder.py:770-772).  E must cover the widest residual: for
        # r >= 0 signed width is bitlen(r)+1 = bitlen(zz=2r); for r < 0 it
        # is bitlen(zz=2|r|-1).  So E = bitlen(max zz), valid while ≤ 31.
        # E ≥ 1: the reference decoder's sint(0) raises (binary.py:129-131)
        # and a 1-bit escape is never worse than a 0-bit one by more than
        # count bits on all-zero sub-5-sample partitions.
        mbits = jnp.iinfo(m.dtype).bits
        esc_e = jnp.maximum(mbits - jax.lax.clz(m), 1).astype(jnp.int64)
        esc_cost = 5 + esc_e * cnt.astype(jnp.int64)
        esc_cost = jnp.where(allow_escape & (esc_e <= 31), esc_cost,
                             INVALID)

        min4, arg4 = rice_min4[po], rice_arg4[po]
        min5, arg5 = rice_min5[po], rice_arg5[po]
        esc4 = esc_cost < min4
        esc5 = esc_cost < min5
        min4 = jnp.minimum(min4, esc_cost)
        min5 = jnp.minimum(min5, esc_cost)
        e_i32 = esc_e.astype(jnp.int32)
        k4_levels[po] = jnp.where(esc4, e_i32, arg4)
        k5_levels[po] = jnp.where(esc5, e_i32, arg5)
        e4_levels[po], e5_levels[po] = esc4, esc5

        tot4 = 6 + jnp.sum(4 + min4, axis=-1)
        tot5 = 6 + jnp.sum(5 + min5, axis=-1)

        # a partition with NO eligible coding (no k fits the code cap and
        # no escape) poisons the whole order; summing INVALID over up to
        # 2^15 partitions would wrap int64, so mask explicitly
        valid = ((psize > order)
                 & ~jnp.any(min4 >= INVALID, axis=-1))
        valid5 = ((psize > order)
                  & ~jnp.any(min5 >= INVALID, axis=-1))
        bias = 0 if po in preferred else FALLBACK_BIAS
        tot4 = jnp.where(valid, tot4 + bias, INVALID)
        tot5 = jnp.where(valid5, tot5 + bias, INVALID)

        take4 = tot4 < best_bits
        best_po = jnp.where(take4, po, best_po)
        best_width = jnp.where(take4, 4, best_width)
        best_bits = jnp.where(take4, tot4, best_bits)

        take5 = tot5 < best_bits
        best_po = jnp.where(take5, po, best_po)
        best_width = jnp.where(take5, 5, best_width)
        best_bits = jnp.where(take5, tot5, best_bits)

    best_bits = best_bits - jnp.where(best_bits >= FALLBACK_BIAS,
                                      FALLBACK_BIAS, 0)

    psize_min = n >> max_po
    nseg = 1 << max_po

    # Finest-grid (segment) copies, built HIERARCHICALLY: walk orders
    # coarse→fine, upsampling the working grid by broadcast-reshape and
    # overriding where that order won.  Total traffic ≈ 2·nseg per
    # channel instead of len(porders)·nseg — the 15 independent
    # [..., nseg] expansions cost ~1.6 ms/batch at block 16384
    # (profiled hi-res r4).
    k_seg = jnp.zeros((*lead, 1), jnp.int8)
    esc_seg = jnp.zeros((*lead, 1), bool)
    cur_po = 0
    for po in sorted(porders):
        if po > cur_po:
            f = 1 << (po - cur_po)
            up = (*lead, k_seg.shape[-1], f)
            k_seg = jnp.broadcast_to(k_seg[..., None], up
                                     ).reshape(*lead, 1 << po)
            esc_seg = jnp.broadcast_to(esc_seg[..., None], up
                                       ).reshape(*lead, 1 << po)
            cur_po = po
        w4 = (best_width == 4)[..., None]
        args = jnp.where(w4, k4_levels[po], k5_levels[po]).astype(jnp.int8)
        escs = jnp.where(w4, e4_levels[po], e5_levels[po])
        here = (best_po == po)[..., None]
        # barrier per level: without it XLA sinks every upsample into
        # the final consumer's layout, re-materializing each where-step
        # at FULL nseg size (15 × [..., nseg] fusions ≈ 1.4 ms/batch at
        # block 16384 — exactly the chain the hierarchy exists to avoid)
        k_seg, esc_seg = jax.lax.optimization_barrier(
            (jnp.where(here, args, k_seg), jnp.where(here, escs, esc_seg)))
    if cur_po < max_po:
        f = 1 << (max_po - cur_po)
        up = (*lead, k_seg.shape[-1], f)
        k_seg = jnp.broadcast_to(k_seg[..., None], up).reshape(*lead, nseg)
        esc_seg = jnp.broadcast_to(esc_seg[..., None], up
                                   ).reshape(*lead, nseg)

    # Every other parameter field DERIVES from the segment grid (the
    # partition of the chosen order containing sample i is segment
    # i // psize_min): one broadcast-reshape per [..., n] field, one
    # static gather per slot field, one data-dependent modulo for each
    # start mask — replacing the per-order expand-and-select chains
    # (15 full-size [..., n] fusions ≈ 1.4 ms/batch at block 16384,
    # profiled hi-res r4).  int8 per-sample parameter: k ≤ 30 and
    # escape size E ≤ 31 both fit; consumers promote on use.
    k_sample = jnp.broadcast_to(k_seg[..., None],
                                (*lead, nseg, psize_min)).reshape(*lead, n)
    esc_sample = jnp.broadcast_to(esc_seg[..., None],
                                  (*lead, nseg, psize_min)).reshape(*lead, n)
    i = jnp.arange(n, dtype=jnp.int32)
    psz_best = (jnp.asarray(n, jnp.int32) >> best_po)[..., None]  # [...,1]
    param_start = ((i % psz_best == 0) & (i > 0)) | (i == order[..., None])

    # param-slot subsampled copies (static positions {0..32} ∪ multiples
    # of psize_min) — emitters must never gather these from the [..., n]
    # expansions (a 64-column gather forces the whole expansion to
    # materialize in gather layout, ~0.8 ms/batch profiled)
    ppos = sorted(set(range(min(33, n))) | set(range(0, n, psize_min)))
    np_ppos = np.asarray(ppos, np.int32)
    if len(ppos) == n and psize_min == 1:
        k_param, esc_param, start_param = k_seg, esc_seg, param_start
    else:
        part_idx = jnp.asarray(np_ppos // psize_min, jnp.int32)
        k_param = k_seg[..., part_idx]
        esc_param = esc_seg[..., part_idx]
        posP = jnp.asarray(np_ppos, jnp.int32)
        start_param = (((posP % psz_best) == 0) & (posP > 0)) \
            | (posP == order[..., None])

    return RicePlan(bits=best_bits, porder=best_po, width=best_width,
                    k_sample=k_sample, param_start=param_start,
                    esc_sample=esc_sample, k_param=k_param,
                    start_param=start_param, esc_param=esc_param,
                    k_seg=k_seg, esc_seg=esc_seg)
