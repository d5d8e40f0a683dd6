"""Device bit-unpacker: parallel Rice/escape/verbatim symbol decode.

This is the decode-side counterpart of the prefix-sum bit packer — the
SURVEY-mandated vectorized bit-unpack kernel (SURVEY.md §2.1 #2: "gather
64-bit windows at arbitrary bit offsets; unary-code scan for Rice
quotients (parallel clz formulation)"), replacing the reference's per-bit
unary loop (flac/decoder.py:414-421, flac/binary.py:97-127).

The decode grammar is bit-serial *within* a symbol chain, so the host
walker (``flacx.native.scan_frames``) checkpoints the bit cursor every
``S`` samples and the device decodes all ``[F, C, n/S]`` chunks of a
batch in parallel, each chunk advancing S symbols in one ``lax.scan``:

  * every chunk's word span is gathered ONCE up front into an L-major
    ``[L, lanes]`` array whose minor axis is the flattened
    ``F·C·K`` chunk-lane space — each ``local[j]`` slice is a
    perfectly-tiled vector, so the per-step 64-bit window extraction is
    a leading-axis one-hot masked reduction: pure, layout-friendly VPU
    work.  (Both a per-step 3-word gather and an ``[F,C,K,L]``
    minor-axis layout measured 3–10× slower: TPU gathers cost ~10 ns
    per index in-program, and an L=32 minor axis pads 128-lane tiles
    4×.)
  * ``lax.clz`` over the window gives every lane's unary quotient at
    once; remainder / escape / verbatim fields are plain shifts,
  * partition parameter fields are consumed in-step when a lane's sample
    index crosses a partition boundary.

Self-validating: every lane's final cursor must land exactly on the next
chunk's checkpoint.  Any violation (a symbol not contained in one
64-bit window, a cursor escaping its span bucket — impossible in
flacx'/libFLAC's own streams, vanishingly rare elsewhere) sets an error
flag and the caller falls back to the strict host parser, so exactness
is never at risk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bytes_to_words(rows: jnp.ndarray) -> jnp.ndarray:
    """``[F, W]`` u8 rows → ``[F, W/4 + 2]`` big-endian u32 words.

    W must be a multiple of 4; two zero words are appended so 3-word
    window reads never clamp into live data.
    """
    f, w = rows.shape
    r = rows.astype(jnp.uint32).reshape(f, w // 4, 4)
    words = ((r[..., 0] << 24) | (r[..., 1] << 16)
             | (r[..., 2] << 8) | r[..., 3])
    return jnp.pad(words, ((0, 0), (0, 2)))


def gather_chunk_windows_t(words: jnp.ndarray, ckpt_pos: jnp.ndarray,
                           span_words: int,
                           use_mxu: bool | None = None
                           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pre-gather chunk word windows, L-major.

    Returns ``(local [L, F·C·K] u32, base [F·C·K] i32)`` with
    ``L = span_words + 8`` and ``base`` the 8-word-aligned start of each
    chunk's window (``local[j, lane] = words[lane_frame, base+j]``); the
    in-scan extractor absorbs the 0..7-word misalignment.

    Two formulations:

    * flat per-element gather (~34 ms at batch 1024: TPU in-program
      gathers cost ~10 ns per index regardless of locality — still the
      best of the gather family; a per-scan-step 3-word gather measured
      289 ms and a slice-gather + barrel shift 247 ms),
    * MXU one-hot contraction (default on TPU): rows are cut into
      aligned 8-word blocks; a per-chunk one-hot over the ~W/8 block
      indices contracts with the blocks' byte planes on the systolic
      array — ``local[f,c,:] = Σ_n 1[n = base/8] · seg[f,n,:]``.  Exact
      by construction: each sum has exactly ONE nonzero term and values
      ride as four 8-bit byte planes, integers ≤ 255 being exact in
      bf16 at the MXU's native (fast-path) precision.

    The [L, lanes] L-major output layout makes every in-scan
    ``local[j]`` slice a perfectly tiled vector.
    """
    f, c, k = ckpt_pos.shape
    lanes = f * c * k
    start_w = (ckpt_pos >> 5).astype(jnp.int32)
    base = (start_w & ~7).reshape(f, c * k)                  # [F,CK]
    span_local = span_words + 8
    if use_mxu is None:
        use_mxu = jax.default_backend() == "tpu"
    wordsp = jnp.pad(words, ((0, 0), (0, span_local + 8)))

    if not use_mxu:
        j = jnp.arange(span_local, dtype=jnp.int32)
        idx = (base[:, :, None] + j).reshape(f, c * k * span_local)
        got = jnp.take_along_axis(wordsp, idx, axis=1)
        return (jnp.transpose(got.reshape(f, c * k, span_local),
                              (2, 0, 1)).reshape(span_local, lanes),
                base.reshape(lanes))

    nblk = (words.shape[1] + 7) // 8
    nshift = span_local // 8                                  # L/8 blocks
    blocks = wordsp[:, : (nblk + nshift) * 8].reshape(f, nblk + nshift, 8)
    segs = jnp.concatenate([blocks[:, s: s + nblk]
                            for s in range(nshift)], axis=-1)  # [F,nblk,L]
    rhs = jnp.concatenate([((segs >> sh) & 0xFF).astype(jnp.bfloat16)
                           for sh in (24, 16, 8, 0)], axis=-1)  # [F,n,4L]
    onehot = (jnp.arange(nblk, dtype=jnp.int32) == (base >> 3)[..., None]
              ).astype(jnp.bfloat16)                          # [F,CK,n]
    got = jnp.einsum("fcn,fnz->fcz", onehot, rhs,
                     preferred_element_type=jnp.float32)
    by = [got[..., i * span_local:(i + 1) * span_local].astype(jnp.uint32)
          for i in range(4)]
    local = (by[0] << 24) | (by[1] << 16) | (by[2] << 8) | by[3]
    return (jnp.transpose(local, (2, 0, 1)).reshape(span_local, lanes),
            base.reshape(lanes))


def _window64_onehot(local: jnp.ndarray, off: jnp.ndarray,
                     sh: jnp.ndarray) -> jnp.ndarray:
    """64 bits at word offset ``off`` + bit shift ``sh`` in each lane's
    local chunk span (MSB-first), via one-hot masked sums (no gather).

    local: ``[L, lanes]`` u32; off/sh: ``[lanes]`` i32 → ``[lanes]`` u64.
    """
    j = jnp.arange(local.shape[0], dtype=jnp.int32)[:, None]
    # one streaming pass over the leading L axis extracts all 3 words
    wa = jnp.sum(jnp.where(j == off, local, 0), axis=0,
                 dtype=jnp.uint32).astype(jnp.uint64)
    wb = jnp.sum(jnp.where(j == off + 1, local, 0), axis=0,
                 dtype=jnp.uint32).astype(jnp.uint64)
    wc = jnp.sum(jnp.where(j == off + 2, local, 0), axis=0,
                 dtype=jnp.uint32).astype(jnp.uint64)
    shw = sh.astype(jnp.uint64)
    # wc >> (32 - sh) is exact for sh == 0 too: wc < 2**32 in a u64
    return (((wa << jnp.uint64(32)) | wb) << shw) | (wc >> (jnp.uint64(32)
                                                            - shw))


def _clz64(win: jnp.ndarray) -> jnp.ndarray:
    hi = (win >> jnp.uint64(32)).astype(jnp.uint32)
    lo = win.astype(jnp.uint32)
    return jnp.where(hi != 0, jax.lax.clz(hi),
                     32 + jax.lax.clz(lo)).astype(jnp.int32)


def parse_residual_chunks(words: jnp.ndarray, ckpt_pos: jnp.ndarray,
                          ckpt_param: jnp.ndarray, ckpt_esc: jnp.ndarray,
                          ckpt_inesc: jnp.ndarray, kind: jnp.ndarray,
                          order: jnp.ndarray, po: jnp.ndarray,
                          width: jnp.ndarray, n: int, s_interval: int,
                          span_words: int = 24) -> tuple[jnp.ndarray,
                                                         jnp.ndarray]:
    """Decode all residual/verbatim symbols of a frame batch in parallel.

    Args:
      words: ``[F, Wp]`` u32 big-endian frame rows (``bytes_to_words``).
      ckpt_*: ``[F, C, K]`` walker checkpoints (cursor bit position,
        current Rice parameter, escape size, in-escape flag).
      kind/order/po/width: ``[F, C]`` subframe structure.
      n: block size (static); s_interval: checkpoint interval (static).
      span_words: static words-per-chunk window bucket; any chunk whose
        cursor escapes its window sets the error flag (caller falls back
        to the host parser), so an undersized bucket costs speed only.
    Returns:
      ``(vals [F, C, n] int64, err [] bool)`` — zigzag-decoded residuals
      (warmup positions are zero), batch-level error flag.
    """
    f, c, k = ckpt_pos.shape
    s = s_interval
    n_pad = k * s
    lanes = f * c * k
    local, b0 = gather_chunk_windows_t(words, ckpt_pos, span_words)
    span_local = local.shape[0]

    # ---- per-sample grammar masks (precomputed, vectorized) --------------
    j = jnp.arange(n_pad, dtype=jnp.int32)                       # [n_pad]
    pred = (kind >= 2)[..., None]
    psize = (n >> po)[..., None]                                 # [F,C,1]
    in_block = j < n
    at_start = (pred & in_block
                & ((j == order[..., None])
                   | ((j > 0) & (j % psize == 0))))              # [F,C,n_pad]
    active = in_block & (pred & (j >= order[..., None])
                         | (kind == 1)[..., None])

    def to_steps(m):  # [F, C, n_pad] -> [S_steps, lanes]
        return jnp.moveaxis(m.reshape(f, c, k, s), -1, 0).reshape(s, lanes)

    xs = (to_steps(at_start), to_steps(active))

    def lanewise(a):  # [F, C] -> [lanes]
        return jnp.broadcast_to(a[..., None], (f, c, k)).reshape(lanes)

    width_l = lanewise(width.astype(jnp.int32))
    escape_val = (1 << width_l) - 1
    u64 = jnp.uint64

    def step(carry, x):
        pos, param, esc, inesc, err = carry
        start_m, act_m = x
        off = (pos >> 5) - b0
        win = _window64_onehot(local, off, pos & 31)

        # partition parameter field (and 5-bit escape size) in-window
        wf = jnp.where(start_m, width_l, 0)
        p_field = (win >> (u64(64) - wf.astype(u64))).astype(jnp.int32)
        p_field = jnp.where(start_m, p_field, 0)
        is_esc = start_m & (p_field == escape_val)
        esc_field = ((win >> (u64(59) - wf.astype(u64)))
                     & u64(31)).astype(jnp.int32)
        param = jnp.where(start_m & ~is_esc, p_field, param)
        esc = jnp.where(is_esc, esc_field, esc)
        inesc = jnp.where(start_m, is_esc, inesc)
        consumed = wf + jnp.where(is_esc, 5, 0)
        vwin = win << consumed.astype(u64)

        # Rice: clz gives the unary quotient for every lane at once
        q = _clz64(vwin)
        code_bits = q + 1 + param
        rem_sh = jnp.clip(64 - code_bits, 0, 63).astype(u64)
        rem = ((vwin >> rem_sh)
               & ((u64(1) << param.astype(u64)) - u64(1))).astype(jnp.int64)
        u = (q.astype(jnp.int64) << param.astype(jnp.int64)) | rem
        rice_val = (u >> 1) ^ -(u & 1)

        # escape partitions / verbatim: esc-bit signed field (arithmetic
        # shift of the signed window sign-extends for free)
        esc_sh = jnp.clip(64 - esc, 1, 64).astype(u64)
        esc_val = jnp.where(esc > 0,
                            vwin.astype(jnp.int64) >> esc_sh.astype(jnp.int64),
                            0)

        val = jnp.where(inesc, esc_val, rice_val)
        used = consumed + jnp.where(inesc, esc, code_bits)
        err = err | (act_m & ((used > 64) | (off > span_local - 3)))
        pos = pos + jnp.where(act_m, used, 0)
        val = jnp.where(act_m, val, 0)
        return (pos, param, esc, inesc, err), val

    carry0 = (ckpt_pos.reshape(lanes).astype(jnp.int32),
              ckpt_param.reshape(lanes).astype(jnp.int32),
              ckpt_esc.reshape(lanes).astype(jnp.int32),
              ckpt_inesc.reshape(lanes).astype(bool),
              jnp.zeros((lanes,), bool))
    (pos_end, *_, err), ys = jax.lax.scan(step, carry0, xs, unroll=4)

    # self-check: each chunk must land exactly on the next checkpoint
    pos_end = pos_end.reshape(f, c, k)
    chain_ok = pos_end[..., :-1] == ckpt_pos[..., 1:]
    err_any = jnp.any(err) | ~jnp.all(chain_ok)

    vals = jnp.transpose(ys.reshape(s, f, c, k),
                         (1, 2, 3, 0)).reshape(f, c, n_pad)[..., :n]
    return vals, err_any
