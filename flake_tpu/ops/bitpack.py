"""Device-side FLAC bitstream emission: the last serial stage made dense.

The reference emits each frame through a sequential BitWriter
(bitio.h:83-141, encode.c:766-798); the host C++ packer parallelises
over frames but still ships the raw analysis tensors over D2H — ~2x the
raw audio and ~3x the compressed output (the round-3 e2e bottleneck).
This module emits the final frame bytes *on device* as pure dense XLA
ops, so only ~the compressed bytes cross D2H.

The TPU-first formulation rests on three observations:

1. Every frame is a fixed *layout* of variable-*length* bit fields
   (header bytes, subframe headers, warm-ups, coefficients, Rice
   parameters, one Rice code per sample). With a static slot table the
   per-slot bit lengths become a dense [F, M] tensor and the bit
   offsets one exclusive cumsum.
2. A Rice code's leading quotient bits are all ZERO: its only nonzero
   "payload" is the terminating 1 and the k low remainder bits —
   <= 31 bits regardless of the quotient. Every other field is its own
   <= 32-bit payload. So emission = OR of per-slot payloads at their
   bit positions into a zero buffer — and since field extents are
   disjoint, OR == ADD (no carries).
3. Payload start positions are monotonic along the slot axis, so the
   per-32-bit-word sum of payload contributions is a *difference of a
   running uint32 prefix sum* at boundaries found by binary search:
   word[w] = (cumhi[S(w+1)] - cumhi[S(w)]) + (cumlo[S(w)] - cumlo[S(w-1)])
   where hi/lo are each slot's payload split across its (at most two)
   target words. uint32 wraparound cancels in the differences; the true
   per-word sum never overflows because bits are disjoint.

No scatter, no serial loop, no Pallas required — cumsum + gathers, all
batched over frames. CRC-8/CRC-16 placeholders are emitted as zeros and
patched on host over the final bytes (flake_crc_patch), which is the
only remaining host byte-touching.

Slot payloads are capped at 32 bits; sample fields that can exceed it
(bps-32 stereo's 33-bit side channel) are emitted as (hi, lo) slot
pairs that the round-5 slot combiner re-joins into one 64-bit payload
node, so every legal config packs on device (``supports``).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from flake_tpu import params as P
from flake_tpu.ops.frame import (SF_CONSTANT, SF_FIXED, SF_LPC,
                                 SF_VERBATIM, FrameConfig)
from flake_tpu.ops.rice import limit_max_partition_order

HDR_SLOTS = 16  # max header bytes: 4 fixed + 7 utf8 + 2 + 2 + crc8


def supports(cfg: FrameConfig) -> bool:
    """Device emission covers every legal config: fields wider than 32
    bits (bps-32 stereo's 33-bit side channel, encode.c:676-693) are
    emitted as two adjacent slots (hi 17 / lo 16) that the slot
    combiner re-joins into one 64-bit payload node."""
    return True


def _split_wide(cfg: FrameConfig) -> bool:
    """Whether sample fields may exceed a 32-bit payload (config
    static): obits = bps (+1 for a side channel)."""
    return cfg.bps + (1 if cfg.channels == 2 else 0) > 32


def slot_bytes(cfg: FrameConfig) -> int:
    """Static per-frame output slot size in bytes (multiple of 512 so
    the word view tiles as [wr, 128] int32 rows)."""
    vsize = P.max_frame_size(cfg.block_size, cfg.channels, cfg.bps)
    return (-(-(vsize + 8) // 512)) * 512


def word_rows(cfg: FrameConfig) -> int:
    """Rows of the [F, wr, 128] int32 per-frame word layout."""
    return slot_bytes(cfg) // 512


def frame_header_bytes(nums: np.ndarray, *, bs_code, sr_code,
                       allow_vbs: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-side frame header byte content (encode.c:718-764) minus the
    device-known 4-bit channel-assignment field (OR'd in on device) and
    the CRC-8 (patched on host after emission, as a zero placeholder).

    Returns (bytes uint8 [F, HDR_SLOTS], nbytes int32 [F])."""
    F = nums.shape[0]
    out = np.zeros((F, HDR_SLOTS), dtype=np.uint8)
    nbytes = np.zeros(F, dtype=np.int32)
    for f in range(F):
        b = bytearray()
        b.append(0xFF)
        b.append(0xF8 | (1 if allow_vbs else 0))
        b.append(((bs_code[0] & 0xF) << 4) | (sr_code[0] & 0xF))
        b.append(0)  # (ch_assign << 4) | (bps_code << 1) set on device
        val = int(nums[f])
        if val < 0x80:
            b.append(val)
        else:
            lg = val.bit_length() - 1
            nb = (lg + 4) // 5
            shift = (nb - 1) * 6
            b.append((256 - (256 >> nb)) | (val >> shift))
            while shift >= 6:
                shift -= 6
                b.append(0x80 | ((val >> shift) & 0x3F))
        if bs_code[1] >= 0:
            if bs_code[1] < 256:
                b.append(bs_code[1])
            else:
                b += bytes([bs_code[1] >> 8, bs_code[1] & 0xFF])
        if sr_code[1] > 0:
            if sr_code[1] < 256:
                b.append(sr_code[1])
            else:
                b += bytes([sr_code[1] >> 8, sr_code[1] & 0xFF])
        b.append(0)  # CRC-8 placeholder
        out[f, :len(b)] = b
        nbytes[f] = len(b)
    return out, nbytes


def _exclusive_cumsum_hier(x):
    """Exclusive prefix sum along the last axis via hierarchical
    log-shift doubling — pure elementwise adds. jnp.cumsum's TPU
    lowering is pathological at these shapes (~34 ms for [512, 8876]);
    this is the same math as ~8 shifted adds plus a tiny chunk-level
    pass. x int32 [F, M]; returns int32 [F, M]."""
    F, M = x.shape
    nc = -(-M // 128)
    xp = jnp.pad(x, ((0, 0), (0, nc * 128 - M))) if nc * 128 != M else x
    inc = xp.reshape(F, nc, 128)
    for s in (1, 2, 4, 8, 16, 32, 64):
        inc = inc + jnp.pad(inc[..., :-s], ((0, 0), (0, 0), (s, 0)))
    tot = inc[..., -1]                                  # [F, nc]
    ctot = tot
    s = 1
    while s < nc:
        ctot = ctot + jnp.pad(ctot[..., :-s], ((0, 0), (s, 0)))
        s <<= 1
    base = ctot - tot                                   # exclusive
    out = (inc + base[..., None]).reshape(F, nc * 128) \
        - xp
    return out[:, :M]


def _batched_lower_bound(a, targets):
    """First index j with a[f, j] >= w, for every frame f and every
    target w — a broadcast binary search (sorted ``a`` along axis 1).

    a int32 [F, M] non-decreasing; targets int32 [V] or [F, V].
    Returns int32 [F, V] in [0, M]."""
    F, M = a.shape
    if targets.ndim == 1:
        targets = jnp.broadcast_to(targets[None, :],
                                   (F, targets.shape[0]))
    lo = jnp.zeros(targets.shape, jnp.int32)
    hi = jnp.full(targets.shape, M, jnp.int32)
    steps = max(1, (M + 1).bit_length())
    for _ in range(steps):
        mid = (lo + hi) >> 1
        am = jnp.take_along_axis(a, jnp.clip(mid, 0, M - 1), axis=1)
        # mid == M only when lo == hi == M (converged at the end): the
        # clipped read then sees a[M-1] and must NOT push lo past M
        go_right = (am < targets) & (mid < M)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


# ---------------------------------------------------------------------------
# round 5: two-level slot combining (pair -> quad, 64-bit payload cap)
# ---------------------------------------------------------------------------
#
# The merge kernel's cost scales with slot-chunk count, so adjacent
# slots are combined twice before alignment: a node is (len, sw, g,
# ph:pl) — a bitstring of `len` bits whose nonzero bits live in
# [len-g-sw, len-g), stored as the 64-bit integer ph*2^32+pl < 2^sw.
# Combining A+B shifts A's payload up by lenB (+gap bookkeeping) and
# ORs B's in; Rice codes' leading zero runs cost only length. A node
# that would exceed 64 significant bits keeps A and spills B whole to
# a per-level side array (full capacity — there is no overflow case),
# which is ~all-zero on real content and skipped per-chunk in the
# kernel via an activity flag in the cb sign bit.


def _shr32(x, s):
    """x >> s for s in [1, 32] (s==32 -> 0; negative s is garbage but
    callers select those lanes away)."""
    u32 = jnp.uint32
    return (x >> u32(1)) >> jnp.clip(s - 1, 0, 31).astype(u32)


def _shl64(ph, pl, sh):
    """(ph:pl) << sh for sh in [0, 63]; caller guarantees the result
    stays within 64 bits."""
    u32 = jnp.uint32
    shc = jnp.clip(sh, 0, 63)
    lo_sh = jnp.clip(shc, 0, 31).astype(u32)
    big = shc >= 32
    sh2 = jnp.clip(shc - 32, 0, 31).astype(u32)
    nph = jnp.where(big, pl << sh2,
                    (ph << lo_sh) | _shr32(pl, 32 - shc))
    npl = jnp.where(big, u32(0), pl << lo_sh)
    return nph, npl


def _pad_even(x, fill=0):
    if x.shape[-1] % 2:
        pads = [(0, 0)] * (x.ndim - 1) + [(0, 1)]
        x = jnp.pad(x, pads, constant_values=fill)
    return x


def _combine_level(ln, sw, g, ph, pl, cap=64):
    """One pairwise combining level along the last (even-length) axis.
    Returns combined nodes [.., M/2] and the spill node arrays
    (payload sw/relative start/ph/pl), zero where no spill."""
    u32 = jnp.uint32
    lnA, lnB = ln[..., 0::2], ln[..., 1::2]
    swA, swB = sw[..., 0::2], sw[..., 1::2]
    gA, gB = g[..., 0::2], g[..., 1::2]
    phA, phB = ph[..., 0::2], ph[..., 1::2]
    plA, plB = pl[..., 0::2], pl[..., 1::2]

    sh = gA + lnB - gB                 # >= swB: ORs stay disjoint
    sw_c = swA + sh
    fits = sw_c <= cap
    sph, spl = _shl64(phA, plA, jnp.where(fits, sh, 0))

    azero = swA == 0
    bzero = swB == 0
    ln_n = lnA + lnB
    sw_n = jnp.where(azero, swB,
                     jnp.where(bzero, swA,
                               jnp.where(fits, sw_c, swA)))
    g_n = jnp.where(azero, gB,
                    jnp.where(bzero | ~fits, gA + lnB, gB))
    ph_n = jnp.where(azero, phB,
                     jnp.where(bzero, phA,
                               jnp.where(fits, sph | phB, phA)))
    pl_n = jnp.where(azero, plB,
                     jnp.where(bzero, plA,
                               jnp.where(fits, spl | plB, plA)))

    sp = (~azero) & (~bzero) & (~fits)
    s_sw = jnp.where(sp, swB, 0)
    s_rel = jnp.where(sp, lnA + lnB - gB - swB, 0)
    s_ph = jnp.where(sp, phB, u32(0))
    s_pl = jnp.where(sp, plB, u32(0))
    return (ln_n, sw_n, g_n, ph_n, pl_n), (s_sw, s_rel, s_ph, s_pl)


def _align3(ps, sw, ph, pl):
    """Aligned 3-word contributions of a <=64-bit payload occupying
    bits [ps, ps+sw): (w0, A->w0, B->w0+1, C->w0+2)."""
    i32 = jnp.int32
    u32 = jnp.uint32
    active = sw > 0
    w0 = (ps >> 5).astype(i32)
    t = (ps & 31) + sw                 # in [1, 95] when active
    z = 96 - t                         # left shift inside the window
    zc = jnp.clip(z, 1, 31).astype(u32)
    A1 = _shr32(ph, 32 - z)
    B1 = (ph << zc) | _shr32(pl, 32 - z)
    C1 = pl << zc
    z2 = jnp.clip(z - 32, 0, 31).astype(u32)
    A2 = (ph << z2) | _shr32(pl, 64 - z)
    B2 = pl << z2
    z3 = jnp.clip(z - 64, 0, 31).astype(u32)
    A3 = pl << z3
    big2 = z >= 64
    big1 = z >= 32
    A = jnp.where(big2, A3, jnp.where(big1, A2, A1))
    Bw = jnp.where(big2, u32(0), jnp.where(big1, B2, B1))
    Cw = jnp.where(big1, u32(0), C1)
    A = jnp.where(active, A, u32(0)).astype(i32)
    Bw = jnp.where(active, Bw, u32(0)).astype(i32)
    Cw = jnp.where(active, Cw, u32(0)).astype(i32)
    w0 = jnp.where(active, w0, 0)
    return w0, A, Bw, Cw


def _to_rows(x):
    """[F, M] -> [F, nc, 128] row layout (nodes on lanes)."""
    F, M = x.shape
    nc = -(-M // 128)
    if nc * 128 != M:
        x = jnp.pad(x, ((0, 0), (0, nc * 128 - M)))
    return x.reshape(F, nc, 128)


def kmax_for(cfg: FrameConfig) -> tuple[int, int]:
    """Static output-row spans per chunk for the combined merge.

    A 128-node main chunk covers 512 original slots; with per-
    partition-optimal Rice parameters the average code stays under
    obits+3 bits, so the chunk's bit range is bounded and the row span
    is static. Content that still exceeds it (legal but pathological
    mixes) trips the `overflow` flag and re-packs via the XLA path."""
    ob = cfg.bps + (1 if cfg.channels == 2 else 0)
    k2 = -(-(512 * (ob + 3) + 95) // 4096) + 1
    k1 = -(-(256 * (ob + 3) + 95) // 4096) + 1
    return k2, k1


def build_combined_parts(lengths, leading, payload, total_bits,
                         kmax: int, kmax1: int):
    """Combine slots twice and align for the v5 merge kernel.

    Returns (kernel_inputs..., overflow[F] bool): mainw, (mA, mB, mC),
    sp2w, (s2A, s2B, s2C), sp1w, (s1A, s1B), cb2, cb1."""
    i32 = jnp.int32
    ln = _pad_even(lengths)
    lead = _pad_even(leading)
    pay = _pad_even(payload)
    sw = ln - lead
    g = jnp.zeros_like(ln)
    ph = jnp.zeros_like(pay)

    (ln1, sw1, g1, ph1, pl1), (s1_sw, s1_rel, s1_ph, s1_pl) = \
        _combine_level(ln, sw, g, ph, pay)
    ln1p = _pad_even(ln1)
    (ln2, sw2, g2, ph2, pl2), (s2_sw, s2_rel, s2_ph, s2_pl) = \
        _combine_level(_pad_even(ln1), _pad_even(sw1), _pad_even(g1),
                       _pad_even(ph1), _pad_even(pl1))

    off2 = _exclusive_cumsum_hier(ln2)
    lnA = ln1p[..., 0::2]
    off1 = jnp.stack([off2, off2 + lnA], axis=-1) \
        .reshape(off2.shape[0], -1)[..., :ln1.shape[-1]]

    m_w0, m_A, m_B, m_C = _align3(off2 + ln2 - g2 - sw2, sw2, ph2, pl2)
    s2_w0, s2_A, s2_B, s2_C = _align3(off2 + s2_rel, s2_sw, s2_ph,
                                      s2_pl)
    s1_w0, s1_A, s1_B, _ = _align3(off1 + s1_rel, s1_sw, s1_ph, s1_pl)

    mainw = _to_rows(m_w0)
    mainr = tuple(_to_rows(v) for v in (m_A, m_B, m_C))
    sp2w = _to_rows(s2_w0)
    sp2r = tuple(_to_rows(v) for v in (s2_A, s2_B, s2_C))
    sp1w = _to_rows(s1_w0)
    sp1r = tuple(_to_rows(v) for v in (s1_A, s1_B))

    nc2 = mainw.shape[1]
    nc1 = sp1w.shape[1]
    M4 = ln2.shape[-1]
    pad2 = nc2 * 128 - M4
    offp = jnp.pad(off2, ((0, 0), (0, pad2)), mode="edge") \
        if pad2 else off2
    cb2 = jnp.concatenate(
        [offp[:, ::128], total_bits[:, None]], axis=-1).astype(i32)
    M2 = ln1.shape[-1]
    pad1 = nc1 * 128 - M2
    off1p = jnp.pad(off1, ((0, 0), (0, pad1)), mode="edge") \
        if pad1 else off1
    cb1 = jnp.concatenate(
        [off1p[:, ::128], total_bits[:, None]], axis=-1).astype(i32)

    def chunk_any(sw_arr, ncx):
        pad = ncx * 128 - sw_arr.shape[-1]
        sa = jnp.pad(sw_arr, ((0, 0), (0, pad))) if pad else sw_arr
        return (sa.reshape(sa.shape[0], ncx, 128) > 0).any(axis=-1)

    fl2 = chunk_any(s2_sw, nc2)
    fl1 = chunk_any(s1_sw, nc1)

    def chunk_row_span(cb):
        r0 = (cb[:, :-1] & MASK31) >> 12
        last = ((((cb[:, 1:] & MASK31) - 1) >> 5) + 2) >> 7
        return jnp.maximum(last, r0) - r0 + 1

    span2 = chunk_row_span(cb2)
    span1 = chunk_row_span(cb1)
    overflow = (span2 > kmax).any(axis=-1) \
        | ((span1 > kmax1) & fl1).any(axis=-1)
    # batch-wide true row need: the static kmax is the config's worst
    # case, but typical content spans fewer rows per chunk — the caller
    # dispatches a kernel specialized at this need (content-adaptive
    # kmax), skipping provably-untouched rows
    need2 = jnp.clip(span2.max(), 1, kmax).astype(jnp.int32)
    need1 = jnp.clip(jnp.where(fl1, span1, 1).max(), 1, kmax1) \
        .astype(jnp.int32)

    neg = jnp.int32(-2147483648)
    cb2 = cb2.at[:, :nc2].set(
        jnp.where(fl2, cb2[:, :nc2] | neg, cb2[:, :nc2]))
    cb1 = cb1.at[:, :nc1].set(
        jnp.where(fl1, cb1[:, :nc1] | neg, cb1[:, :nc1]))
    return (mainw, mainr, sp2w, sp2r, sp1w, sp1r, cb2, cb1), overflow, \
        need2, need1


MASK31 = 2147483647


def pack_frames_device(analysis: dict, hdr_bytes, hdr_nbytes,
                       cfg: FrameConfig, debug: bool = False,
                       backend: str = "auto"):
    """Emit final FLAC frame bytes for a batch of analyzed frames.

    analysis: the analyze_frames output dict (device tensors).
    hdr_bytes uint8 [F, HDR_SLOTS] / hdr_nbytes int32 [F] from
    :func:`frame_header_bytes`.

    backend: "kernel" = the Pallas word merge (TPU),
    "kernel_interp" = same in interpreter mode (CPU tests),
    "xla" = the gather/cumsum formulation (fast on CPU backends),
    "auto" = kernel on TPU else xla.

    Returns (words int32 [F, word_rows(cfg), 128] — each frame's final
    bytes as big-endian 32-bit words with zeroed CRC placeholders
    (byte view via :func:`words_to_slot_bytes`); total_bits int32 [F]
    — emitted bit count, == 8*frame_bytes when the layout agrees with
    the analysis accounting)."""
    n = cfg.block_size
    C = cfg.channels
    i32 = jnp.int32
    u32 = jnp.uint32
    pmax_static = limit_max_partition_order(
        cfg.max_partition_order, n, 1)
    G = 1 << pmax_static
    gs = n >> pmax_static

    sf = analysis["sf_type"]                       # [F, C]
    order = analysis["order"]
    obits = analysis["obits"]
    wasted_b = analysis["wasted"]
    shift = analysis["shift"]
    porder = analysis["porder"]
    method = analysis["method"]
    type_code = analysis["type_code"]
    coefs = analysis["coefs"]                      # [F, C, 32]
    rice_k = analysis["rice_params"]               # [F, C, >=G]
    res = analysis["residual"]                     # [F, C, n]
    ch_mode = analysis["ch_mode"]                  # [F]
    F = sf.shape[0]

    pred = (sf == SF_FIXED) | (sf == SF_LPC)
    is_lpc = sf == SF_LPC
    is_verb = sf == SF_VERBATIM
    is_const = sf == SF_CONSTANT
    wide = _split_wide(cfg)                        # obits may reach 33
    if not wide:
        ob_mask = (u32(0xFFFFFFFF)
                   >> (32 - obits).astype(u32))    # ob >= 1
    else:
        # sample fields split into (hi, lo) slot pairs; the hi part is
        # the int32 value ARITHMETIC-shifted (sign extension supplies
        # bit 32 of a 33-bit field, matching the host BitWriter's
        # sign-extended int64 write)
        ob_lo = jnp.minimum(obits, 16)[..., None]  # [F, C, 1]
        ob_hi = obits[..., None] - ob_lo
        lo_mask = (u32(1) << ob_lo.astype(u32)) - 1
        hi_mask = (u32(1) << ob_hi.astype(u32)) - 1

    def field_hi(vals):
        return (vals >> ob_lo).astype(u32) & hi_mask

    def field_lo(vals):
        return vals.astype(u32) & lo_mask

    # ---- per-channel fixed slots --------------------------------------
    # subframe header byte: pad(0) + 6-bit type code + wasted flag
    subhdr_len = jnp.full((F, C, 1), 8, i32)
    subhdr_pay = ((type_code << 1) | (wasted_b > 0)) \
        .astype(u32)[..., None]
    # wasted unary: w-1 zeros then a 1 == value 1 in w bits
    unary_len = wasted_b[..., None]
    unary_pay = jnp.where(wasted_b > 0, 1, 0).astype(u32)[..., None]

    # warm-up region: 32 slots; slot j active for j < order on the
    # predicted paths; slot 0 doubles as the CONSTANT value
    j32 = jnp.arange(32)
    warm_active = (pred[..., None] & (j32 < order[..., None])) \
        | (is_const[..., None] & (j32 == 0))
    if not wide:
        warm_len = jnp.where(warm_active, obits[..., None], 0)
        warm_pay = jnp.where(warm_active,
                             res[..., :32].astype(u32)
                             & ob_mask[..., None], u32(0))
    else:
        # (hi, lo) slot pairs -> 64 warm slots
        w32 = res[..., :32]
        wh_len = jnp.where(warm_active, ob_hi, 0)
        wh_pay = jnp.where(warm_active, field_hi(w32), u32(0))
        wl_len = jnp.where(warm_active, ob_lo, 0)
        wl_pay = jnp.where(warm_active, field_lo(w32), u32(0))
        warm_len = jnp.stack([wh_len, wl_len], -1).reshape(F, C, 64)
        warm_pay = jnp.stack([wh_pay, wl_pay], -1).reshape(F, C, 64)

    # LPC header (4-bit precision-1 + 5-bit shift) and coefficients
    lpch_len = jnp.where(is_lpc, 9, 0)[..., None]
    lpch_pay = (((cfg.precision - 1) << 5) | (shift & 31)) \
        .astype(u32)[..., None] * (lpch_len > 0)
    coef_len = jnp.where(is_lpc[..., None] & (j32 < order[..., None]),
                         cfg.precision, 0)
    coef_pay = jnp.where(coef_len > 0,
                         coefs.astype(u32)
                         & u32((1 << cfg.precision) - 1), u32(0))

    # Rice method(2) + porder(4)
    riceh_len = jnp.where(pred, 6, 0)[..., None]
    riceh_pay = ((method << 4) | porder).astype(u32)[..., None] \
        * (riceh_len > 0)

    # ---- partition parameters + per-sample Rice codes -----------------
    po_shift = (pmax_static - porder)[..., None]   # [F, C, 1]
    g_idx = jnp.arange(G, dtype=i32)
    g_active = pred[..., None] & (
        (g_idx & ((i32(1) << po_shift) - 1)) == 0)
    # k per grid group, k_of_g[g] = rice_k[g >> po_shift]: built as a
    # select over the static shift values instead of a gather (TPU
    # gathers are scalar-unit-bound; 9 broadcast expands are free)
    k_of_g = jnp.zeros_like(rice_k[..., :G])
    for s in range(pmax_static + 1):
        parts = G >> s
        expanded = jnp.broadcast_to(
            rice_k[..., :parts, None],
            rice_k.shape[:-1] + (parts, 1 << s)) \
            .reshape(rice_k.shape[:-1] + (G,))
        k_of_g = jnp.where(po_shift == s, expanded, k_of_g)
    param_len = jnp.where(g_active, 4 + method[..., None], 0)
    param_pay = jnp.where(g_active, k_of_g.astype(u32), u32(0))

    jn = jnp.arange(n, dtype=i32)
    # per-sample k: broadcast the per-group k (k_of_g) over each group's
    # gs samples — groups refine partitions, so no per-sample gather
    k_j = jnp.broadcast_to(k_of_g[..., :, None], (F, C, G, gs)) \
        .reshape(F, C, n).astype(u32)
    zig = ((i32(2) * res) ^ (res >> i32(31))).astype(u32)
    q = zig >> k_j
    # predicted frames that survive the verbatim fallback have total
    # bits <= 8*max_frame_size < 2^21, so q fits int32 comfortably; the
    # clip only tames masked-out lanes (verbatim/constant frames)
    q_i = jnp.minimum(q, u32(1 << 24)).astype(i32)
    rice_active = pred[..., None] & (jn >= order[..., None])
    rice_pay = (u32(1) << k_j) | (zig & ((u32(1) << k_j) - 1))
    if not wide:
        samp_len = jnp.where(
            rice_active, q_i + 1 + k_j.astype(i32),
            jnp.where(is_verb[..., None], obits[..., None], 0))
        samp_lead = jnp.where(rice_active, q_i, 0)
        samp_pay = jnp.where(
            rice_active, rice_pay,
            jnp.where(is_verb[..., None], res.astype(u32)
                      & ob_mask[..., None], u32(0)))
        spg = gs
    else:
        # each sample is a (hi, lo) slot pair: a Rice code rides whole
        # in the hi slot (payload <= 31 bits), a verbatim sample splits
        sh_len = jnp.where(
            rice_active, q_i + 1 + k_j.astype(i32),
            jnp.where(is_verb[..., None], ob_hi, 0))
        sh_lead = jnp.where(rice_active, q_i, 0)
        sh_pay = jnp.where(
            rice_active, rice_pay,
            jnp.where(is_verb[..., None], field_hi(res), u32(0)))
        sl_len = jnp.broadcast_to(
            jnp.where(is_verb[..., None], ob_lo, 0), (F, C, n))
        sl_pay = jnp.where(is_verb[..., None], field_lo(res), u32(0))
        zl = jnp.zeros_like(sl_len)
        samp_len = jnp.stack([sh_len, sl_len], -1).reshape(F, C, 2 * n)
        samp_lead = jnp.stack([sh_lead, zl], -1).reshape(F, C, 2 * n)
        samp_pay = jnp.stack([sh_pay, sl_pay], -1).reshape(F, C, 2 * n)
        spg = 2 * gs

    # interleave: [param_g][sample slots] per partition-grid group
    def interleave(par, samp):
        par = par.reshape(F, C, G, 1)
        samp = samp.reshape(F, C, G, spg)
        return jnp.concatenate([par, samp], axis=-1) \
            .reshape(F, C, G * (1 + spg))

    zeros_g = jnp.zeros_like(param_len)
    body_len = interleave(param_len, samp_len)
    body_lead = interleave(zeros_g, samp_lead)
    body_pay = interleave(param_pay, samp_pay)

    ch_len = jnp.concatenate(
        [subhdr_len, unary_len, warm_len, lpch_len, coef_len,
         riceh_len, body_len], axis=-1)            # [F, C, M_ch]
    M_ch = ch_len.shape[-1]
    n_fixed = 68 + (32 if wide else 0)     # fixed slots have no lead
    ch_lead = jnp.concatenate(
        [jnp.zeros((F, C, n_fixed), i32), body_lead], axis=-1)
    ch_pay = jnp.concatenate(
        [subhdr_pay, unary_pay, warm_pay, lpch_pay, coef_pay,
         riceh_pay, body_pay], axis=-1)

    # ---- header region ------------------------------------------------
    h_idx = jnp.arange(HDR_SLOTS)
    hdr_len = jnp.where(h_idx[None, :] < hdr_nbytes[:, None], 8, 0) \
        .astype(i32)
    hdr_pay = hdr_bytes.astype(u32)
    # device-known fields of header byte 3: channel assignment + bps
    ch_field = jnp.where(ch_mode > 0, ch_mode, C - 1).astype(u32)
    byte3 = (ch_field << 4) | u32(P.bps_code(cfg.bps) << 1)
    hdr_pay = hdr_pay.at[:, 3].set(byte3)

    # ---- assemble global slot arrays + tail (pad + CRC-16) ------------
    lengths = jnp.concatenate(
        [hdr_len, ch_len.reshape(F, C * M_ch)], axis=-1)
    leading = jnp.concatenate(
        [jnp.zeros((F, HDR_SLOTS), i32), ch_lead.reshape(F, C * M_ch)],
        axis=-1)
    payload = jnp.concatenate(
        [hdr_pay, ch_pay.reshape(F, C * M_ch)], axis=-1)

    body_bits = lengths.sum(axis=-1)               # [F]
    pad_bits = (-body_bits) & 7
    tail_len = jnp.stack([pad_bits, jnp.full((F,), 16, i32)], axis=-1)
    lengths = jnp.concatenate([lengths, tail_len], axis=-1)
    leading = jnp.concatenate([leading, jnp.zeros((F, 2), i32)],
                              axis=-1)
    payload = jnp.concatenate([payload, jnp.zeros((F, 2), u32)],
                              axis=-1)
    M = lengths.shape[-1]
    total_bits = body_bits + pad_bits + 16

    if debug:
        return lengths, leading, payload

    wr = word_rows(cfg)
    W = wr * 128
    if backend == "auto":
        backend = "kernel" if jax.default_backend() == "tpu" else "xla"
    if backend in ("kernel", "kernel_interp"):
        # Pallas merge over combined slot nodes: pair+quad combining
        # shrinks the chunk count ~4x, then one MXU one-hot matmul per
        # (chunk, row) places the payload words (pallas_bitmerge.py).
        from flake_tpu.ops import pallas_bitmerge

        kmax, kmax1 = kmax_for(cfg)
        parts, overflow, need2, _need1 = build_combined_parts(
            lengths, leading, payload, total_bits, kmax, kmax1)
        import os
        if backend == "kernel_interp" \
                or os.environ.get("FLAKE_ADAPTIVE_KMAX", "1") == "0":
            # CPU interpret mode: one static-kmax trace (adaptive
            # dispatch would multiply XLA:CPU compile time by kmax)
            words3 = pallas_bitmerge.merge_combined(
                *parts[:6], cb2=parts[6], cb1=parts[7], wr=wr,
                kmax=kmax, kmax1=kmax1,
                interpret=backend == "kernel_interp")
        else:
            # content-adaptive kmax: the static bound covers legal-but-
            # pathological Rice runs, while typical content spans fewer
            # output rows per 512-slot chunk — dispatch the kernel
            # variant specialized at the batch's true max span (each
            # skipped row is one fewer MXU one-hot matmul + RMW per
            # chunk; in-kernel row gating measured slower than the
            # wasted windows, branch flushes, so specialize instead)
            def _branch(k):
                def br(ops_):
                    return pallas_bitmerge.merge_combined(
                        *ops_[:6], cb2=ops_[6], cb1=ops_[7], wr=wr,
                        kmax=k, kmax1=kmax1, interpret=False)
                return br
            words3 = jax.lax.switch(
                need2 - 1, [_branch(k) for k in range(1, kmax + 1)],
                parts)
        return words3, total_bits.astype(i32), overflow
    elif backend == "xla":
        # ---- aligned payload parts (2-word spans) ---------------------
        offsets = _exclusive_cumsum_hier(lengths)
        paylen = lengths - leading
        paystart = offsets + leading
        w0 = (paystart >> 5).astype(i32)
        inword = paystart & 31

        t = paylen + inword                        # 1..63 when active
        first = t <= 32
        # shifts as uint32 so nothing promotes to (emulated) int64
        sh_hi1 = jnp.clip(32 - t, 0, 31).astype(u32)
        sh_hi2 = jnp.clip(t - 32, 0, 31).astype(u32)
        sh_lo = jnp.clip(64 - t, 1, 31).astype(u32)
        hi32 = jnp.where(first, payload << sh_hi1, payload >> sh_hi2)
        lo32 = jnp.where(first, u32(0), payload << sh_lo)
        active = paylen > 0
        hi32 = jnp.where(active, hi32, u32(0))
        lo32 = jnp.where(active, lo32, u32(0))
        ex_hi = jnp.concatenate(
            [jnp.zeros((F, 1), u32), jnp.cumsum(hi32, axis=-1)],
            axis=-1)
        ex_lo = jnp.concatenate(
            [jnp.zeros((F, 1), u32), jnp.cumsum(lo32, axis=-1)],
            axis=-1)
        S = _batched_lower_bound(w0, jnp.arange(W + 1, dtype=i32))
        A = jnp.take_along_axis(ex_hi, S, axis=1)   # [F, W + 1]
        B = jnp.take_along_axis(ex_lo, S, axis=1)
        hi_term = A[:, 1:] - A[:, :-1]              # slots with w0 == w
        lo_prev = jnp.concatenate([B[:, :1], B[:, :-1]], axis=1)
        lo_term = B - lo_prev                       # w0 == w - 1
        words3 = (hi_term + lo_term[:, :W]).astype(i32) \
            .reshape(F, wr, 128)
    else:
        raise ValueError(f"bad merge backend {backend!r}")
    return words3, total_bits.astype(i32), \
        jnp.zeros((F,), jnp.bool_)


def words_to_slot_bytes(words3):
    """Big-endian byte view of per-frame word blocks (MSB-first
    bitstream): [F, wr, 128] int32 -> uint8 [F, wr*512]."""
    F, wr, _ = words3.shape
    u32v = words3.astype(jnp.uint32)
    sh = jnp.array([24, 16, 8, 0], dtype=jnp.uint32)
    return ((u32v[..., None] >> sh) & jnp.uint32(0xFF)) \
        .astype(jnp.uint8).reshape(F, wr * 512)


@functools.partial(jax.jit, static_argnames=("cfg", "backend"))
def analyze_and_pack_jit(samples, cfg: FrameConfig, hdr_bits, hdr_bytes,
                         hdr_nbytes, backend: str = "auto"):
    """One fused dispatch: batched analysis + device bitstream emission.

    ``samples`` may be int16 (bps <= 16 content: exact, and halves the
    H2D upload — the dominant cost through a thin host<->device link);
    it is widened on device. Returns {words, total_bits, frame_bytes}
    — the full analysis dict never leaves the device."""
    from flake_tpu.ops.frame import analyze_frames

    samples = samples.astype(jnp.int32)
    analysis = analyze_frames(samples, cfg, hdr_bits)
    words, total_bits, overflow = pack_frames_device(
        analysis, hdr_bytes, hdr_nbytes, cfg, backend=backend)
    return {"words": words, "total_bits": total_bits,
            "frame_bytes": analysis["frame_bytes"],
            "overflow": jnp.any(overflow)}


GRANULE_BYTES = 4096  # one [8, 128] int32 tile


@jax.jit
def gather_granules_jit(words3, idx):
    """Compact per-frame word blocks to ~the compressed size for D2H.

    Arbitrary-byte-offset placement is not expressible on TPU (DMA
    slices must be tile-aligned), so compaction is granule-granular:
    each frame's words split into 4 KiB granules ([8, 128] int32 — one
    tile, so a leading-axis block gather is tile-aligned and runs at
    memory bandwidth), and only the granules a frame actually uses are
    gathered out. D2H then ships ceil(frame_bytes/4096)*4096 per frame
    (~1.6x the compressed size at level 8, vs 2.1x more for padded
    slots and 6.5x for raw analysis tensors); the host reassembles
    byte-exact frames from its offset table while patching CRCs.

    words3 int32 [F, wr, 128]; idx int32 [g_pad] flat granule indices
    (frame f's granule g at f*ceil(wr/8) + g; pad entries repeat 0).
    Returns int32 [g_pad, 8, 128]."""
    F, wr, _ = words3.shape
    gpf = -(-wr // 8)
    if gpf * 8 != wr:
        words3 = jnp.pad(words3, ((0, 0), (0, gpf * 8 - wr), (0, 0)))
    gran = words3.reshape(F * gpf, 8, 128)
    return jnp.take(gran, idx, axis=0)
