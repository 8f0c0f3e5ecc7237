"""Prototype: two-level slot combining + 3-word merge kernel (v5).

Combines adjacent slots into <=64-bit-payload nodes twice (pair, then
quad): the merge kernel then sees ~M/4 main nodes instead of M slots.
Nodes that don't fit 64 bits spill to full-capacity side arrays (one
per level, so there is NO overflow case), which are ~all-zero on real
content and get skipped per-chunk via SMEM activity flags.

Node algebra: a node is (len, sw, g, ph, pl) — a bitstring of ``len``
bits whose nonzero bits are confined to [len-g-sw, len-g), stored as
the 64-bit integer ph*2^32+pl (< 2^sw). Combining A+B:
  len' = lenA + lenB
  sh   = gA + lenB - gB          (>= swB, so ORs stay disjoint)
  sw'  = swA + sh; fits = sw' <= 64
  pay' = (payA << sh) | payB ; g' = gB
with degenerate cases swA==0 / swB==0 handled by selects. A failed
combine keeps A (g' = gA + lenB) and spills B whole.

Run on TPU from repo root: python util/prof_merge3.py
"""
import functools
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import flake_tpu
flake_tpu._enable_compile_cache_if_tpu()
from flake_tpu import params as P
from flake_tpu.ops import bitpack
from flake_tpu.ops.frame import FrameConfig, analyze_frames
from flake_tpu.ops.pallas_bitmerge import merge_words, LANE

F, B, C, bps, sr = 512, 4096, 2, 16, 44100
p = P.set_defaults(8)
cfg = FrameConfig.from_params(p, C, bps, block_size=B)
wr = bitpack.word_rows(cfg)

i32 = jnp.int32
u32 = jnp.uint32


def make_batch(kind):
    rng = np.random.default_rng(0)
    t = np.arange(F * B)
    if kind == "music":
        sig = 12000 * np.sin(2 * np.pi * 440 * t / 44100) \
            + 800 * rng.standard_normal(F * B)
        l = np.clip(sig, -32768, 32767).astype(np.int32)
        r = np.clip(0.8 * sig, -32768, 32767).astype(np.int32)
    else:
        l = rng.integers(-32768, 32767, F * B).astype(np.int32)
        r = rng.integers(-32768, 32767, F * B).astype(np.int32)
    return jnp.asarray(np.stack([l, r], -1).reshape(F, B, C))


hdr_bits = jnp.full((F,), 48, jnp.int32)
nums = np.arange(F, dtype=np.int64)
hb, hn = bitpack.frame_header_bytes(
    nums, bs_code=P.blocksize_code(B), sr_code=P.samplerate_code(sr),
    allow_vbs=p.allow_vbs)
hbj, hnj = jnp.asarray(hb), jnp.asarray(hn)


# ---------------------------------------------------------------------------
# XLA: combining + alignment
# ---------------------------------------------------------------------------

def _shr_safe(x, s):
    """x >> s for s in [0, 32]: s==32 -> 0, avoids UB via double shift."""
    return (x >> u32(1)) >> jnp.clip(s - 1, 0, 31).astype(u32)


def _shl_safe(x, s):
    return (x << u32(1)) << jnp.clip(s - 1, 0, 31).astype(u32)


def _shl64(ph, pl, sh):
    """(ph:pl) << sh for sh in [0, 63] (caller guarantees no overflow
    past bit 63)."""
    shc = jnp.clip(sh, 0, 63)
    lo_sh = jnp.clip(shc, 0, 31).astype(u32)
    big = shc >= 32
    sh2 = jnp.clip(shc - 32, 0, 31).astype(u32)
    nph = jnp.where(
        big, pl << sh2,
        (ph << lo_sh) | _shr_safe(pl, 32 - shc))
    npl = jnp.where(big, u32(0), pl << lo_sh)
    return nph, npl


def combine_level(ln, sw, g, ph, pl, cap=64):
    """One combining level over the last axis (must be even length).
    Returns (combined node arrays [.., M/2], spill node arrays)."""
    lnA, lnB = ln[..., 0::2], ln[..., 1::2]
    swA, swB = sw[..., 0::2], sw[..., 1::2]
    gA, gB = g[..., 0::2], g[..., 1::2]
    phA, phB = ph[..., 0::2], ph[..., 1::2]
    plA, plB = pl[..., 0::2], pl[..., 1::2]

    sh = gA + lnB - gB
    sw_c = swA + sh
    fits = sw_c <= cap
    sph, spl = _shl64(phA, plA, jnp.where(fits, sh, 0))

    azero = swA == 0
    bzero = swB == 0
    comb = (~azero) & (~bzero) & fits

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

    # spill: B whole, when both nonzero and doesn't fit. Its payload
    # start relative to the PAIR start is lnA + (lnB - gB - swB).
    sp = (~azero) & (~bzero) & (~fits)
    s_sw = jnp.where(sp, swB, 0)
    s_rel = jnp.where(sp, lnA + lnB - gB - swB, 0)
    s_ph = jnp.where(sp, phB, u32(0))
    s_pl = jnp.where(sp, plB, u32(0))
    del comb
    return (ln_n, sw_n, g_n, ph_n, pl_n), (s_sw, s_rel, s_ph, s_pl)


def _pad_even(x, fill=0):
    M = x.shape[-1]
    if M % 2:
        pads = [(0, 0)] * (x.ndim - 1) + [(0, 1)]
        x = jnp.pad(x, pads, constant_values=fill)
    return x


def align3(ps, sw, ph, pl):
    """Aligned 3-word contributions for a 64-bit payload at absolute
    bit position: payload occupies bits [ps, ps+sw). Returns
    (w0, A, B, Cw) — A ORs into word w0, B into w0+1, Cw into w0+2."""
    active = sw > 0
    w0 = (ps >> 5).astype(i32)
    iw = ps & 31
    t = iw + sw                       # in [1, 95] when active
    z = 96 - t                        # left shift within 96-bit window
    # case z < 32
    zc = jnp.clip(z, 1, 31).astype(u32)
    A1 = _shr_safe(ph, 32 - z)
    B1 = (ph << zc) | _shr_safe(pl, 32 - z)
    C1 = pl << zc
    # case 32 <= z < 64
    z2 = jnp.clip(z - 32, 0, 31).astype(u32)
    A2 = (ph << z2) | _shr_safe(pl, 64 - z)
    B2 = pl << z2
    # case z >= 64
    z3 = jnp.clip(z - 64, 0, 31).astype(u32)
    A3 = pl << z3
    big2 = z >= 64
    big1 = z >= 32
    A = jnp.where(big2, A3, jnp.where(big1, A2, A1))
    Bw = jnp.where(big2, u32(0), jnp.where(big1, B2, B1))
    Cw = jnp.where(big1, u32(0), C1)
    A = jnp.where(active, A, u32(0))
    Bw = jnp.where(active, Bw, u32(0))
    Cw = jnp.where(active, Cw, u32(0))
    w0 = jnp.where(active, w0, 0)
    return w0, A.astype(i32), Bw.astype(i32), Cw.astype(i32)


def to_chunks(x):
    """[F, M] -> [F, 128, nc] (slot-in-chunk on sublanes)."""
    Fs, M = x.shape
    nc = -(-M // 128)
    if nc * 128 != M:
        x = jnp.pad(x, ((0, 0), (0, nc * 128 - M)))
    return jnp.transpose(x.reshape(Fs, nc, 128), (0, 2, 1))


def build_v5_parts(x):
    out = analyze_frames(x, cfg, hdr_bits)
    lengths, leading, payload = bitpack.pack_frames_device(
        out, hbj, hnj, cfg, debug=True)
    total_bits = lengths.sum(axis=-1)

    ln = _pad_even(lengths)
    lead = _pad_even(leading)
    pay = _pad_even(payload)
    sw = ln - lead                    # paylen
    g = jnp.zeros_like(ln)
    ph = jnp.zeros_like(pay)

    (ln1, sw1, g1, ph1, pl1), (s1_sw, s1_rel, s1_ph, s1_pl) = \
        combine_level(ln, sw, g, ph, pay)
    ln1p = _pad_even(ln1)
    sw1p = _pad_even(sw1)
    g1p = _pad_even(g1)
    ph1p = _pad_even(ph1)
    pl1p = _pad_even(pl1)
    (ln2, sw2, g2, ph2, pl2), (s2_sw, s2_rel, s2_ph, s2_pl) = \
        combine_level(ln1p, sw1p, g1p, ph1p, pl1p)

    # offsets of quad nodes; then pair offsets by expansion
    off2 = bitpack._exclusive_cumsum_hier(ln2)          # [F, M4]
    lnA = ln1p[..., 0::2]
    off1 = jnp.stack([off2, off2 + lnA], axis=-1) \
        .reshape(off2.shape[0], -1)                     # [F, M2p]
    off1 = off1[..., :ln1.shape[-1]]

    # main quads
    ps_m = off2 + ln2 - g2 - sw2
    m_w0, m_A, m_B, m_C = align3(ps_m, sw2, ph2, pl2)
    # level-2 spill (pair nodes)
    ps_s2 = off2 + s2_rel
    s2_w0, s2_A, s2_B, s2_C = align3(ps_s2, s2_sw, s2_ph, s2_pl)
    # level-1 spill (base slots, <=32-bit payload -> C is all zero)
    ps_s1 = off1 + s1_rel
    s1_w0, s1_A, s1_B, _ = align3(ps_s1, s1_sw, s1_ph, s1_pl)

    main = tuple(to_chunks(v) for v in (m_w0, m_A, m_B, m_C))
    sp2 = tuple(to_chunks(v) for v in (s2_w0, s2_A, s2_B, s2_C))
    sp1 = tuple(to_chunks(v) for v in (s1_w0, s1_A, s1_B))

    nc2 = main[0].shape[-1]
    nc1 = sp1[0].shape[-1]
    # chunk bit bounds for row ranges (main/sp2 share; sp1 has its own)
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

    # per-chunk activity flags for the spill sets
    def chunk_any(sw_arr, ncx):
        Ms = sw_arr.shape[-1]
        pad = ncx * 128 - Ms
        sa = jnp.pad(sw_arr, ((0, 0), (0, pad))) if pad else sw_arr
        return (sa.reshape(sa.shape[0], ncx, 128) > 0) \
            .any(axis=-1).astype(i32)

    fl2 = chunk_any(s2_sw, nc2)
    fl1 = chunk_any(s1_sw, nc1)
    # pack each chunk's spill-activity flag into the sign bit of its
    # cb entry (frame bit offsets < 2^24, so bit 31 is free) — keeps
    # the SMEM scalar-prefetch footprint at 2 tables instead of 4
    neg = jnp.int32(-2147483648)
    cb2 = cb2.at[:, :nc2].set(
        jnp.where(fl2 > 0, cb2[:, :nc2] | neg, cb2[:, :nc2]))
    cb1 = cb1.at[:, :nc1].set(
        jnp.where(fl1 > 0, cb1[:, :nc1] | neg, cb1[:, :nc1]))
    return main, sp2, sp1, cb2, cb1


# ---------------------------------------------------------------------------
# Pallas kernel v5a: fori rows, 3 sets, 3-word windows
# ---------------------------------------------------------------------------

def _z():
    return jnp.int32(0)


def _win3(out_ref, wcol, acol, bcol, ccol, row0, last_row, *, three):
    iota = jax.lax.broadcasted_iota(i32, (LANE, LANE), 1)
    zero = jnp.zeros((LANE, LANE), i32)

    def body(row, carry):
        rel = wcol - row * LANE
        w = jnp.where(rel == iota,
                      jnp.broadcast_to(acol, (LANE, LANE)), zero)
        w = w + jnp.where(rel + 1 == iota,
                          jnp.broadcast_to(bcol, (LANE, LANE)), zero)
        if three:
            w = w + jnp.where(rel + 2 == iota,
                              jnp.broadcast_to(ccol, (LANE, LANE)),
                              zero)
        win = jnp.sum(w, axis=0, keepdims=True, dtype=i32)
        cur = out_ref[0, pl.ds(row, 1), :]
        out_ref[0, pl.ds(row, 1), :] = cur + win
        return carry

    jax.lax.fori_loop(row0, last_row + 1, body, jnp.int32(0))


MASK31 = 2147483647


def k_v5a(cb2_ref, cb1_ref,
          mw_ref, ma_ref, mb_ref, mc_ref,
          s2w_ref, s2a_ref, s2b_ref, s2c_ref,
          s1w_ref, s1a_ref, s1b_ref,
          out_ref, *, nc2, nc1):
    f = pl.program_id(0)
    out_ref[0] = jnp.zeros((wr, LANE), i32)

    def rows(cb_ref, c, span):
        base_bit = cb_ref[f, c] & i32(MASK31)
        end_bit = cb_ref[f, c + 1] & i32(MASK31)
        row0 = base_bit >> i32(12)
        last = (((end_bit - 1) >> i32(5)) + i32(span)) >> i32(7)
        return row0, jnp.maximum(last, row0)

    for c in range(nc2):
        r0, r1 = rows(cb2_ref, c, 2)
        _win3(out_ref, mw_ref[0, :, c:c + 1], ma_ref[0, :, c:c + 1],
              mb_ref[0, :, c:c + 1], mc_ref[0, :, c:c + 1], r0, r1,
              three=True)

        @pl.when(cb2_ref[f, c] < 0)
        def _(c=c, r0=r0, r1=r1):
            _win3(out_ref, s2w_ref[0, :, c:c + 1],
                  s2a_ref[0, :, c:c + 1], s2b_ref[0, :, c:c + 1],
                  s2c_ref[0, :, c:c + 1], r0, r1, three=True)

    for c in range(nc1):
        @pl.when(cb1_ref[f, c] < 0)
        def _(c=c):
            r0, r1 = rows(cb1_ref, c, 1)
            _win3(out_ref, s1w_ref[0, :, c:c + 1],
                  s1a_ref[0, :, c:c + 1], s1b_ref[0, :, c:c + 1],
                  None, r0, r1, three=False)


@jax.jit
def merge_v5a(main, sp2, sp1, cb2, cb1):
    F_ = main[0].shape[0]
    nc2 = main[0].shape[-1]
    nc1 = sp1[0].shape[-1]
    kernel = functools.partial(k_v5a, nc2=nc2, nc1=nc1)

    def spec(ncx):
        return pl.BlockSpec((1, LANE, ncx), lambda i, *_: (i, _z(), _z()))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F_,),
        in_specs=[spec(nc2)] * 8 + [spec(nc1)] * 3,
        out_specs=pl.BlockSpec((1, wr, LANE),
                               lambda i, *_: (i, _z(), _z())))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F_, wr, LANE), i32),
    )(cb2, cb1, *main, *sp2, *sp1)


# ---------------------------------------------------------------------------
# Pallas kernel v5b: static rows 0-1 + gated rows 2-3 + rare fori tail
# ---------------------------------------------------------------------------

def _win3_one(out_ref, wcol, acol, bcol, ccol, row, *, three):
    iota = jax.lax.broadcasted_iota(i32, (LANE, LANE), 1)
    zero = jnp.zeros((LANE, LANE), i32)
    rel = wcol - row * LANE
    w = jnp.where(rel == iota,
                  jnp.broadcast_to(acol, (LANE, LANE)), zero)
    w = w + jnp.where(rel + 1 == iota,
                      jnp.broadcast_to(bcol, (LANE, LANE)), zero)
    if three:
        w = w + jnp.where(rel + 2 == iota,
                          jnp.broadcast_to(ccol, (LANE, LANE)), zero)
    win = jnp.sum(w, axis=0, keepdims=True, dtype=i32)
    cur = out_ref[0, pl.ds(row, 1), :]
    out_ref[0, pl.ds(row, 1), :] = cur + win


def _chunk_v5b(out_ref, wcol, acol, bcol, ccol, row0, last, *, three):
    _win3_one(out_ref, wcol, acol, bcol, ccol, row0, three=three)
    _win3_one(out_ref, wcol, acol, bcol, ccol, row0 + 1, three=three)
    for dr in (2, 3):
        @pl.when(last >= row0 + dr)
        def _(dr=dr):
            _win3_one(out_ref, wcol, acol, bcol, ccol, row0 + dr,
                      three=three)

    @pl.when(last >= row0 + 4)
    def _():
        def body(row, carry):
            _win3_one(out_ref, wcol, acol, bcol, ccol, row,
                      three=three)
            return carry
        jax.lax.fori_loop(row0 + 4, last + 1, body, jnp.int32(0))


def k_v5b(cb2_ref, cb1_ref,
          mw_ref, ma_ref, mb_ref, mc_ref,
          s2w_ref, s2a_ref, s2b_ref, s2c_ref,
          s1w_ref, s1a_ref, s1b_ref,
          out_ref, *, nc2, nc1):
    f = pl.program_id(0)
    out_ref[0] = jnp.zeros((wr, LANE), i32)

    def rows(cb_ref, c, span):
        base_bit = cb_ref[f, c] & i32(MASK31)
        end_bit = cb_ref[f, c + 1] & i32(MASK31)
        row0 = base_bit >> i32(12)
        last = (((end_bit - 1) >> i32(5)) + i32(span)) >> i32(7)
        return row0, jnp.maximum(last, row0)

    for c in range(nc2):
        r0, r1 = rows(cb2_ref, c, 2)
        _chunk_v5b(out_ref, mw_ref[0, :, c:c + 1],
                   ma_ref[0, :, c:c + 1], mb_ref[0, :, c:c + 1],
                   mc_ref[0, :, c:c + 1], r0, r1, three=True)

        @pl.when(cb2_ref[f, c] < 0)
        def _(c=c, r0=r0, r1=r1):
            _chunk_v5b(out_ref, s2w_ref[0, :, c:c + 1],
                       s2a_ref[0, :, c:c + 1], s2b_ref[0, :, c:c + 1],
                       s2c_ref[0, :, c:c + 1], r0, r1, three=True)

    for c in range(nc1):
        @pl.when(cb1_ref[f, c] < 0)
        def _(c=c):
            r0, r1 = rows(cb1_ref, c, 1)
            _chunk_v5b(out_ref, s1w_ref[0, :, c:c + 1],
                       s1a_ref[0, :, c:c + 1], s1b_ref[0, :, c:c + 1],
                       None, r0, r1, three=False)


@jax.jit
def merge_v5b(main, sp2, sp1, cb2, cb1):
    F_ = main[0].shape[0]
    nc2 = main[0].shape[-1]
    nc1 = sp1[0].shape[-1]
    kernel = functools.partial(k_v5b, nc2=nc2, nc1=nc1)

    def spec(ncx):
        return pl.BlockSpec((1, LANE, ncx), lambda i, *_: (i, _z(), _z()))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F_,),
        in_specs=[spec(nc2)] * 8 + [spec(nc1)] * 3,
        out_specs=pl.BlockSpec((1, wr, LANE),
                               lambda i, *_: (i, _z(), _z())))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F_, wr, LANE), i32),
    )(cb2, cb1, *main, *sp2, *sp1)


# ---------------------------------------------------------------------------
# Pallas kernel v5c: MXU one-hot matmuls, static KMAX rows, fb frames
# per program. Values ride in ROW layout [F, nc, 128]; w0 in column
# layout [F, 128, nc] for the one-hot. No fori, chunk-level gating only.
# ---------------------------------------------------------------------------

KMAX = int(os.environ.get("KMAX", "4"))  # static rows per main/sp2 chunk
KMAX1 = 3   # static rows per sp1 chunk

f32 = jnp.float32


MXU_MODE = os.environ.get("MXU_MODE", "b8")
# "b8": 8-bit quarters, 1-pass bf16; "hi": 16-bit halves, HIGHEST


def _vals8(arow, brow, crow):
    if MXU_MODE == "hi":
        m16 = i32(0xFFFF)
        rows = []
        for w in (arow, brow, crow):
            if w is None:
                z = jnp.zeros((1, LANE), f32)
                rows += [z, z]
            else:
                rows += [((w >> 16) & m16).astype(f32),
                         (w & m16).astype(f32)]
        z = jnp.zeros((1, LANE), f32)
        return jnp.concatenate(rows + [z, z], axis=0)
    m8 = i32(0xFF)
    rows = []
    for w in (arow, brow, crow):
        if w is None:
            z = jnp.zeros((1, LANE), f32)
            rows += [z, z, z, z]
        else:
            rows += [((w >> 24) & m8).astype(f32),
                     ((w >> 16) & m8).astype(f32),
                     ((w >> 8) & m8).astype(f32),
                     (w & m8).astype(f32)]
    z = jnp.zeros((1, LANE), f32)
    return jnp.concatenate(rows + [z] * 4, axis=0)


def _mm_words(vals, oh):
    """vals [8|16, 128] @ oh [128s, 128w] -> (a, b, cc) int32 [1,128]."""
    if MXU_MODE == "hi":
        mm = jax.lax.dot_general(
            vals, oh, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32)
        r = mm.astype(i32)
        a = (r[0:1] << 16) + r[1:2]
        b = (r[2:3] << 16) + r[3:4]
        cc = (r[4:5] << 16) + r[5:6]
    else:
        mm = jax.lax.dot_general(
            vals, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        r = mm.astype(i32)
        a = (r[0:1] << 24) + (r[1:2] << 16) + (r[2:3] << 8) + r[3:4]
        b = (r[4:5] << 24) + (r[5:6] << 16) + (r[6:7] << 8) + r[7:8]
        cc = (r[8:9] << 24) + (r[9:10] << 16) + (r[10:11] << 8) \
            + r[11:12]
    return a, b, cc


def _mxu_chunk(out_ref, fi, wcol, vals, row0, *, kmax):
    iota = jax.lax.broadcasted_iota(i32, (LANE, LANE), 1)
    lane = jax.lax.broadcasted_iota(i32, (1, LANE), 1)
    zrow = jnp.zeros((1, LANE), i32)
    prev_rb = zrow
    prev_rc = zrow
    for dr in range(kmax):
        rel = wcol - (row0 + dr) * LANE
        oh = jnp.where(rel == iota, f32(1.0), f32(0.0))
        a, b, cc = _mm_words(vals, oh)
        rb = pltpu.roll(b, jnp.int32(1), axis=1)
        rc = pltpu.roll(cc, jnp.int32(2), axis=1)
        win = a + jnp.where(lane >= 1, rb, zrow) \
            + jnp.where(lane >= 2, rc, zrow) \
            + jnp.where(lane < 1, prev_rb, zrow) \
            + jnp.where(lane < 2, prev_rc, zrow)
        prev_rb, prev_rc = rb, rc
        cur = out_ref[fi, pl.ds(row0 + dr, 1), :]
        out_ref[fi, pl.ds(row0 + dr, 1), :] = cur + win


# ---- v5d: all-row layout, sublane-iota one-hot, transposed-B matmul ----

def _mm_words_T(vals, ohT):
    """vals [8|16, 128s] @ ohT [128w(sub), 128s(lane)] -> int32 rows,
    contracting the shared lane (slot) axis."""
    dn = (((1,), (1,)), ((), ()))
    if MXU_MODE == "hi":
        mm = jax.lax.dot_general(
            vals, ohT, dn, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32)
        r = mm.astype(i32)
        a = (r[0:1] << 16) + r[1:2]
        b = (r[2:3] << 16) + r[3:4]
        cc = (r[4:5] << 16) + r[5:6]
    else:
        mm = jax.lax.dot_general(
            vals, ohT, dn, preferred_element_type=f32)
        r = mm.astype(i32)
        a = (r[0:1] << 24) + (r[1:2] << 16) + (r[2:3] << 8) + r[3:4]
        b = (r[4:5] << 24) + (r[5:6] << 16) + (r[6:7] << 8) + r[7:8]
        cc = (r[8:9] << 24) + (r[9:10] << 16) + (r[10:11] << 8) \
            + r[11:12]
    return a, b, cc


GATE_ROWS = os.environ.get("GATE_ROWS", "1") == "1"


def _mxu_chunk_d(out_ref, fi, wrow, vals, row0, *, kmax, last=None):
    iota0 = jax.lax.broadcasted_iota(i32, (LANE, LANE), 0)
    lane = jax.lax.broadcasted_iota(i32, (1, LANE), 1)
    zrow = jnp.zeros((1, LANE), i32)

    def dorow(dr, prev_rb, prev_rc):
        rel = wrow - (row0 + dr) * LANE          # [1, 128] slots
        ohT = jnp.where(rel == iota0, f32(1.0), f32(0.0))
        a, b, cc = _mm_words_T(vals, ohT)
        rb = pltpu.roll(b, jnp.int32(1), axis=1)
        rc = pltpu.roll(cc, jnp.int32(2), axis=1)
        win = a + jnp.where(lane >= 1, rb, zrow) \
            + jnp.where(lane >= 2, rc, zrow) \
            + jnp.where(lane < 1, prev_rb, zrow) \
            + jnp.where(lane < 2, prev_rc, zrow)
        cur = out_ref[fi, pl.ds(row0 + dr, 1), :]
        out_ref[fi, pl.ds(row0 + dr, 1), :] = cur + win
        return rb, rc

    rb, rc = dorow(0, zrow, zrow)
    rb, rc = dorow(1, rb, rc)
    if kmax > 2:
        if GATE_ROWS and last is not None:
            # one branch for the rare tail rows; carries threaded
            # straight-line inside so spills across 2->3 stay correct
            @pl.when(last >= row0 + 2)
            def _(rb=rb, rc=rc):
                r2, c2 = rb, rc
                for dr in range(2, kmax):
                    r2, c2 = dorow(dr, r2, c2)
        else:
            for dr in range(2, kmax):
                rb, rc = dorow(dr, rb, rc)


def k_v5d(cb2_ref, cb1_ref,
          mw_ref, ma_ref, mb_ref, mc_ref,
          s2w_ref, s2a_ref, s2b_ref, s2c_ref,
          s1w_ref, s1a_ref, s1b_ref,
          out_ref, *, nc2, nc1, fb):
    g = pl.program_id(0)
    out_ref[...] = jnp.zeros((fb, wr, LANE), i32)

    for fi in range(fb):
        f = g * fb + fi
        for c in range(nc2):
            row0 = (cb2_ref[f, c] & i32(MASK31)) >> i32(12)
            endb = cb2_ref[f, c + 1] & i32(MASK31)
            last = jnp.maximum((((endb - 1) >> i32(5)) + i32(2))
                               >> i32(7), row0)
            wrow = mw_ref[fi, c:c + 1, :]
            vals = _vals8(ma_ref[fi, c:c + 1, :],
                          mb_ref[fi, c:c + 1, :],
                          mc_ref[fi, c:c + 1, :])
            _mxu_chunk_d(out_ref, fi, wrow, vals, row0, kmax=KMAX,
                         last=last)

            @pl.when(cb2_ref[f, c] < 0)
            def _(fi=fi, c=c, row0=row0, last=last):
                sv = _vals8(s2a_ref[fi, c:c + 1, :],
                            s2b_ref[fi, c:c + 1, :],
                            s2c_ref[fi, c:c + 1, :])
                _mxu_chunk_d(out_ref, fi, s2w_ref[fi, c:c + 1, :], sv,
                             row0, kmax=KMAX)

        for c in range(nc1):
            @pl.when(cb1_ref[f, c] < 0)
            def _(fi=fi, c=c):
                row0 = (cb1_ref[f, c] & i32(MASK31)) >> i32(12)
                sv = _vals8(s1a_ref[fi, c:c + 1, :],
                            s1b_ref[fi, c:c + 1, :], None)
                _mxu_chunk_d(out_ref, fi, s1w_ref[fi, c:c + 1, :], sv,
                             row0, kmax=KMAX1)


@functools.partial(jax.jit, static_argnames=("fb",))
def merge_v5d(mainw, mainr, sp2w, sp2r, sp1w, sp1r, cb2, cb1,
              fb: int = 8):
    """All inputs in row layout [F, nc, 128]."""
    F_ = mainw.shape[0]
    nc2 = mainw.shape[1]
    nc1 = sp1w.shape[1]
    kernel = functools.partial(k_v5d, nc2=nc2, nc1=nc1, fb=fb)

    def rspec(ncx):
        return pl.BlockSpec((fb, ncx, LANE),
                            lambda i, *_: (i, _z(), _z()))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F_ // fb,),
        in_specs=[rspec(nc2)] * 8 + [rspec(nc1)] * 3,
        out_specs=pl.BlockSpec((fb, wr, LANE),
                               lambda i, *_: (i, _z(), _z())))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F_, wr, LANE), i32),
    )(cb2, cb1, mainw, *mainr, sp2w, *sp2r, sp1w, *sp1r)


def k_v5c(cb2_ref, cb1_ref,
          mw_ref, ma_ref, mb_ref, mc_ref,
          s2w_ref, s2a_ref, s2b_ref, s2c_ref,
          s1w_ref, s1a_ref, s1b_ref,
          out_ref, *, nc2, nc1, fb):
    g = pl.program_id(0)
    out_ref[...] = jnp.zeros((fb, wr, LANE), i32)

    for fi in range(fb):
        f = g * fb + fi
        for c in range(nc2):
            row0 = (cb2_ref[f, c] & i32(MASK31)) >> i32(12)
            wcol = mw_ref[fi, :, c:c + 1]
            vals = _vals8(ma_ref[fi, c:c + 1, :],
                          mb_ref[fi, c:c + 1, :],
                          mc_ref[fi, c:c + 1, :])
            _mxu_chunk(out_ref, fi, wcol, vals, row0, kmax=KMAX)

            @pl.when(cb2_ref[f, c] < 0)
            def _(fi=fi, c=c, row0=row0):
                sv = _vals8(s2a_ref[fi, c:c + 1, :],
                            s2b_ref[fi, c:c + 1, :],
                            s2c_ref[fi, c:c + 1, :])
                _mxu_chunk(out_ref, fi, s2w_ref[fi, :, c:c + 1], sv,
                           row0, kmax=KMAX)

        for c in range(nc1):
            @pl.when(cb1_ref[f, c] < 0)
            def _(fi=fi, c=c):
                row0 = (cb1_ref[f, c] & i32(MASK31)) >> i32(12)
                sv = _vals8(s1a_ref[fi, c:c + 1, :],
                            s1b_ref[fi, c:c + 1, :], None)
                _mxu_chunk(out_ref, fi, s1w_ref[fi, :, c:c + 1], sv,
                           row0, kmax=KMAX1)


@functools.partial(jax.jit, static_argnames=("fb",))
def merge_v5c(mainc, mainr, sp2c, sp2r, sp1c, sp1r, cb2, cb1,
              fb: int = 8):
    """mainc: w0 column-chunk [F,128,nc2]; mainr: (A,B,C) row layout
    [F,nc2,128]; similarly sp2/sp1 (sp1 has no C)."""
    F_ = mainc.shape[0]
    nc2 = mainc.shape[-1]
    nc1 = sp1c.shape[-1]
    kernel = functools.partial(k_v5c, nc2=nc2, nc1=nc1, fb=fb)

    def cspec(ncx):
        return pl.BlockSpec((fb, LANE, ncx),
                            lambda i, *_: (i, _z(), _z()))

    def rspec(ncx):
        return pl.BlockSpec((fb, ncx, LANE),
                            lambda i, *_: (i, _z(), _z()))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F_ // fb,),
        in_specs=[cspec(nc2)] + [rspec(nc2)] * 3
        + [cspec(nc2)] + [rspec(nc2)] * 3
        + [cspec(nc1)] + [rspec(nc1)] * 2,
        out_specs=pl.BlockSpec((fb, wr, LANE),
                               lambda i, *_: (i, _z(), _z())))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F_, wr, LANE), i32),
    )(cb2, cb1, mainc, *mainr, sp2c, *sp2r, sp1c, *sp1r)


def to_rows(x):
    """[F, M] -> [F, nc, 128] (natural reshape, slots on lanes)."""
    Fs, M = x.shape
    nc = -(-M // 128)
    if nc * 128 != M:
        x = jnp.pad(x, ((0, 0), (0, nc * 128 - M)))
    return x.reshape(Fs, nc, 128)


def build_v5c_parts(x):
    """Same combining as build_v5_parts but emitting the dual-layout
    arrays for the MXU kernel + the per-frame overflow flag."""
    out = analyze_frames(x, cfg, hdr_bits)
    lengths, leading, payload = bitpack.pack_frames_device(
        out, hbj, hnj, cfg, debug=True)
    total_bits = lengths.sum(axis=-1)

    ln = _pad_even(lengths)
    lead = _pad_even(leading)
    pay = _pad_even(payload)
    sw = ln - lead
    g = jnp.zeros_like(ln)
    ph = jnp.zeros_like(pay)

    (ln1, sw1, g1, ph1, pl1), (s1_sw, s1_rel, s1_ph, s1_pl) = \
        combine_level(ln, sw, g, ph, pay)
    ln1p = _pad_even(ln1)
    sw1p = _pad_even(sw1)
    g1p = _pad_even(g1)
    ph1p = _pad_even(ph1)
    pl1p = _pad_even(pl1)
    (ln2, sw2, g2, ph2, pl2), (s2_sw, s2_rel, s2_ph, s2_pl) = \
        combine_level(ln1p, sw1p, g1p, ph1p, pl1p)

    off2 = bitpack._exclusive_cumsum_hier(ln2)
    lnA = ln1p[..., 0::2]
    off1 = jnp.stack([off2, off2 + lnA], axis=-1) \
        .reshape(off2.shape[0], -1)[..., :ln1.shape[-1]]

    ps_m = off2 + ln2 - g2 - sw2
    m_w0, m_A, m_B, m_C = align3(ps_m, sw2, ph2, pl2)
    ps_s2 = off2 + s2_rel
    s2_w0, s2_A, s2_B, s2_C = align3(ps_s2, s2_sw, s2_ph, s2_pl)
    ps_s1 = off1 + s1_rel
    s1_w0, s1_A, s1_B, _ = align3(ps_s1, s1_sw, s1_ph, s1_pl)

    mainc = to_chunks(m_w0)
    mainr = tuple(to_rows(v) for v in (m_A, m_B, m_C))
    sp2c = to_chunks(s2_w0)
    sp2r = tuple(to_rows(v) for v in (s2_A, s2_B, s2_C))
    sp1c = to_chunks(s1_w0)
    sp1r = tuple(to_rows(v) for v in (s1_A, s1_B))

    nc2 = mainc.shape[-1]
    nc1 = sp1c.shape[-1]
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
        Ms = sw_arr.shape[-1]
        pad = ncx * 128 - Ms
        sa = jnp.pad(sw_arr, ((0, 0), (0, pad))) if pad else sw_arr
        return (sa.reshape(sa.shape[0], ncx, 128) > 0) \
            .any(axis=-1).astype(i32)

    fl2 = chunk_any(s2_sw, nc2)
    fl1 = chunk_any(s1_sw, nc1)

    # overflow: any chunk needing more than KMAX/KMAX1 static rows
    def chunk_rows(cb, kmax):
        r0 = (cb[:, :-1] & MASK31) >> 12
        last = (((cb[:, 1:] & MASK31) - 1 >> 5) + 2) >> 7
        return (jnp.maximum(last, r0) - r0 + 1) > kmax

    ov = chunk_rows(cb2, KMAX).any(axis=-1) \
        | (chunk_rows(cb1, KMAX1) & (fl1 > 0)).any(axis=-1)

    neg = jnp.int32(-2147483648)
    cb2 = cb2.at[:, :nc2].set(
        jnp.where(fl2 > 0, cb2[:, :nc2] | neg, cb2[:, :nc2]))
    cb1 = cb1.at[:, :nc1].set(
        jnp.where(fl1 > 0, cb1[:, :nc1] | neg, cb1[:, :nc1]))
    return mainc, mainr, sp2c, sp2r, sp1c, sp1r, cb2, cb1, ov


# zero-floor kernel with fb batching
def k_zero_fb(cb2_ref, cb1_ref, *refs, nc2, nc1, fb):
    out_ref = refs[-1]
    out_ref[...] = jnp.zeros((fb, wr, LANE), i32)


@functools.partial(jax.jit, static_argnames=("fb",))
def merge_zero_fb(mainc, mainr, sp2c, sp2r, sp1c, sp1r, cb2, cb1,
                  fb: int = 8):
    F_ = mainc.shape[0]
    nc2 = mainc.shape[-1]
    nc1 = sp1c.shape[-1]
    kernel = functools.partial(k_zero_fb, nc2=nc2, nc1=nc1, fb=fb)

    def cspec(ncx):
        return pl.BlockSpec((fb, LANE, ncx),
                            lambda i, *_: (i, _z(), _z()))

    def rspec(ncx):
        return pl.BlockSpec((fb, ncx, LANE),
                            lambda i, *_: (i, _z(), _z()))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F_ // fb,),
        in_specs=[cspec(nc2)] + [rspec(nc2)] * 3
        + [cspec(nc2)] + [rspec(nc2)] * 3
        + [cspec(nc1)] + [rspec(nc1)] * 2,
        out_specs=pl.BlockSpec((fb, wr, LANE),
                               lambda i, *_: (i, _z(), _z())))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F_, wr, LANE), i32),
    )(cb2, cb1, mainc, *mainr, sp2c, *sp2r, sp1c, *sp1r)


# ---------------------------------------------------------------------------
# reference (current production path) for correctness + timing
# ---------------------------------------------------------------------------

def ref_parts(x):
    out = analyze_frames(x, cfg, hdr_bits)
    lengths, leading, payload = bitpack.pack_frames_device(
        out, hbj, hnj, cfg, debug=True)
    total_bits = lengths.sum(axis=-1)
    offsets = bitpack._exclusive_cumsum_hier(lengths)
    paylen = lengths - leading
    paystart = offsets + leading
    w0 = (paystart >> 5).astype(i32)
    inword = paystart & 31
    t = paylen + inword
    first = t <= 32
    sh_hi1 = jnp.clip(32 - t, 0, 31).astype(u32)
    sh_hi2 = jnp.clip(t - 32, 0, 31).astype(u32)
    sh_lo = jnp.clip(64 - t, 1, 31).astype(u32)
    hi32 = jnp.where(first, payload << sh_hi1, payload >> sh_hi2)
    lo32 = jnp.where(first, u32(0), payload << sh_lo)
    active = paylen > 0
    hi32 = jnp.where(active, hi32, u32(0))
    lo32 = jnp.where(active, lo32, u32(0))
    Fs, M = lengths.shape
    nc = -(-M // 128)
    Mp = nc * 128

    def tc(x, fill):
        if Mp != M:
            x = jnp.pad(x, ((0, 0), (0, Mp - M)), constant_values=fill)
        return jnp.transpose(x.reshape(Fs, nc, 128), (0, 2, 1))

    w0t = tc(w0, 0)
    hit = tc(hi32.astype(i32), 0)
    lot = tc(lo32.astype(i32), 0)
    bit_bounds = offsets[:, ::128]
    chunk_bits = jnp.concatenate(
        [bit_bounds, total_bits[:, None]], axis=-1).astype(i32)
    return w0t, hit, lot, chunk_bits


def timeit(f, *args, iters=20):
    g = jax.jit(lambda *a: jnp.sum(
        jnp.stack([jnp.sum(x.astype(jnp.float32)) for x in f(*a)])))
    float(g(*args))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            s = g(*args)
            acc = s if acc is None else acc + s
        float(acc)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / iters


def timeit_slope(f, *args, k1=1, k2=6):
    """In-graph repetition slope: dispatch/tunnel overhead cancels.
    The first arg must be an int32 array perturbable by +i."""
    def make(K):
        def g(*a):
            acc = None
            for i in range(K):
                aa = (a[0] + jnp.int32(i),) + tuple(a[1:])
                s = jnp.sum(jnp.stack(
                    [jnp.sum(x.astype(jnp.float32)) for x in f(*aa)]))
                acc = s if acc is None else acc + s
            return acc
        return jax.jit(g)
    g1, g2 = make(k1), make(k2)
    t1 = timeit(lambda *a: (g1(*a),), *args, iters=10)
    t2 = timeit(lambda *a: (g2(*a),), *args, iters=10)
    # second pass interleaved to shave tunnel-variance
    t1 = min(t1, timeit(lambda *a: (g1(*a),), *args, iters=10))
    t2 = min(t2, timeit(lambda *a: (g2(*a),), *args, iters=10))
    return (t2 - t1) / (k2 - k1)


def main():
    res = {}
    for kind in ("music", "noise"):
        x = make_batch(kind)
        rp = jax.jit(ref_parts)(x)
        rp = tuple(jnp.asarray(np.asarray(v)) for v in rp)
        ref = np.asarray(merge_words(rp[0], rp[1], rp[2], rp[3], wr=wr))

        parts = jax.jit(build_v5_parts)(x)
        parts = jax.tree_util.tree_map(
            lambda v: jnp.asarray(np.asarray(v)), parts)
        main_p, sp2, sp1, cb2, cb1 = parts
        got = np.asarray(merge_v5a(main_p, sp2, sp1, cb2, cb1))
        res[f"{kind}_match"] = bool(np.array_equal(ref, got))
        if not res[f"{kind}_match"]:
            bad = np.argwhere(ref != got)
            res[f"{kind}_first_bad"] = bad[:3].tolist()
        res[f"{kind}_nc2"] = int(main_p[0].shape[-1])
        res[f"{kind}_sp2_active_frac"] = round(
            float((np.asarray(cb2)[:, :-1] < 0).mean()), 4)
        res[f"{kind}_sp1_active_frac"] = round(
            float((np.asarray(cb1)[:, :-1] < 0).mean()), 4)

        def m_ref(w0t, hit, lot, cb):
            return (merge_words(w0t, hit, lot, cb, wr=wr)[:, ::7, ::11],)

        def m_v5(mp, s2, s1, c2, c1):
            return (merge_v5a(mp, s2, s1, c2, c1)[:, ::7, ::11],)

        gotb = np.asarray(merge_v5b(main_p, sp2, sp1, cb2, cb1))
        res[f"{kind}_match_b"] = bool(np.array_equal(ref, gotb))

        def m_v5b(mp, s2, s1, c2, c1):
            return (merge_v5b(mp, s2, s1, c2, c1)[:, ::7, ::11],)

        res[f"{kind}_merge_v1_ms"] = round(timeit(m_ref, *rp) * 1e3, 3)
        res[f"{kind}_merge_v5a_ms"] = round(
            timeit(m_v5, main_p, sp2, sp1, cb2, cb1) * 1e3, 3)
        res[f"{kind}_merge_v5b_ms"] = round(
            timeit(m_v5b, main_p, sp2, sp1, cb2, cb1) * 1e3, 3)
        res[f"{kind}_prep_v5_ms"] = round(
            timeit(lambda x: (build_v5_parts(x)[3],), x) * 1e3, 3)
    print(json.dumps(res))


def build_v5d_parts(x):
    mainc, mainr, sp2c, sp2r, sp1c, sp1r, cb2, cb1, ov = \
        build_v5c_parts(x)
    # re-derive w0 in row layout from the column layout (transpose
    # back; in production build the row layout directly)
    def cols_to_rows(xc):
        return jnp.transpose(xc, (0, 2, 1))
    return (cols_to_rows(mainc), mainr, cols_to_rows(sp2c), sp2r,
            cols_to_rows(sp1c), sp1r, cb2, cb1, ov)


def k_zero_rows(cb2_ref, cb1_ref, *refs, fb):
    out_ref = refs[-1]
    out_ref[...] = jnp.zeros((fb, wr, LANE), i32)


@functools.partial(jax.jit, static_argnames=("fb",))
def merge_zero_rows(mainw, mainr, sp2w, sp2r, sp1w, sp1r, cb2, cb1,
                    fb: int = 8):
    F_ = mainw.shape[0]
    nc2 = mainw.shape[1]
    nc1 = sp1w.shape[1]
    kernel = functools.partial(k_zero_rows, fb=fb)

    def rspec(ncx):
        return pl.BlockSpec((fb, ncx, LANE),
                            lambda i, *_: (i, _z(), _z()))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F_ // fb,),
        in_specs=[rspec(nc2)] * 8 + [rspec(nc1)] * 3,
        out_specs=pl.BlockSpec((fb, wr, LANE),
                               lambda i, *_: (i, _z(), _z())))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F_, wr, LANE), i32),
    )(cb2, cb1, mainw, *mainr, sp2w, *sp2r, sp1w, *sp1r)


def main_v5d():
    res = {}
    for kind in ("music", "noise"):
        x = make_batch(kind)
        rp = jax.jit(ref_parts)(x)
        rp = tuple(jnp.asarray(np.asarray(v)) for v in rp)
        ref = np.asarray(merge_words(rp[0], rp[1], rp[2], rp[3], wr=wr))

        parts = jax.jit(build_v5d_parts)(x)
        parts = jax.tree_util.tree_map(
            lambda v: jnp.asarray(np.asarray(v)), parts)
        *kin, ov = parts
        res[f"{kind}_overflow_frames"] = int(np.asarray(ov).sum())
        got = np.asarray(merge_v5d(*kin, fb=8))
        ok = np.array_equal(ref, got)
        if res[f"{kind}_overflow_frames"]:
            keep = ~np.asarray(ov)
            ok = np.array_equal(ref[keep], got[keep])
        res[f"{kind}_match"] = bool(ok)
        for fb in (16, 32):
            def mc(*a, fb=fb):
                return (merge_v5d(*a, fb=fb)[:, ::7, ::11],)
            res[f"{kind}_v5d_fb{fb}_slope_ms"] = round(
                timeit_slope(mc, *kin) * 1e3, 3)
        if kind == "music":
            def prep_only(x):
                out = build_v5d_parts(x)
                return (out[0][:, ::3, ::5], out[6])
            res["prep_slope_ms"] = round(
                timeit_slope(prep_only, x) * 1e3, 3)

            def analysis_only(x):
                out = analyze_frames(x, cfg, hdr_bits)
                return (out["frame_bytes"],)
            res["analysis_slope_ms"] = round(
                timeit_slope(analysis_only, x) * 1e3, 3)
    print(json.dumps(res))


def main_v5c():
    res = {}
    for kind in ("music", "noise"):
        x = make_batch(kind)
        rp = jax.jit(ref_parts)(x)
        rp = tuple(jnp.asarray(np.asarray(v)) for v in rp)
        ref = np.asarray(merge_words(rp[0], rp[1], rp[2], rp[3], wr=wr))

        parts = jax.jit(build_v5c_parts)(x)
        parts = jax.tree_util.tree_map(
            lambda v: jnp.asarray(np.asarray(v)), parts)
        *kin, ov = parts
        res[f"{kind}_overflow_frames"] = int(np.asarray(ov).sum())
        got = np.asarray(merge_v5c(*kin, fb=8))
        res[f"{kind}_match"] = bool(np.array_equal(ref, got))
        if not res[f"{kind}_match"]:
            bad = np.argwhere(ref != got)
            res[f"{kind}_first_bad"] = bad[:3].tolist()
            res[f"{kind}_nbad"] = int(bad.shape[0])

        if kind == "music":
            for fb in (1, 8):
                def mz(*a, fb=fb):
                    return (merge_zero_fb(*a, fb=fb)[:, ::7, ::11],)
                res[f"zero_fb{fb}_ms"] = round(
                    timeit(mz, *kin) * 1e3, 3)
        for fb in (4, 8, 16):
            def mc(*a, fb=fb):
                return (merge_v5c(*a, fb=fb)[:, ::7, ::11],)
            res[f"{kind}_v5c_fb{fb}_ms"] = round(
                timeit(mc, *kin) * 1e3, 3)
        res[f"{kind}_prep_ms"] = round(
            timeit(lambda x: (build_v5c_parts(x)[6],), x) * 1e3, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    if "--v5d" in sys.argv:
        main_v5d()
    elif "--v5c" in sys.argv:
        main_v5c()
    else:
        main()
