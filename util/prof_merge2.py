"""Prototype + timing for the v2 merge kernel (64-lane chunk windows).

Design (vs the round-4 kernel): no per-row fori_loop — each 128-slot
chunk one-hots against a 64-word window anchored at the chunk's start
word (chunk extents at real levels are ~46 words), the [1, 128] window
is placed with ONE dynamic lane roll, and rows accumulate in a 2-row
register carry flushed forward as the (monotonic) bit cursor crosses
row boundaries. Chunks wider than 64 words run up to 3 predicated
extra passes (covers extents to 256 words); wider than that sets a
per-frame overflow flag -> caller re-runs the batch on the v1 kernel.

Run on TPU from repo root: python util/prof_merge2.py
"""
import functools
import json
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


def make_batch(kind):
    rng = np.random.default_rng(0)
    t = np.arange(F * B)
    if kind == "music":
        sig = 12000 * np.sin(2 * np.pi * 440 * t / 44100) \
            + 800 * rng.standard_normal(F * B)
    else:  # noise -> verbatim-heavy frames (wide chunks)
        sig = rng.integers(-32768, 32767, F * B)
    l = np.clip(sig, -32768, 32767).astype(np.int32)
    r = np.clip(0.8 * sig, -32768, 32767).astype(np.int32) \
        if kind == "music" else \
        rng.integers(-32768, 32767, F * B).astype(np.int32)
    return jnp.asarray(np.stack([l, r], -1).reshape(F, B, C))


hdr_bits = jnp.full((F,), 48, jnp.int32)
nums = np.arange(F, dtype=np.int64)
hb, hn = bitpack.frame_header_bytes(
    nums, bs_code=P.blocksize_code(B), sr_code=P.samplerate_code(sr),
    allow_vbs=p.allow_vbs)
hbj, hnj = jnp.asarray(hb), jnp.asarray(hn)


def aligned_parts(x):
    out = analyze_frames(x, cfg, hdr_bits)
    lengths, leading, payload = bitpack.pack_frames_device(
        out, hbj, hnj, cfg, debug=True)
    total_bits = lengths.sum(axis=-1)
    offsets = bitpack._exclusive_cumsum_hier(lengths)
    paylen = lengths - leading
    paystart = offsets + leading
    u32 = jnp.uint32
    w0 = (paystart >> 5).astype(jnp.int32)
    inword = paystart & 31
    tt = paylen + inword
    first = tt <= 32
    sh_hi1 = jnp.clip(32 - tt, 0, 31).astype(u32)
    sh_hi2 = jnp.clip(tt - 32, 0, 31).astype(u32)
    sh_lo = jnp.clip(64 - tt, 1, 31).astype(u32)
    hi32 = jnp.where(first, payload << sh_hi1, payload >> sh_hi2)
    lo32 = jnp.where(first, u32(0), payload << sh_lo)
    active = paylen > 0
    hi32 = jnp.where(active, hi32, u32(0))
    lo32 = jnp.where(active, lo32, u32(0))
    M = lengths.shape[-1]
    nc = -(-M // 128)
    Mp = nc * 128

    def to_chunks(x, fill):
        if Mp != M:
            x = jnp.pad(x, ((0, 0), (0, Mp - M)), constant_values=fill)
        return jnp.transpose(x.reshape(F, nc, 128), (0, 2, 1))

    w0t = to_chunks(w0, 0)
    hit = to_chunks(hi32.astype(jnp.int32), 0)
    lot = to_chunks(lo32.astype(jnp.int32), 0)
    bit_bounds = offsets[:, ::128]
    chunk_bits = jnp.concatenate(
        [bit_bounds, total_bits[:, None]], axis=-1).astype(jnp.int32)
    return w0t, hit, lot, chunk_bits


def _z():
    return jnp.int32(0)


W = 64       # window words per pass
NPASS = 4    # covers chunk extents < NPASS*W words


def _frame_body(cb_row, w0m, him, lom, store_rmw, *, nc: int):
    """Merge one frame: w0m/him/lom [128, nc] (already squeezed),
    cb_row scalar-read fn cb_row(c); store_rmw(row_scalar, vec[1,128])
    accumulates into the frame's word rows."""
    i32 = jnp.int32
    iota_w = jax.lax.broadcasted_iota(i32, (LANE, W), 1)
    lane128 = jax.lax.broadcasted_iota(i32, (1, LANE), 1)
    zero_w = jnp.zeros((LANE, W), i32)
    zrow = jnp.zeros((1, LANE), i32)

    a0, a1 = zrow, zrow
    ra = jnp.int32(0)
    for c in range(nc):
        wcol = w0m[:, c:c + 1]
        hcol = him[:, c:c + 1]
        lcol = lom[:, c:c + 1]
        cb0 = cb_row(c)
        cb1 = cb_row(c + 1)
        cw = cb0 >> i32(5)
        r = cw >> i32(7)
        # flush the carry forward until ra == r (advance <= 2 per chunk
        # given the 256-word extent cap)
        for _ in range(2):
            do = ra < r
            a0c, a1c, rac = a0, a1, ra

            @pl.when(do)
            def _():
                store_rmw(rac, a0c)
            a0 = jnp.where(do, a1c, a0c)
            a1 = jnp.where(do, zrow, a1c)
            ra = jnp.where(do, rac + 1, rac)

        ext = ((cb1 - 1) >> i32(5)) - cw  # last hi word, chunk-relative
        rel0 = wcol - cw
        lanepos = cw & i32(127)
        # pass 0 (always) -> carry rows ra / ra+1
        m = rel0 == iota_w
        redhi = jnp.sum(jnp.where(m, jnp.broadcast_to(hcol, (LANE, W)),
                                  zero_w), axis=0, keepdims=True,
                        dtype=i32)
        redlo = jnp.sum(jnp.where(m, jnp.broadcast_to(lcol, (LANE, W)),
                                  zero_w), axis=0, keepdims=True,
                        dtype=i32)
        win = jnp.concatenate([redhi, zrow[:, :LANE - W]], axis=1) \
            + pltpu.roll(jnp.concatenate([redlo, zrow[:, :LANE - W]],
                                         axis=1), jnp.int32(1), axis=1)
        rolled = pltpu.roll(win, lanepos, axis=1)
        a0 = a0 + jnp.where(lane128 >= lanepos, rolled, zrow)
        a1 = a1 + jnp.where(lane128 < lanepos, rolled, zrow)

        # predicated wide-chunk passes -> direct RMW (additive, so the
        # later carry flush of the same rows composes correctly)
        for pno in range(1, NPASS):
            @pl.when(ext >= pno * W)
            def _(pno=pno):
                relp = rel0 - i32(pno * W)
                mp = relp == iota_w
                rh = jnp.sum(jnp.where(mp,
                                       jnp.broadcast_to(hcol, (LANE, W)),
                                       zero_w), axis=0, keepdims=True,
                             dtype=i32)
                rl = jnp.sum(jnp.where(mp,
                                       jnp.broadcast_to(lcol, (LANE, W)),
                                       zero_w), axis=0, keepdims=True,
                             dtype=i32)
                wp = jnp.concatenate([rh, zrow[:, :LANE - W]], axis=1) \
                    + pltpu.roll(jnp.concatenate(
                        [rl, zrow[:, :LANE - W]], axis=1),
                        jnp.int32(1), axis=1)
                cwp = cw + i32(pno * W)
                lpp = cwp & i32(127)
                rp = cwp >> i32(7)
                rolledp = pltpu.roll(wp, lpp, axis=1)
                store_rmw(rp, jnp.where(lane128 >= lpp, rolledp, zrow))
                store_rmw(rp + 1,
                          jnp.where(lane128 < lpp, rolledp, zrow))

    store_rmw(ra, a0)
    return ra, a1


def k_v2(cb_ref, w0t_ref, hit_ref, lot_ref, out_ref, *, nc, fb):
    i32 = jnp.int32
    g = pl.program_id(0)
    out_ref[...] = jnp.zeros((fb, wr, LANE), i32)

    def run_frame(fi, carry):
        w0m = w0t_ref[pl.ds(fi, 1), :, :][0]
        him = hit_ref[pl.ds(fi, 1), :, :][0]
        lom = lot_ref[pl.ds(fi, 1), :, :][0]

        def cb_row(c):
            return cb_ref[g * fb + fi, c]

        def store_rmw(row, vec):
            cur = out_ref[pl.ds(fi, 1), pl.ds(row, 1), :]
            out_ref[pl.ds(fi, 1), pl.ds(row, 1), :] = cur + vec[None]

        ra, a1 = _frame_body(cb_row, w0m, him, lom, store_rmw, nc=nc)

        @pl.when(ra + 1 < jnp.int32(wr))
        def _():
            store_rmw(ra + 1, a1)
        return carry

    # bounds pinned i32: python-int bounds trace as int64 under x64 and
    # send Mosaic's convert lowering into infinite recursion
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(fb), run_frame,
                      jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("fb",))
def merge_v2(w0t, hit, lot, chunk_bits, fb: int = 8):
    F_, _, nc = w0t.shape
    kernel = functools.partial(k_v2, nc=nc, fb=fb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F_ // fb,),
        in_specs=[pl.BlockSpec((fb, LANE, nc),
                               lambda i, cb: (i, _z(), _z()))
                  for _ in range(3)],
        out_specs=pl.BlockSpec((fb, wr, LANE),
                               lambda i, cb: (i, _z(), _z())))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F_, wr, LANE), jnp.int32),
    )(chunk_bits, w0t, hit, lot)


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


def main():
    res = {}
    for kind in ("music", "noise"):
        x = make_batch(kind)
        parts = jax.jit(aligned_parts)(x)
        parts = tuple(jnp.asarray(np.asarray(v)) for v in parts)
        w0t, hit, lot, cb = parts
        nc = w0t.shape[-1]
        cbh = np.asarray(cb)
        ext = ((cbh[:, 1:] - 1) >> 5) - (cbh[:, :-1] >> 5)
        res[f"{kind}_max_chunk_ext_words"] = int(ext.max())
        ref = np.asarray(merge_words(w0t, hit, lot, cb, wr=wr))
        for fb in (1, 8):
            got = np.asarray(merge_v2(w0t, hit, lot, cb, fb=fb))
            res[f"{kind}_v2_fb{fb}_match"] = bool(
                np.array_equal(ref, got))
        if kind == "music":
            def mref(w0t, hit, lot, cb):
                return (merge_words(w0t, hit, lot, cb, wr=wr)
                        [:, ::7, ::11],)
            res["merge_v1_ms"] = round(timeit(mref, *parts) * 1e3, 3)
            for fb in (1, 4, 8, 16):
                def m2(w0t, hit, lot, cb, fb=fb):
                    return (merge_v2(w0t, hit, lot, cb, fb=fb)
                            [:, ::7, ::11],)
                res[f"merge_v2_fb{fb}_ms"] = round(
                    timeit(m2, *parts) * 1e3, 3)
    print(json.dumps(res))


def _dispatch():
    import sys as _s
    main_v3() if "--v3" in _s.argv else main()


# ---- v3: static2 + predicated row skip + fb frames per program ----------

def _frame_body_s2w(cb_row, w0m, him, lom, store_rmw, *, nc: int,
                    ndr: int = 4):
    """static2 structure, but rows 1..ndr-1 are predicated on the chunk
    actually touching them; row 0 always runs. No rolls, no carry."""
    i32 = jnp.int32
    iota = jax.lax.broadcasted_iota(i32, (LANE, LANE), 1)
    zero = jnp.zeros((LANE, LANE), i32)
    for c in range(nc):
        wcol = w0m[:, c:c + 1]
        hcol = him[:, c:c + 1]
        lcol = lom[:, c:c + 1]
        cb0 = cb_row(c)
        cb1 = cb_row(c + 1)
        row0 = cb0 >> i32(12)
        last_row = (((cb1 - 1) >> i32(5)) + 1) >> i32(7)

        def dorow(dr):
            rel = wcol - (row0 + dr) * LANE
            whi = jnp.where(rel == iota,
                            jnp.broadcast_to(hcol, (LANE, LANE)), zero)
            wlo = jnp.where(rel + 1 == iota,
                            jnp.broadcast_to(lcol, (LANE, LANE)), zero)
            win = jnp.sum(whi + wlo, axis=0, keepdims=True,
                          dtype=jnp.int32)
            store_rmw(row0 + dr, win)

        dorow(0)
        for dr in range(1, ndr):
            @pl.when(last_row >= row0 + dr)
            def _(dr=dr):
                dorow(dr)


def k_v3(cb_ref, w0t_ref, hit_ref, lot_ref, out_ref, *, nc, fb):
    i32 = jnp.int32
    g = pl.program_id(0)
    out_ref[...] = jnp.zeros((fb, wr, LANE), i32)

    def run_frame(fi, carry):
        w0m = w0t_ref[pl.ds(fi, 1), :, :][0]
        him = hit_ref[pl.ds(fi, 1), :, :][0]
        lom = lot_ref[pl.ds(fi, 1), :, :][0]

        def cb_row(c):
            return cb_ref[g * fb + fi, c]

        def store_rmw(row, vec):
            cur = out_ref[pl.ds(fi, 1), pl.ds(row, 1), :]
            out_ref[pl.ds(fi, 1), pl.ds(row, 1), :] = cur + vec[None]

        _frame_body_s2w(cb_row, w0m, him, lom, store_rmw, nc=nc)
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(fb), run_frame,
                      jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("fb",))
def merge_v3(w0t, hit, lot, chunk_bits, fb: int = 8):
    F_, _, nc = w0t.shape
    kernel = functools.partial(k_v3, nc=nc, fb=fb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F_ // fb,),
        in_specs=[pl.BlockSpec((fb, LANE, nc),
                               lambda i, cb: (i, _z(), _z()))
                  for _ in range(3)],
        out_specs=pl.BlockSpec((fb, wr, LANE),
                               lambda i, cb: (i, _z(), _z())))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F_, wr, LANE), jnp.int32),
    )(chunk_bits, w0t, hit, lot)


def main_v3():
    res = {}
    for kind in ("music", "noise"):
        x = make_batch(kind)
        parts = jax.jit(aligned_parts)(x)
        parts = tuple(jnp.asarray(np.asarray(v)) for v in parts)
        w0t, hit, lot, cb = parts
        ref = np.asarray(merge_words(w0t, hit, lot, cb, wr=wr))
        for fb in (1, 8):
            got = np.asarray(merge_v3(w0t, hit, lot, cb, fb=fb))
            res[f"{kind}_v3_fb{fb}_match"] = bool(
                np.array_equal(ref, got))
        if kind == "music":
            for fb in (1, 8, 16):
                def m3(w0t, hit, lot, cb, fb=fb):
                    return (merge_v3(w0t, hit, lot, cb, fb=fb)
                            [:, ::7, ::11],)
                res[f"merge_v3_fb{fb}_ms"] = round(
                    timeit(m3, *parts) * 1e3, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    _dispatch()
