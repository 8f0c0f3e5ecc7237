"""Decompose the device-emission cost at level-8 CD (tunnel-safe).

Times, on real TPU content (512x4096x2 level-8 frames):
  analysis        batched analysis alone
  emit_full       analysis + device pack (the pipeline metric)
  prep            XLA slot prep (lengths/leading/payload + align + chunks)
  merge_now       the production Pallas merge kernel alone
  merge_static2   variant: no row fori_loop; 2 static RMW writes per chunk
  merge_fixedrow  variant: window math kept, RMW forced to row 0 (WRONG
                  results; isolates the dynamic-sublane-write cost)
  merge_nowin     variant: loop kept, window compares dropped (WRONG;
                  isolates loop+RMW overhead)
  merge_zero      kernel that only zeroes the output (grid/DMA floor)

Run from repo root: python util/prof_merge.py
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

rng = np.random.default_rng(0)
t = np.arange(F * B)
sig = 12000 * np.sin(2 * np.pi * 440 * t / 44100) \
    + 800 * rng.standard_normal(F * B)
l = np.clip(sig, -32768, 32767).astype(np.int32)
r = np.clip(0.8 * sig, -32768, 32767).astype(np.int32)
samples = jnp.asarray(np.stack([l, r], -1).reshape(F, B, C))
hdr_bits = jnp.full((F,), 48, jnp.int32)
nums = np.arange(F, dtype=np.uint32)
hb, hn = bitpack.frame_header_bytes(
    nums, bs_code=P.blocksize_code(B), sr_code=P.samplerate_code(sr),
    allow_vbs=p.allow_vbs)
hbj, hnj = jnp.asarray(hb), jnp.asarray(hn)
wr = bitpack.word_rows(cfg)


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


# ---- full-path references -------------------------------------------------

def f_analysis(x):
    out = analyze_frames(x, cfg, hdr_bits)
    return (out["frame_bytes"],)


def f_emit(x):
    out = analyze_frames(x, cfg, hdr_bits)
    words, tb = bitpack.pack_frames_device(out, hbj, hnj, cfg,
                                           backend="kernel")
    return (tb, words[:, ::7, ::11])


# ---- prep-only: replicate pack_frames_device post-debug to kernel inputs --

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


def f_prep(x):
    w0t, hit, lot, cb = aligned_parts(x)
    return (w0t[:, ::5, ::3], hit[:, ::5, ::3], lot[:, ::5, ::3], cb)


# ---- kernel variants ------------------------------------------------------

def _z():
    return jnp.int32(0)


def _mk(kernel_fn, nc):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(F,),
        in_specs=[pl.BlockSpec((1, LANE, nc), lambda i, cb: (i, _z(), _z()))
                  for _ in range(3)],
        out_specs=pl.BlockSpec((1, wr, LANE),
                               lambda i, cb: (i, _z(), _z())))
    return pl.pallas_call(
        functools.partial(kernel_fn, nc=nc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, wr, LANE), jnp.int32))


def k_static2(cb_ref, w0t_ref, hit_ref, lot_ref, out_ref, *, nc):
    i32 = jnp.int32
    f = pl.program_id(0)
    out_ref[0] = jnp.zeros((wr, LANE), i32)
    iota = jax.lax.broadcasted_iota(i32, (LANE, LANE), 1)
    zero = jnp.zeros((LANE, LANE), i32)
    for c in range(nc):
        wcol = w0t_ref[0, :, c:c + 1]
        hcol = hit_ref[0, :, c:c + 1]
        lcol = lot_ref[0, :, c:c + 1]
        base_bit = cb_ref[f, c]
        row0 = base_bit >> i32(12)
        for dr in range(2):
            rel = wcol - (row0 + dr) * LANE
            whi = jnp.where(rel == iota,
                            jnp.broadcast_to(hcol, (LANE, LANE)), zero)
            wlo = jnp.where(rel + 1 == iota,
                            jnp.broadcast_to(lcol, (LANE, LANE)), zero)
            win = jnp.sum(whi + wlo, axis=0, keepdims=True,
                          dtype=jnp.int32)
            cur = out_ref[0, pl.ds(row0 + dr, 1), :]
            out_ref[0, pl.ds(row0 + dr, 1), :] = cur + win


def k_fixedrow(cb_ref, w0t_ref, hit_ref, lot_ref, out_ref, *, nc):
    i32 = jnp.int32
    f = pl.program_id(0)
    out_ref[0] = jnp.zeros((wr, LANE), i32)
    iota = jax.lax.broadcasted_iota(i32, (LANE, LANE), 1)
    zero = jnp.zeros((LANE, LANE), i32)
    for c in range(nc):
        wcol = w0t_ref[0, :, c:c + 1]
        hcol = hit_ref[0, :, c:c + 1]
        lcol = lot_ref[0, :, c:c + 1]
        base_bit = cb_ref[f, c]
        end_bit = cb_ref[f, c + 1]
        row0 = base_bit >> i32(12)
        last_row = (((end_bit - 1) >> i32(5)) + 1) >> i32(7)
        last_row = jnp.maximum(last_row, row0)

        def body(row, carry):
            rel = wcol - row * LANE
            whi = jnp.where(rel == iota,
                            jnp.broadcast_to(hcol, (LANE, LANE)), zero)
            wlo = jnp.where(rel + 1 == iota,
                            jnp.broadcast_to(lcol, (LANE, LANE)), zero)
            win = jnp.sum(whi + wlo, axis=0, keepdims=True,
                          dtype=jnp.int32)
            cur = out_ref[0, 0:1, :]
            out_ref[0, 0:1, :] = cur + win
            return carry
        jax.lax.fori_loop(row0, last_row + 1, body, jnp.int32(0))


def k_nowin(cb_ref, w0t_ref, hit_ref, lot_ref, out_ref, *, nc):
    i32 = jnp.int32
    f = pl.program_id(0)
    out_ref[0] = jnp.zeros((wr, LANE), i32)
    for c in range(nc):
        hcol = hit_ref[0, :, c:c + 1]
        base_bit = cb_ref[f, c]
        end_bit = cb_ref[f, c + 1]
        row0 = base_bit >> i32(12)
        last_row = (((end_bit - 1) >> i32(5)) + 1) >> i32(7)
        last_row = jnp.maximum(last_row, row0)

        def body(row, carry):
            win = jnp.sum(hcol, axis=0, keepdims=True, dtype=jnp.int32)
            cur = out_ref[0, pl.ds(row, 1), :]
            out_ref[0, pl.ds(row, 1), :] = cur + win
            return carry
        jax.lax.fori_loop(row0, last_row + 1, body, jnp.int32(0))


def k_zero(cb_ref, w0t_ref, hit_ref, lot_ref, out_ref, *, nc):
    out_ref[0] = jnp.zeros((wr, LANE), jnp.int32)


def main():
    parts = jax.jit(aligned_parts)(samples)
    parts = tuple(jnp.asarray(np.asarray(x)) for x in parts)
    w0t, hit, lot, cb = parts
    nc = w0t.shape[-1]
    res = {"F": F, "nc": nc, "wr": wr}

    def merge_ref(w0t, hit, lot, cb):
        w = merge_words(w0t, hit, lot, cb, wr=wr)
        return (w[:, ::7, ::11],)

    res["analysis_ms"] = round(timeit(f_analysis, samples) * 1e3, 3)
    res["emit_full_ms"] = round(timeit(f_emit, samples) * 1e3, 3)
    res["prep_ms"] = round(timeit(f_prep, samples) * 1e3, 3)
    res["merge_now_ms"] = round(timeit(merge_ref, *parts) * 1e3, 3)

    for name, k in (("static2", k_static2), ("fixedrow", k_fixedrow),
                    ("nowin", k_nowin), ("zero", k_zero)):
        call = _mk(k, nc)

        def f(w0t, hit, lot, cb, call=call):
            w = call(cb, w0t, hit, lot)
            return (w[:, ::7, ::11],)
        res[f"merge_{name}_ms"] = round(timeit(f, *parts) * 1e3, 3)

    # correctness spot check for static2 on this content
    ref = np.asarray(merge_words(w0t, hit, lot, cb, wr=wr))
    got = np.asarray(_mk(k_static2, nc)(cb, w0t, hit, lot))
    res["static2_matches"] = bool(np.array_equal(ref, got))
    audio_s = F * B / sr
    res["pipeline_xrt_now"] = round(audio_s / (res["emit_full_ms"] / 1e3), 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
