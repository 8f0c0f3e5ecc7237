"""Dispatch-free stage attribution: repeat each stage K times *inside*
one jit (distinct inputs so nothing CSEs) and take the slope between two
K values — per-dispatch/tunnel overhead cancels exactly.

Run from the repo root: ``python util/prof_slope.py``.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax, jax.numpy as jnp
import flake_tpu
from flake_tpu import params as P

flake_tpu._enable_compile_cache_if_tpu()
from flake_tpu.ops.frame import FrameConfig, analyze_frames
from flake_tpu.ops import lpc as lpc_ops, predict, stereo, wasted
from flake_tpu.ops.rice import (calc_rice_params_dynamic,
                                subframe_bits_dynamic,
                                _split_partition_sums, zigzag_u32)

F, B = 512, 4096
cfg = FrameConfig.from_params(P.set_defaults(8), channels=2, bps=16,
                              block_size=B)

rng = np.random.default_rng(0)
t = np.arange(F * B)
sig = (12000 * np.sin(2 * np.pi * 440 * t / 44100)
       + 800 * rng.standard_normal(F * B))
l = np.clip(sig, -32768, 32767).astype(np.int32)
r = np.clip(0.8 * sig, -32768, 32767).astype(np.int32)
samples = jnp.asarray(np.stack([l, r], -1).reshape(F, B, 2))
hdr_bits = jnp.full((F,), 48, jnp.int32)


def treesum(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(x).astype(jnp.float32) for x in leaves)


def time_wall(g, *args):
    float(g(*args))
    iters = 10
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


def slope(f, perturb, *args, k1=1, k2=4):
    """Per-call device seconds of f via in-graph repetition slope.

    ``perturb(args, i)`` must return a variant of args with the same
    shapes but different values (prevents CSE across repeats)."""
    def make(K):
        def g(*a):
            acc = None
            for i in range(K):
                s = treesum(f(*perturb(a, i)))
                acc = s if acc is None else acc + s
            return acc
        return jax.jit(g)
    t1 = time_wall(make(k1), *args)
    t2 = time_wall(make(k2), *args)
    return (t2 - t1) / (k2 - k1)


def p_first_int(a, i):
    return (a[0] + i,) + tuple(a[1:])


def full_fn(s):
    return analyze_frames(s, cfg, hdr_bits)


def front_fn(samples):
    chans = jnp.transpose(samples, (0, 2, 1))
    mode = stereo.decorr_mode(chans[:, 0], chans[:, 1], B, 16)
    ch0, ch1, extra = stereo.apply_decorr(chans[:, 0], chans[:, 1], mode, 16)
    chans = jnp.stack([ch0, ch1], axis=1)
    chans, wb = wasted.remove_wasted_bits(chans, 16)
    obits = 16 + extra - wb
    return chans, wb, obits


def autocorr_dd_fn(chans):
    window = lpc_ops.welch_window(B)
    whi, wlo = lpc_ops.split_window_f32(window)
    return lpc_ops.autocorr_dd(chans, 12, jnp.asarray(whi), jnp.asarray(wlo))


def lev_quant_fn(autoc):
    lpc_rows, refs = lpc_ops.levinson_all_orders(autoc)
    qcoefs, shifts = lpc_ops.quantize_lpc_coefs(lpc_rows, 15)
    return qcoefs, shifts


def sweep_residual_fn(chans, qcoefs, shifts):
    max_o, CHUNK = 12, 6
    chans_b = chans[..., None, :]
    outs = []
    for lo in range(0, max_o, CHUNK):
        hi = min(lo + CHUNK, max_o)
        ords = np.arange(lo + 1, hi + 1)
        coef_c = qcoefs[..., jnp.asarray(ords) - 1, :]
        shift_c = jnp.take_along_axis(
            shifts, jnp.broadcast_to(jnp.asarray(ords) - 1,
                                     (F, 2, hi - lo)), axis=-1)
        o_arr = jnp.broadcast_to(jnp.asarray(ords, dtype=jnp.int32),
                                 (F, 2, hi - lo))
        outs.append(predict.residual_lpc_dynamic(
            chans_b, coef_c, shift_c, o_arr, hi, narrow=True))
    return outs


def sweep_rice_fn(r1, r2, obits):
    res_chunks = [r1, r2]
    max_o, CHUNK = 12, 6
    obits_b = obits[..., None]
    pieces = []
    for ci, lo in enumerate(range(0, max_o, CHUNK)):
        hi = min(lo + CHUNK, max_o)
        o_arr = jnp.broadcast_to(
            jnp.arange(lo + 1, hi + 1, dtype=jnp.int32), (F, 2, hi - lo))
        pieces.append(subframe_bits_dynamic(
            res_chunks[ci], B, o_arr, obits_b, 0, 6, 15, True))
    return jnp.concatenate(pieces, axis=-1)


def sweep_psums_fn(r1, r2):
    outs = []
    for res in (r1, r2):
        z32 = zigzag_u32(res)
        outs.append(_split_partition_sums(z32, 64, B // 64))
    return outs


def final_residual_fn(chans, qcoefs, shifts, order):
    row = (order - 1)[..., None]
    coefs = jnp.take_along_axis(
        qcoefs, row[..., None].clip(0, 11), axis=-2)[..., 0, :]
    shift = jnp.take_along_axis(shifts, row.clip(0, 11), axis=-1)[..., 0]
    return predict.residual_lpc_dynamic(chans, coefs, shift, order, 12,
                                        narrow=True)


def final_rice_fn(res, order):
    return calc_rice_params_dynamic(res, B, order, 0, 6)


def materialize(x):
    return jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a)), x)


chans, wb, obits = materialize(jax.jit(front_fn)(samples))
autoc = materialize(jax.jit(autocorr_dd_fn)(chans).astype(jnp.float64))
qcoefs, shifts = materialize(jax.jit(lev_quant_fn)(autoc))
r1, r2 = materialize(jax.jit(sweep_residual_fn)(chans, qcoefs, shifts))
order = jnp.full((F, 2), 8, jnp.int32)
res_final = materialize(jax.jit(final_residual_fn)(chans, qcoefs,
                                                   shifts, order))

out = {
    "full": slope(full_fn, p_first_int, samples),
    "front": slope(front_fn, p_first_int, samples),
    "autocorr_dd": slope(autocorr_dd_fn, p_first_int, chans),
    "lev_quant": slope(lev_quant_fn,
                       lambda a, i: (a[0] + jnp.float64(i),), autoc),
    "sweep_residual": slope(sweep_residual_fn, p_first_int,
                            chans, qcoefs, shifts),
    "sweep_rice": slope(sweep_rice_fn, p_first_int, r1, r2, obits),
    "sweep_psums": slope(sweep_psums_fn, p_first_int, r1, r2),
    "final_residual": slope(final_residual_fn, p_first_int,
                            chans, qcoefs, shifts, order),
    "final_rice_exact": slope(final_rice_fn, p_first_int,
                              res_final, order),
}
print(json.dumps({k + "_ms": round(v * 1e3, 3) for k, v in out.items()}))
