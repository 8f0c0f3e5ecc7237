"""Fine-grained attribution inside the level-8 sweep + final stages.

Run from the repo root: ``python util/prof_sweep.py``. Complements
util/prof_stages.py: breaks the candidate-order sweep into residual vs
rice-search cost, and the final pass into residual / porder-scan /
exact-bits cost, so perf work can target the real dominator.
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


def timeit(f, *args):
    g = jax.jit(lambda *a: treesum(f(*a)))
    float(g(*args))
    iters = 20
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


def materialize(x):
    return jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a)), x)


def front_fn(samples):
    chans = jnp.transpose(samples, (0, 2, 1))
    mode = stereo.decorr_mode(chans[:, 0], chans[:, 1], B, 16)
    ch0, ch1, extra = stereo.apply_decorr(chans[:, 0], chans[:, 1], mode, 16)
    chans = jnp.stack([ch0, ch1], axis=1)
    chans, wb = wasted.remove_wasted_bits(chans, 16)
    obits = 16 + extra - wb
    return chans, wb, obits


def lpc_fn(chans):
    window = lpc_ops.welch_window(B)
    whi, wlo = lpc_ops.split_window_f32(window)
    autoc = lpc_ops.autocorr_dd(chans, 12, jnp.asarray(whi),
                                jnp.asarray(wlo)).astype(jnp.float64)
    lpc_rows, refs = lpc_ops.levinson_all_orders(autoc)
    qcoefs, shifts = lpc_ops.quantize_lpc_coefs(lpc_rows, 15)
    return qcoefs, shifts


def autocorr_dd_fn(chans):
    window = lpc_ops.welch_window(B)
    whi, wlo = lpc_ops.split_window_f32(window)
    return lpc_ops.autocorr_dd(chans, 12, jnp.asarray(whi), jnp.asarray(wlo))


def sweep_residual_fn(chans, qcoefs, shifts):
    """Residual computation alone for all 12 candidate orders."""
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


def sweep_rice_fn(res_chunks, obits):
    """subframe_bits_dynamic alone on precomputed sweep residuals."""
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


def sweep_psums_fn(res_chunks):
    """Partition limb sums alone (the O(B) part of the rice search)."""
    outs = []
    for res in res_chunks:
        z32 = zigzag_u32(res)
        order64 = jnp.zeros(res.shape[:-1] + (1,), jnp.int64)
        idx = jnp.arange(B)
        z32 = jnp.where(idx >= order64, z32, jnp.uint32(0))
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


def final_rice_noexact_fn(res, order):
    return calc_rice_params_dynamic(res, B, order, 0, 6, want_exact=False)


chans, wb, obits = materialize(jax.jit(front_fn)(samples))
qcoefs, shifts = materialize(jax.jit(lpc_fn)(chans))
res_chunks = materialize(jax.jit(sweep_residual_fn)(chans, qcoefs, shifts))
order = jnp.full((F, 2), 8, jnp.int32)
res_final = materialize(jax.jit(final_residual_fn)(chans, qcoefs,
                                                   shifts, order))

out = {
    "front_ms": timeit(front_fn, samples),
    "autocorr_dd_ms": timeit(autocorr_dd_fn, chans),
    "lpc_full_ms": timeit(lpc_fn, chans),
    "sweep_residual_ms": timeit(sweep_residual_fn, chans, qcoefs, shifts),
    "sweep_rice_ms": timeit(sweep_rice_fn, res_chunks, obits),
    "sweep_psums_ms": timeit(sweep_psums_fn, res_chunks),
    "final_residual_ms": timeit(final_residual_fn, chans, qcoefs, shifts,
                                order),
    "final_rice_exact_ms": timeit(final_rice_fn, res_final, order),
    "final_rice_noexact_ms": timeit(final_rice_noexact_fn, res_final,
                                    order),
}
print(json.dumps({k: round(v * 1e3, 3) for k, v in out.items()}))
