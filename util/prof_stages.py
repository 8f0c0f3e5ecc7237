"""Attribute level-8 device time to pipeline stages (tunnel-safe timing).

Run from the repo root: ``python util/prof_stages.py``. Stage obits are
derived from the front-end outputs (bps + stereo extra - wasted bits) so
timings match analyze_frames exactly.
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
from flake_tpu.ops.rice import calc_rice_params_dynamic, subframe_bits_dynamic

F, B = 512, 4096
cfg = FrameConfig.from_params(P.set_defaults(8), channels=2, bps=16, block_size=B)

rng = np.random.default_rng(0)
t = np.arange(F * B)
sig = 12000 * np.sin(2 * np.pi * 440 * t / 44100) + 800 * rng.standard_normal(F * B)
l = np.clip(sig, -32768, 32767).astype(np.int32)
r = np.clip(0.8 * sig, -32768, 32767).astype(np.int32)
samples = jnp.asarray(np.stack([l, r], -1).reshape(F, B, 2))
hdr_bits = jnp.full((F,), 48, jnp.int32)
dtype = jnp.float64


def treesum(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(x).astype(jnp.float32) for x in leaves)


def timeit(f, *args):
    g = jax.jit(lambda *a: treesum(f(*a)))
    float(g(*args))  # compile + warm with real readback
    iters = 20
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            s = g(*args)
            acc = s if acc is None else acc + s
        float(acc)  # one sync
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / iters


def full_fn(s):
    return analyze_frames(s, cfg, hdr_bits)

def front_fn(samples):
    chans = jnp.transpose(samples, (0, 2, 1))
    mode = stereo.decorr_mode(chans[:, 0], chans[:, 1], B, 16)
    ch0, ch1, extra = stereo.apply_decorr(chans[:, 0], chans[:, 1], mode, 16)
    chans = jnp.stack([ch0, ch1], axis=1)
    chans, wb = wasted.remove_wasted_bits(chans, 16)
    obits = 16 + extra - wb  # int32 [F, 2], matches analyze_frames
    return chans, wb, obits

def lpc_fn(chans):
    window = lpc_ops.welch_window(B)
    autoc = lpc_ops.autocorr(chans, 12, jnp.asarray(window), dtype)
    lpc_rows, refs = lpc_ops.levinson_all_orders(autoc)
    qcoefs, shifts = lpc_ops.quantize_lpc_coefs(lpc_rows, 15)
    return qcoefs, shifts

def autocorr_fn(chans):
    window = lpc_ops.welch_window(B)
    return lpc_ops.autocorr(chans, 12, jnp.asarray(window), dtype)

def sweep_fn(chans, qcoefs, shifts, obits):
    max_o, CHUNK = 12, 6
    chans_b = chans[..., None, :]
    obits_b = obits[..., None]
    pieces = []
    for lo in range(0, max_o, CHUNK):
        hi = min(lo + CHUNK, max_o)
        ords = np.arange(lo + 1, hi + 1)
        coef_c = qcoefs[..., jnp.asarray(ords) - 1, :]
        shift_c = jnp.take_along_axis(
            shifts, jnp.broadcast_to(jnp.asarray(ords) - 1, (F, 2, hi - lo)), axis=-1)
        o_arr = jnp.broadcast_to(jnp.asarray(ords, dtype=jnp.int32), (F, 2, hi - lo))
        r = predict.residual_lpc_dynamic(chans_b, coef_c, shift_c, o_arr, hi, narrow=True)
        pieces.append(subframe_bits_dynamic(r, B, o_arr, obits_b, 0, 6, 15, True))
    return jnp.concatenate(pieces, axis=-1)

def final_fn(chans, qcoefs, shifts, order):
    row = (order - 1)[..., None]
    coefs = jnp.take_along_axis(qcoefs, row[..., None].clip(0, 11), axis=-2)[..., 0, :]
    shift = jnp.take_along_axis(shifts, row.clip(0, 11), axis=-1)[..., 0]
    res = predict.residual_lpc_dynamic(chans, coefs, shift, order, 12, narrow=True)
    rc = calc_rice_params_dynamic(res, B, order, 0, 6)
    return res, rc["exact_rice_bits"], rc["params"]


full = timeit(full_fn, samples)
chans, wb, obits = jax.jit(front_fn)(samples)
chans = jnp.asarray(np.asarray(chans))  # materialize as plain input
obits = jnp.asarray(np.asarray(obits))
front = timeit(front_fn, samples)
qcoefs, shifts = [jnp.asarray(np.asarray(x)) for x in jax.jit(lpc_fn)(chans)]
lpc_t = timeit(lpc_fn, chans)
ac_t = timeit(autocorr_fn, chans)
sweep_t = timeit(sweep_fn, chans, qcoefs, shifts, obits)
order = jnp.full((F, 2), 8, jnp.int32)
final_t = timeit(final_fn, chans, qcoefs, shifts, order)

tot_sec = F * B / 44100.0
print(json.dumps({
    "full_ms": round(full * 1e3, 3), "front_ms": round(front * 1e3, 3),
    "lpc_ms": round(lpc_t * 1e3, 3), "autocorr_ms": round(ac_t * 1e3, 3),
    "sweep_ms": round(sweep_t * 1e3, 3), "final_ms": round(final_t * 1e3, 3),
    "sum_stages_ms": round((front + lpc_t + sweep_t + final_t) * 1e3, 3),
    "xrt_full": round(tot_sec / full, 1),
}))
