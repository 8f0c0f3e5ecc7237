"""Slope-attribute the CURRENT level-8 analysis pipeline (round 5).

Stages mirror analyze_frames' LPC path exactly (frame.py:340-471):
  autocorr   pallas_autocorr.autocorr_dd_pallas (+2.0)
  schur_lev  schur_refs/levinson (per order method) + quantize
  sweep      pallas_sweep3 limbs + subframe_bits_from_limbs + select
  finals     residual_lpc_dynamic + calc_rice_params_dynamic
  full       analyze_frames end to end

Run from repo root: python util/prof_an5.py [level]
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import flake_tpu
flake_tpu._enable_compile_cache_if_tpu()
from flake_tpu import params as P
from flake_tpu.ops.frame import FrameConfig, analyze_frames, select_order
from flake_tpu.ops import lpc as lpc_ops, predict
from flake_tpu.ops import pallas_autocorr, pallas_sweep3
from flake_tpu.ops.rice import (calc_rice_params_dynamic,
                                subframe_bits_from_limbs,
                                limit_max_partition_order)

LEVEL = int(sys.argv[1]) if len(sys.argv) > 1 else 8
F, B, C, bps = 512, 4096, 2, 16
p = P.set_defaults(LEVEL)
cfg = FrameConfig.from_params(p, C, bps, block_size=B)
B = cfg.block_size if cfg.block_size else B
max_o = cfg.max_prediction_order
N = F * C

rng = np.random.default_rng(0)
t = np.arange(F * B)
sig = 12000 * np.sin(2 * np.pi * 440 * t / 44100) \
    + 800 * rng.standard_normal(F * B)
l = np.clip(sig, -32768, 32767).astype(np.int32)
r = np.clip(0.8 * sig, -32768, 32767).astype(np.int32)
samples = jnp.asarray(np.stack([l, r], -1).reshape(F, B, C))
hdr_bits = jnp.full((F,), 48, jnp.int32)

window = lpc_ops.welch_window(B)
whi, wlo = lpc_ops.split_window_f32(window)
whi = jnp.asarray(whi)
wlo = jnp.asarray(wlo)
pmin, pmax = cfg.min_partition_order, cfg.max_partition_order
pmax_static = limit_max_partition_order(pmax, B, 1)


def treesum(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)


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


def p_int(a, i):
    return (a[0] + i,) + tuple(a[1:])


def p_none(a, i):
    return (a[0] + jnp.float64(i) if a[0].dtype == jnp.float64
            else a[0] + i,) + tuple(a[1:])


# stage inputs (materialized once)
cN = jnp.transpose(samples, (0, 2, 1)).reshape(N, B)
obitsN = jnp.full((N,), 17, jnp.int32)  # post-decorr typical

autoc = pallas_autocorr.autocorr_dd_pallas(cN, whi, wlo,
                                           max_order=max_o) + 2.0
if cfg.order_method == P.OrderMethod.EST:
    refs = lpc_ops.schur_refs(autoc)
    lpc_rows = lpc_ops.levinson_from_refs(refs)
else:
    lpc_rows, refs = lpc_ops.levinson_all_orders(autoc)
qcoefs, shifts = lpc_ops.quantize_lpc_coefs(lpc_rows, cfg.precision)
qcoefs = jnp.asarray(np.asarray(qcoefs))
shifts = jnp.asarray(np.asarray(shifts))
autoc = jnp.asarray(np.asarray(autoc))
refsc = jnp.asarray(np.asarray(refs))

res = {"level": LEVEL, "B": B, "max_o": max_o,
       "order_method": int(cfg.order_method)}

res["autocorr_ms"] = round(slope(
    lambda x: (pallas_autocorr.autocorr_dd_pallas(
        x, whi, wlo, max_order=max_o),), p_int, cN) * 1e3, 3)


def schur_lev(a):
    if cfg.order_method == P.OrderMethod.EST:
        rf = lpc_ops.schur_refs(a)
        rows = lpc_ops.levinson_from_refs(rf)
    else:
        rows, rf = lpc_ops.levinson_all_orders(a)
    qc, sh = lpc_ops.quantize_lpc_coefs(rows, cfg.precision)
    return qc, sh, rf


res["schur_lev_quant_ms"] = round(slope(
    schur_lev, p_none, autoc) * 1e3, 3)

need_bits = cfg.order_method not in (P.OrderMethod.MAX,
                                     P.OrderMethod.EST)
if need_bits and pallas_sweep3.supports(B, bps, pmax_static, max_o):
    def sweep(x, qc, sh):
        lo, hi = pallas_sweep3.sweep_partition_limbs3(
            x, qc, sh, max_order=max_o, pmax_static=pmax_static)
        o_arr = jnp.broadcast_to(
            jnp.arange(1, max_o + 1, dtype=jnp.int32), (N, max_o))
        bits_all = subframe_bits_from_limbs(
            lo, hi, B, o_arr, obitsN[..., None], pmin, pmax,
            cfg.precision, True)
        return (bits_all,)

    res["sweep_bits_ms"] = round(slope(
        sweep, p_int, cN, qcoefs, shifts) * 1e3, 3)

    def sweep_kernel_only(x, qc, sh):
        return pallas_sweep3.sweep_partition_limbs3(
            x, qc, sh, max_order=max_o, pmax_static=pmax_static)

    res["sweep_kernel_ms"] = round(slope(
        sweep_kernel_only, p_int, cN, qcoefs, shifts) * 1e3, 3)


def finals(x, qc, sh, rf):
    bits_all = None
    if need_bits:
        lo, hi = pallas_sweep3.sweep_partition_limbs3(
            x, qc, sh, max_order=max_o, pmax_static=pmax_static)
        o_arr = jnp.broadcast_to(
            jnp.arange(1, max_o + 1, dtype=jnp.int32), (N, max_o))
        bits_all = subframe_bits_from_limbs(
            lo, hi, B, o_arr, obitsN[..., None], pmin, pmax,
            cfg.precision, True)
    order = select_order(cfg, bits_all, rf, (N,))
    row = (order - 1)[..., None]
    coefs = jnp.take_along_axis(
        qc, row[..., None].clip(0, max_o - 1), axis=-2)[..., 0, :]
    shift = jnp.take_along_axis(sh, row.clip(0, max_o - 1),
                                axis=-1)[..., 0]
    r = predict.residual_lpc_dynamic(x, coefs, shift, order, max_o,
                                     narrow=bps <= 16)
    rc = calc_rice_params_dynamic(r, B, order, pmin, pmax)
    return r, rc["porder"], rc["params"]


def finals_only(x, qc, sh, rf, order):
    row = (order - 1)[..., None]
    coefs = jnp.take_along_axis(
        qc, row[..., None].clip(0, max_o - 1), axis=-2)[..., 0, :]
    shift = jnp.take_along_axis(sh, row.clip(0, max_o - 1),
                                axis=-1)[..., 0]
    r = predict.residual_lpc_dynamic(x, coefs, shift, order, max_o,
                                     narrow=bps <= 16)
    rc = calc_rice_params_dynamic(r, B, order, pmin, pmax)
    return r, rc["porder"], rc["params"]


order0 = jnp.full((N,), max_o, jnp.int32)
res["final_res_rice_ms"] = round(slope(
    finals_only, p_int, cN, qcoefs, shifts, refsc, order0) * 1e3, 3)

res["full_ms"] = round(slope(
    lambda s: analyze_frames(s, cfg, hdr_bits), p_int,
    samples) * 1e3, 3)
print(json.dumps(res))
