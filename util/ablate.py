"""Marginal-cost ablation of the level-8 analysis pipeline.

Times the FULL fused analyze_frames with individual stages swapped for
shape-compatible cheap stand-ins, so each stage's cost is measured *in
context* (isolated stage timings mislead: XLA fuses across stages and
per-call dispatch overhead inflates small ops).

Run from repo root: ``python util/ablate.py``.
"""
import contextlib
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax, jax.numpy as jnp
import flake_tpu

flake_tpu._enable_compile_cache_if_tpu()
from flake_tpu import params as P
from flake_tpu.ops import frame as frame_mod
from flake_tpu.ops import lpc as lpc_ops, predict

F, B = 512, 4096
cfg = frame_mod.FrameConfig.from_params(P.set_defaults(8), channels=2,
                                        bps=16, block_size=B)

rng = np.random.default_rng(0)
t = np.arange(F * B)
sig = 12000 * np.sin(2 * np.pi * 440 * t / 44100) \
    + 800 * rng.standard_normal(F * B)
l = np.clip(sig, -32768, 32767).astype(np.int32)
r = np.clip(0.8 * sig, -32768, 32767).astype(np.int32)
samples = jnp.asarray(np.stack([l, r], -1).reshape(F, B, 2))
hdr_bits = jnp.full((F,), 48, jnp.int32)


def treesum(out):
    return sum(jnp.sum(x).astype(jnp.float32)
               for x in jax.tree_util.tree_leaves(out) if x is not None)


def timeit(fn):
    g = jax.jit(lambda s: treesum(fn(s)))
    float(g(samples))  # compile + real readback
    iters = 20
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            v = g(samples)
            acc = v if acc is None else acc + v
        float(acc)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / iters


@contextlib.contextmanager
def patched(mod, name, repl):
    orig = getattr(mod, name)
    setattr(mod, name, repl)
    try:
        yield
    finally:
        setattr(mod, name, orig)


def run(label, patches):
    with contextlib.ExitStack() as st:
        for mod, name, repl in patches:
            st.enter_context(patched(mod, name, repl))
        dt = timeit(lambda s: frame_mod.analyze_frames(s, cfg, hdr_bits))
    return label, dt


# --- cheap stand-ins (shape/dtype compatible, trivially cheap) -----------

def fake_autocorr_dd(x, max_order, whi, wlo, reduce="f64"):
    s = jnp.sum(x.astype(jnp.float32), axis=-1).astype(jnp.float64)
    base = jnp.abs(s) + 3.0
    scale = 1.0 / (1.0 + jnp.arange(max_order + 1, dtype=jnp.float64))
    return base[..., None] * scale + 2.0


def fake_levinson_all(autoc):
    max_order = autoc.shape[-1] - 1
    W = P.MAX_LPC_ORDER
    taps = jnp.arange(W)
    rows = jnp.where(
        taps < jnp.arange(1, max_order + 1)[:, None],
        (autoc[..., 1:, None] / autoc[..., :1, None]) * 0.3, 0.0)
    refs = jnp.clip(autoc[..., 1:] / autoc[..., :1], -0.9, 0.9)
    return rows, refs


def fake_quantize(lpc, precision):
    coefs = jnp.clip(jnp.round(lpc * 512.0), -16384, 16383) \
        .astype(jnp.int32)
    shifts = jnp.full(lpc.shape[:-1], 9, jnp.int32)
    return coefs, shifts


_real_res_dyn = predict.residual_lpc_dynamic


def fake_residual_sweep_only(smp, coefs, shift, order, max_order,
                             narrow=False):
    # cheap only for the sweep's chunked call (candidate axis present)
    if coefs.ndim >= 4:  # [F, C, chunk, taps] -> sweep call
        tgt = jnp.broadcast_to(
            smp, smp.shape[:-2] + (coefs.shape[-2], smp.shape[-1]))
        return tgt + order[..., None]
    return _real_res_dyn(smp, coefs, shift, order, max_order, narrow)


def fake_residual_final_only(smp, coefs, shift, order, max_order,
                             narrow=False):
    if coefs.ndim >= 4:
        return _real_res_dyn(smp, coefs, shift, order, max_order, narrow)
    return smp + order[..., None]


def fake_sb_dynamic(res, n, order, obits, pmin, pmax, precision, is_lpc):
    z = jnp.sum(res.astype(jnp.int32) & 0xFF, axis=-1)
    return (z + order * 64).astype(jnp.uint64)


_real_rc_dyn = frame_mod.calc_rice_params_dynamic


def fake_rc_dynamic(res, n, order, pmin, pmax, want_exact=True):
    pmax_static = 6
    batch = res.shape[:-1]
    z = jnp.sum(res.astype(jnp.int32) & 0xFF, axis=-1)
    return {
        "bits": z.astype(jnp.uint64),
        "porder": jnp.zeros(batch, jnp.int32),
        "method": jnp.zeros(batch, jnp.int32),
        "params": jnp.zeros(batch + (1 << pmax_static,), jnp.int32),
        "exact_rice_bits": z.astype(jnp.uint64) * 9,
    }


def rc_no_exact(res, n, order, pmin, pmax, want_exact=True):
    out = _real_rc_dyn(res, n, order, pmin, pmax, want_exact=False)
    out["exact_rice_bits"] = out["bits"]
    return out


from flake_tpu.ops import stereo, wasted  # noqa: E402


def fake_decorr_mode(left, right, n, bps=16):
    return jnp.full(left.shape[:-1], stereo.MID_SIDE, jnp.int32) \
        - (jnp.sum(left[..., :4], axis=-1) & 0).astype(jnp.int32)


def fake_remove_wasted(samples, bps):
    w = (jnp.sum(samples[..., :4], axis=-1) & 0).astype(jnp.int32)
    return samples, w


only = set(sys.argv[1:])
results = {}
for label, patches in [
    ("full", []),
    ("no_autocorr", [(lpc_ops, "autocorr_dd", fake_autocorr_dd)]),
    ("no_levinson", [(lpc_ops, "levinson_all_orders", fake_levinson_all)]),
    ("no_quantize", [(lpc_ops, "quantize_lpc_coefs", fake_quantize)]),
    ("no_sweep_residual",
     [(predict, "residual_lpc_dynamic", fake_residual_sweep_only)]),
    ("no_sweep_rice",
     [(frame_mod, "subframe_bits_dynamic", fake_sb_dynamic)]),
    ("no_final_residual",
     [(predict, "residual_lpc_dynamic", fake_residual_final_only)]),
    ("no_final_rice",
     [(frame_mod, "calc_rice_params_dynamic", fake_rc_dynamic)]),
    ("no_exact_bits",
     [(frame_mod, "calc_rice_params_dynamic", rc_no_exact)]),
    ("no_stereo_score", [(stereo, "decorr_mode", fake_decorr_mode)]),
    ("no_wasted", [(wasted, "remove_wasted_bits", fake_remove_wasted)]),
]:
    if only and label not in only and label != "full":
        continue
    lbl, dt = run(label, patches)
    results[lbl] = round(dt * 1e3, 3)
    print(f"{lbl:22s} {dt*1e3:8.3f} ms"
          + ("" if lbl == "full"
             else f"   marginal {1e3*(results['full']/1e3 - dt):+7.3f} ms"),
          flush=True)

tot_sec = F * B / 44100.0
results["xrt_full"] = round(tot_sec / (results["full"] / 1e3), 1)
print(json.dumps(results))
