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
