"""v3 sweep kernel (streams-along-lanes): exactness + 4608 coverage.

VERDICT r2 item 4 asked for a sweep kernel that covers the
Subset-standard 4608 block; v3's sublane partition tiling does (psize
72 = 9 sublanes), validated here in interpreter mode against the XLA
partition sums and through the full analyze_frames pipeline.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from flake_tpu import params as P
from flake_tpu.ops import lpc as lpc_ops, predict
from flake_tpu.ops.frame import FrameConfig, analyze_frames_jit
from flake_tpu.ops.pallas_sweep3 import supports, sweep_partition_limbs3
from flake_tpu.ops.rice import limit_max_partition_order, zigzag_u32


def test_supports_table():
    assert supports(4096, 16, 6, 12)
    assert supports(4608, 16, 6, 12)      # psize 72: v2 could not
    assert supports(4608, 16, 6, 32)
    assert not supports(256, 16, 6, 12)   # psize 4 < 8
    assert not supports(4096, 24, 6, 12)  # wide samples


@pytest.mark.parametrize("B", [4096, 4608])
def test_limb_sums_exact(B):
    max_o, pmax_static = 12, limit_max_partition_order(6, B, 1)
    N = 6
    rng = np.random.default_rng(B)
    x = np.clip(rng.normal(0, 6000, (N, B)), -65536, 65535) \
        .astype(np.int32)
    w = lpc_ops.welch_window(B)
    whi, wlo = lpc_ops.split_window_f32(w)
    autoc = lpc_ops.autocorr_dd(jnp.asarray(x), max_o, jnp.asarray(whi),
                                jnp.asarray(wlo)).astype(jnp.float64)
    rows, _ = lpc_ops.levinson_all_orders(autoc)
    qc, sh = lpc_ops.quantize_lpc_coefs(rows, 15)

    lo, hi = sweep_partition_limbs3(
        jnp.asarray(x), qc, sh, max_order=max_o,
        pmax_static=pmax_static, interpret=True)
    lo, hi = np.asarray(lo), np.asarray(hi)

    parts = 1 << pmax_static
    psize = B >> pmax_static
    idx = jnp.arange(B)
    for o in (1, 7, 12):
        r = predict.residual_lpc(jnp.asarray(x), qc[:, o - 1, :],
                                 sh[:, o - 1], o, narrow=True)
        z = jnp.where(idx >= o, zigzag_u32(r), jnp.uint32(0))
        zlo = (z & jnp.uint32(0xFFFF)).astype(jnp.int32)
        zhi = (z >> jnp.uint32(16)).astype(jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(zlo.reshape(N, parts, psize).sum(-1)),
            lo[:, o - 1])
        np.testing.assert_array_equal(
            np.asarray(zhi.reshape(N, parts, psize).sum(-1)),
            hi[:, o - 1])


def test_pipeline_4608_kernel_matches_xla():
    B, F = 4608, 3
    rng = np.random.default_rng(9)
    t = np.arange(F * B)
    sig = (8000 * np.sin(2 * np.pi * 260 * t / 44100)
           + 700 * rng.standard_normal(F * B))
    l = np.clip(sig, -32768, 32767).astype(np.int32)
    r = np.clip(0.6 * sig, -32768, 32767).astype(np.int32)
    samples = jnp.asarray(np.stack([l, r], -1).reshape(F, B, 2))
    hdr = jnp.full((F,), 48, jnp.int32)
    base = FrameConfig.from_params(P.set_defaults(8), channels=2,
                                   bps=16, block_size=B)
    out_k = analyze_frames_jit(
        samples, dataclasses.replace(base, use_pallas="interp"), hdr)
    out_x = analyze_frames_jit(
        samples, dataclasses.replace(base, use_pallas="never"), hdr)
    for key in ("order", "porder", "method", "rice_params",
                "frame_bytes", "residual"):
        np.testing.assert_array_equal(np.asarray(out_k[key]),
                                      np.asarray(out_x[key]), key)
