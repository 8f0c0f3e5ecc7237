"""Parity tests for the Pallas candidate-order sweep kernel
(flake_tpu.ops.pallas_sweep), run in interpreter mode on the CPU mesh.

The kernel must be bit-exact against the XLA sweep: identical partition
limb sums for every candidate order, and identical bits_all (hence
identical order selection / encoded bytes) when wired into
analyze_frames.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from flake_tpu import params as P
from flake_tpu.ops import lpc as lpc_ops
from flake_tpu.ops import predict
from flake_tpu.ops.frame import FrameConfig, analyze_frames
from flake_tpu.ops.pallas_sweep import supports, sweep_partition_limbs
from flake_tpu.ops.rice import zigzag_u32

from conftest import make_test_signal


def test_supports_matrix():
    assert supports(4096, 16, 6)
    assert supports(8192, 16, 6)
    assert not supports(4096, 24, 6)      # wide samples
    assert not supports(4608, 16, 6)      # not lane-aligned
    assert not supports(512, 16, 6)       # psize too small
    assert not supports(4096, 16, 9)      # odd request; psize check


@pytest.mark.parametrize("B", [4096, 2048])
def test_limb_sums_match_residual_path(B):
    N, MAXO, pmax = 4, 12, 6
    pcm = make_test_signal(B, channels=N, seed=3)
    smp = jnp.asarray(pcm.T.copy())                      # [N, B]
    w = lpc_ops.welch_window(B)
    autoc = lpc_ops.autocorr(smp, MAXO, jnp.asarray(w), jnp.float64)
    rows, _ = lpc_ops.levinson_all_orders(autoc)
    qc, sh = lpc_ops.quantize_lpc_coefs(rows, 15)

    lo, hi = sweep_partition_limbs(smp, qc, sh, max_order=MAXO,
                                   pmax_static=pmax, interpret=True)
    lo, hi = np.asarray(lo), np.asarray(hi)

    psize = B >> pmax
    for o in range(1, MAXO + 1):
        order = jnp.full((N,), o, jnp.int32)
        r = predict.residual_lpc_dynamic(smp, qc[:, o - 1], sh[:, o - 1],
                                         order, MAXO, narrow=True)
        z = np.asarray(zigzag_u32(r)).astype(np.uint64)
        z[:, :o] = 0
        ref = z.reshape(N, 1 << pmax, psize).sum(-1)
        got = (lo[:, o - 1].astype(np.uint64)
               + (hi[:, o - 1].astype(np.uint64) << 16))
        assert np.array_equal(ref, got), f"order {o}"


def test_analyze_frames_identical_outputs():
    F, B = 3, 4096
    pcm = make_test_signal(F * B, channels=2, seed=5)
    samples = jnp.asarray(pcm.reshape(F, B, 2))
    hdr = jnp.full((F,), 48, jnp.int32)
    p = P.set_defaults(8)
    ref_cfg = FrameConfig.from_params(p, 2, 16, block_size=B,
                                      use_pallas="never")
    ker_cfg = FrameConfig.from_params(p, 2, 16, block_size=B,
                                      use_pallas="interp")
    o1 = analyze_frames(samples, ref_cfg, hdr)
    o2 = analyze_frames(samples, ker_cfg, hdr)
    for k in o1:
        if o1[k] is None:
            continue
        assert np.array_equal(np.asarray(o1[k]), np.asarray(o2[k])), k
