"""Pallas bitstream merge/compact kernels vs the XLA formulation
(interpreter mode on CPU; the TPU runs the same Mosaic lowering)."""

import numpy as np
import pytest

import jax.numpy as jnp

from flake_tpu import params as P
from flake_tpu.ops import bitpack
from flake_tpu.ops.frame import FrameConfig, analyze_frames_jit


def _analyzed(level, n, F, seed, bps=16, loud=8000):
    rng = np.random.default_rng(seed)
    sig = rng.integers(-loud, loud, size=(F, n, 2)).astype(np.int32)
    sig[F // 2] = (loud // 4 * np.sin(np.arange(n) * 0.01)) \
        .astype(np.int32)[:, None]
    p = P.set_defaults(level)
    cfg = FrameConfig.from_params(p, 2, bps, block_size=n)
    nums = np.arange(F, dtype=np.uint32)
    hdr_bytes, hdr_nb = bitpack.frame_header_bytes(
        nums, bs_code=P.blocksize_code(n),
        sr_code=P.samplerate_code(44100), allow_vbs=0)
    hdr_bits = (hdr_nb * 8).astype(np.int32)
    an = analyze_frames_jit(jnp.asarray(sig), cfg,
                            jnp.asarray(hdr_bits))
    return an, cfg, hdr_bytes, hdr_nb


@pytest.mark.parametrize("level,n", [(2, 4096), (5, 4608), (8, 4096)])
def test_merge_kernel_matches_xla(level, n):
    an, cfg, hb, hn = _analyzed(level, n, 4, seed=level)
    w_xla, tb1, _ = bitpack.pack_frames_device(
        an, jnp.asarray(hb), jnp.asarray(hn), cfg, backend="xla")
    w_ker, tb2, _ = bitpack.pack_frames_device(
        an, jnp.asarray(hb), jnp.asarray(hn), cfg,
        backend="kernel_interp")
    assert np.array_equal(np.asarray(tb1), np.asarray(tb2))
    assert np.array_equal(np.asarray(w_xla), np.asarray(w_ker))


def test_merge_kernel_verbatim_and_24bit():
    # loud 24-bit noise: RICE2 params, long codes, verbatim fallback
    an, cfg, hb, hn = _analyzed(8, 4096, 4, seed=3, bps=24,
                                loud=1 << 23)
    w_xla, _, _ = bitpack.pack_frames_device(
        an, jnp.asarray(hb), jnp.asarray(hn), cfg, backend="xla")
    w_ker, _, _ = bitpack.pack_frames_device(
        an, jnp.asarray(hb), jnp.asarray(hn), cfg,
        backend="kernel_interp")
    assert np.array_equal(np.asarray(w_xla), np.asarray(w_ker))


def test_granule_gather_reassembles_frames():
    an, cfg, hb, hn = _analyzed(5, 4096, 5, seed=9)
    words, tb, _ = bitpack.pack_frames_device(
        an, jnp.asarray(hb), jnp.asarray(hn), cfg, backend="xla")
    fb = (np.asarray(tb) // 8).astype(np.int64)
    n_live = 4                       # treat the last frame as padding
    fb[n_live:] = 0
    GB = bitpack.GRANULE_BYTES
    wr = words.shape[1]
    gpf = -(-wr // 8)
    u = (fb[:n_live] + GB - 1) // GB
    src = np.concatenate([np.arange(f * gpf, f * gpf + u[f])
                          for f in range(n_live)]).astype(np.int32)
    idx = np.zeros(max(8, src.size), np.int32)
    idx[:src.size] = src
    gr = np.asarray(bitpack.gather_granules_jit(words,
                                                jnp.asarray(idx)))
    by = gr.reshape(idx.size, GB // 4).byteswap().view(np.uint8)
    goff = np.concatenate([[0], np.cumsum(u)]).astype(np.int64)
    got = np.concatenate([
        by[goff[f]:goff[f + 1]].reshape(-1)[:fb[f]]
        for f in range(n_live)])

    # reference: concatenate the per-frame byte views
    slots = np.asarray(bitpack.words_to_slot_bytes(words))
    want = np.concatenate([slots[f, :fb[f]] for f in range(n_live)])
    assert np.array_equal(got, want)
