"""Native verifier helpers vs the pure-Python decoder loops."""

import numpy as np
import pytest

from flake_tpu import decoder
from flake_tpu import params as P
from flake_tpu.encoder import Encoder


@pytest.mark.parametrize("level,bps", [(2, 16), (8, 16), (8, 24),
                                       (11, 16)])
def test_native_decoder_matches_pure(level, bps):
    rng = np.random.default_rng(level * 31 + bps)
    n = 3 * 4608 + 777
    lim = (1 << (bps - 1)) - 1
    sig = (lim // 4 * np.sin(np.arange(n) * 0.01)).astype(np.int64)
    pcm = np.stack([sig + rng.integers(-lim // 16, lim // 16, n),
                    sig // 2], axis=1)
    pcm = np.clip(pcm, -lim, lim).astype(np.int32)
    cfg = P.StreamConfig(channels=2, sample_rate=44100,
                         bits_per_sample=bps, samples=n,
                         params=P.set_defaults(level))
    blob = Encoder(cfg, batch_frames=8).encode_stream(pcm)

    assert decoder.USE_NATIVE
    d_native = decoder.decode_stream(blob)
    try:
        decoder.USE_NATIVE = False
        d_pure = decoder.decode_stream(blob)
    finally:
        decoder.USE_NATIVE = True
    assert d_native.md5_ok and d_pure.md5_ok
    assert np.array_equal(d_native.samples, d_pure.samples)
    assert np.array_equal(d_native.samples, pcm)


def test_native_decoder_rejects_truncated():
    rng = np.random.default_rng(0)
    n = 4608
    pcm = rng.integers(-2000, 2000, size=(n, 2)).astype(np.int32)
    cfg = P.StreamConfig(channels=2, sample_rate=44100,
                         bits_per_sample=16, samples=n,
                         params=P.set_defaults(5))
    blob = Encoder(cfg, batch_frames=4).encode_stream(pcm)
    with pytest.raises(decoder.FlacDecodeError):
        decoder.decode_stream(blob[:len(blob) - 40])
