"""Oracle encoder <-> independent decoder round-trip tests.

Strategy per SURVEY.md §4: golden-file differential testing via a full
decode (CRC-8/16 + MD5 verification, the same checks ``flac -t`` does),
across compression levels, signal types, bit depths and channel counts.
"""

import numpy as np
import pytest

from flake_tpu import params as P
from flake_tpu.decoder import decode_stream
from flake_tpu.oracle.encoder import encode_stream

from conftest import make_test_signal


def roundtrip(pcm, sample_rate=44100, bps=16, level=5, **overrides):
    cfg = P.StreamConfig(channels=pcm.shape[1], sample_rate=sample_rate,
                         bits_per_sample=bps,
                         params=P.set_defaults(level))
    for k, v in overrides.items():
        setattr(cfg.params, k, v)
    blob = encode_stream(pcm, cfg)
    dec = decode_stream(blob)
    assert dec.md5_ok
    np.testing.assert_array_equal(dec.samples, pcm)
    return blob, dec


@pytest.mark.parametrize("level", list(range(13)))
def test_all_levels_roundtrip(level):
    pcm = make_test_signal(10000, 2, 16, seed=level)
    blob, dec = roundtrip(pcm, level=level)
    # sanity: should actually compress tonal content
    assert len(blob) < pcm.nbytes


@pytest.mark.parametrize("kind", ["silence", "constant", "noise", "impulse"])
def test_signal_kinds(kind):
    pcm = make_test_signal(6000, 2, 16, kind=kind)
    roundtrip(pcm, level=5)


@pytest.mark.parametrize("channels", [1, 2, 3, 6, 8])
def test_channel_counts(channels):
    pcm = make_test_signal(4500, channels, 16)
    roundtrip(pcm, level=5)


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24])
def test_bit_depths(bps):
    pcm = make_test_signal(4500, 2, bps)
    roundtrip(pcm, bps=bps, level=5)


def test_hi_res_96k_24bit():
    pcm = make_test_signal(9999, 2, 24, kind="music")
    roundtrip(pcm, sample_rate=96000, bps=24, level=8)


@pytest.mark.parametrize("sr", [8000, 44100, 48000, 96000, 192000, 11025])
def test_sample_rates(sr):
    pcm = make_test_signal(3000, 2, 16)
    blob, dec = roundtrip(pcm, sample_rate=sr)
    assert dec.streaminfo.sample_rate == sr


@pytest.mark.parametrize("bs", [16, 192, 576, 1152, 4608, 100, 300, 4096])
def test_block_sizes(bs):
    pcm = make_test_signal(3 * bs + bs // 2, 2, 16)
    roundtrip(pcm, level=5, block_size=bs)


@pytest.mark.parametrize("omethod", list(range(7)))
def test_order_methods(omethod):
    pcm = make_test_signal(9000, 2, 16)
    roundtrip(pcm, level=6, order_method=omethod)


def test_prediction_none_verbatim():
    pcm = make_test_signal(5000, 2, 16, kind="noise")
    roundtrip(pcm, level=5, prediction_type=int(P.Prediction.NONE))


def test_partition_orders_full_range():
    pcm = make_test_signal(8192, 2, 16)
    roundtrip(pcm, level=5, block_size=4096,
              min_partition_order=0, max_partition_order=8)


def test_vbs_mixed_content():
    # transient content to trigger actual splits (vbs.c:36-83)
    rng = np.random.default_rng(7)
    n = 16384
    pcm = make_test_signal(n, 2, 16, kind="music")
    burst = np.clip(rng.standard_normal((2048, 2)) * 15000, -32768, 32767).astype(np.int32)
    pcm[5000:7048] = burst
    blob, dec = roundtrip(pcm, level=9)
    assert dec.frames > n // 4096  # at least one superblock split


def test_streaminfo_fields():
    pcm = make_test_signal(10000, 2, 16)
    blob, dec = roundtrip(pcm, level=5)
    si = dec.streaminfo
    assert si.channels == 2
    assert si.bits_per_sample == 16
    assert si.samples == 10000
    assert si.min_block_size == si.max_block_size == 4096


def test_vbs_streaminfo_min_block():
    pcm = make_test_signal(9000, 2, 16)
    blob, dec = roundtrip(pcm, level=9)
    assert dec.streaminfo.min_block_size == 16  # metadata.c:47-51


def test_last_frame_short():
    pcm = make_test_signal(4096 + 123, 2, 16)
    roundtrip(pcm, level=5)


def test_wasted_bits():
    pcm = make_test_signal(5000, 2, 16)
    pcm = (pcm >> 4) << 4  # force 4 wasted bits
    blob, dec = roundtrip(pcm, level=5)
    blob2, _ = roundtrip(make_test_signal(5000, 2, 16), level=5)
    assert len(blob) < len(blob2)  # wasted-bit removal must pay off
