"""Input-layer tests: container parsing, conversions, probing."""

import io
import struct

import numpy as np
import pytest

from flake_tpu.io import open_pcm, probe_format
from flake_tpu.io.convert import convert
from flake_tpu.io.wav import write_wave

from conftest import make_test_signal


def test_wave_roundtrip(tmp_path):
    for bps in (8, 16, 24, 32):
        pcm = make_test_signal(1000, 2, bps)
        p = tmp_path / f"t{bps}.wav"
        write_wave(p, pcm, 48000, bps)
        with open(p, "rb") as f:
            r = open_pcm(f)
            assert r.info.bits_per_sample == bps
            assert r.info.sample_rate == 48000
            np.testing.assert_array_equal(r.read_all(), pcm)


def test_probe_registry():
    assert probe_format(b"RIFF\x00\x00\x00\x00WAVE") == "wave"
    assert probe_format(b"FORM\x00\x00\x00\x00AIFF") == "aiff"
    assert probe_format(b"\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b"
                        b"\x0c") == "raw"


def test_aiff_parse():
    """Hand-built minimal AIFF with 80-bit extended sample rate."""
    n = 100
    pcm = make_test_signal(n, 1, 16)
    # 44100 as 80-bit extended: exp=16398, mantissa=0xAC44<<48
    ext = struct.pack(">HQ", 16398, 0xAC44 << 48)
    comm = struct.pack(">hIh", 1, n, 16) + ext
    data = pcm[:, 0].astype(">i2").tobytes()
    ssnd = struct.pack(">II", 0, 0) + data
    blob = (b"FORM" + struct.pack(">I", 4 + 8 + len(comm) + 8 + len(ssnd))
            + b"AIFF"
            + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    r = open_pcm(io.BytesIO(blob))
    assert r.info.format_name == "aiff"
    assert r.info.sample_rate == 44100
    assert r.info.channels == 1
    np.testing.assert_array_equal(r.read_all(), pcm)


def test_raw_fallback():
    pcm = make_test_signal(500, 2, 16)
    raw = pcm.reshape(-1).astype("<i2").tobytes()
    r = open_pcm(io.BytesIO(raw))
    assert r.info.format_name == "raw"
    np.testing.assert_array_equal(r.read_all(), pcm)


def test_float_wav(tmp_path):
    """IEEE-float WAVE input is scaled to the declared bit depth."""
    n = 200
    f32 = (np.sin(np.arange(n) * 0.1) * 0.5).astype("<f4")
    hdr = (b"RIFF" + struct.pack("<I", 36 + 4 * n) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 44100,
                                   44100 * 4, 4, 32)
           + b"data" + struct.pack("<I", 4 * n))
    r = open_pcm(io.BytesIO(hdr + f32.tobytes()))
    assert r.info.float_fmt
    out = r.read_all()
    # float path scales into the declared width's native range
    assert out.dtype == np.int32 and abs(out).max() > 1 << 28


def test_wave_extensible(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE with channel mask + valid bits."""
    n = 64
    pcm = make_test_signal(n, 2, 16)
    ext = struct.pack("<HHIH14s", 22, 16, 0x3, 1, b"\x00" * 14)
    fmt = struct.pack("<HHIIHH", 0xFFFE, 2, 44100, 44100 * 4, 4, 16) + ext
    data = pcm.reshape(-1).astype("<i2").tobytes()
    blob = (b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    r = open_pcm(io.BytesIO(blob))
    assert r.info.channel_mask == 0x3
    np.testing.assert_array_equal(r.read_all(), pcm)


def test_seek_samples(tmp_path):
    pcm = make_test_signal(1000, 2, 16)
    p = tmp_path / "seek.wav"
    write_wave(p, pcm, 44100, 16)
    with open(p, "rb") as f:
        r = open_pcm(f)
        r.seek_samples(300)
        np.testing.assert_array_equal(r.read_samples(100), pcm[300:400])
        assert r.position() == 400
        r.seek_samples(-50, whence=1)
        np.testing.assert_array_equal(r.read_samples(10), pcm[350:360])
        r.seek_samples(-100, whence=2)
        np.testing.assert_array_equal(r.read_samples(200), pcm[900:])


def test_seek_in_pipe_forward_only():
    pcm = make_test_signal(500, 2, 16)

    class Pipe:
        def __init__(self, data):
            self.data, self.pos = data, 0

        def read(self, n):
            out = self.data[self.pos:self.pos + n]
            self.pos += len(out)
            return out

    raw = pcm.reshape(-1).astype("<i2").tobytes()
    r = open_pcm(Pipe(raw))
    r.seek_samples(100)
    np.testing.assert_array_equal(r.read_samples(50), pcm[100:150])
    with np.testing.assert_raises(ValueError):
        r.seek_samples(0)


def test_vorbis_entries_in_header():
    from flake_tpu import params as P
    from flake_tpu.decoder import decode_stream
    from flake_tpu.encoder import Encoder

    pcm = make_test_signal(1000, 2, 16)
    cfg = P.StreamConfig(channels=2, sample_rate=44100,
                         bits_per_sample=16, params=P.set_defaults(2))
    cfg.params.block_size = 512
    enc = Encoder(cfg, vorbis_entries=["TITLE=test song",
                                       "ARTIST=flake-tpu"])
    blob = enc.encode_stream(pcm)
    dec = decode_stream(blob)
    assert dec.vorbis_entries == ["TITLE=test song", "ARTIST=flake-tpu"]
    assert enc.stats["frames"] > 0 and enc.stats["bytes_out"] > 0


def test_convert_matrix():
    s16 = np.array([-32768, -1, 0, 1, 32767], dtype=np.int32)
    # widening does not rescale (convert.c:142-167)
    np.testing.assert_array_equal(convert(s16, "s16", "s32"), s16)
    # narrowing truncates with arithmetic shift
    np.testing.assert_array_equal(convert(s16, "s16", "u8"),
                                  np.array([0, 127, 128, 128, 255],
                                           dtype=np.uint8))
    u8 = np.array([0, 127, 128, 255], dtype=np.uint8)
    np.testing.assert_array_equal(convert(u8, "u8", "s16"),
                                  np.array([-128, -1, 0, 127]))
    s24 = np.array([-(1 << 23), 1 << 23 - 1], dtype=np.int32)
    np.testing.assert_array_equal(convert(s24, "s24", "s16"),
                                  s24 >> 8)
