"""Differential tests against the reference encoder binary.

If the reference ``flake`` binary is available (built out-of-tree into
.refbuild/), verify:

1. integer-only configurations (fixed prediction: levels 0-2) are
   *byte-identical* between the oracle and the reference binary — these
   paths share no floating point, so any deviation is a semantics bug;
2. our independent decoder losslessly decodes the reference binary's
   output at every level (cross-validates the decoder itself).

LPC levels are not byte-compared: the reference's double-precision
autocorrelation/Levinson ordering is compiler-dependent (e.g. FMA
contraction), so equally-valid streams may differ; lossless decode and
size proximity are asserted instead.
"""

import os
import pathlib
import subprocess

import numpy as np
import pytest

from flake_tpu import params as P
from flake_tpu.decoder import decode_stream
from flake_tpu.io.wav import write_wave
from flake_tpu.oracle.encoder import encode_stream

from conftest import make_test_signal

REF_BIN = pathlib.Path(__file__).resolve().parent.parent / ".refbuild" / "flake"

pytestmark = pytest.mark.skipif(not REF_BIN.exists(),
                                reason="reference flake binary not built")


def ref_encode(pcm, sample_rate, bps, level, tmpdir, extra_args=()):
    wav = os.path.join(tmpdir, "in.wav")
    out = os.path.join(tmpdir, "out.flac")
    write_wave(wav, pcm, sample_rate, bps)
    subprocess.run([str(REF_BIN), "-q", f"-{level}", *extra_args, wav,
                    "-o", out], check=True, capture_output=True)
    return pathlib.Path(out).read_bytes()


def oracle_encode(pcm, sample_rate, bps, level, **overrides):
    cfg = P.StreamConfig(channels=pcm.shape[1], sample_rate=sample_rate,
                         bits_per_sample=bps, params=P.set_defaults(level))
    for k, v in overrides.items():
        setattr(cfg.params, k, v)
    return encode_stream(pcm, cfg, vendor_string="Flake SVN")


@pytest.mark.parametrize("level", [0, 1, 2])
def test_fixed_levels_byte_identical(level, tmp_path):
    pcm = make_test_signal(10000, 2, 16, seed=level)
    ref = ref_encode(pcm, 44100, 16, level, str(tmp_path))
    ours = oracle_encode(pcm, 44100, 16, level)
    assert ref == ours


@pytest.mark.parametrize("kind", ["silence", "constant", "impulse", "noise"])
def test_fixed_byte_identical_signal_kinds(kind, tmp_path):
    pcm = make_test_signal(7000, 2, 16, kind=kind)
    ref = ref_encode(pcm, 44100, 16, 2, str(tmp_path))
    ours = oracle_encode(pcm, 44100, 16, 2)
    assert ref == ours


@pytest.mark.parametrize("channels", [1, 2, 4])
def test_fixed_byte_identical_channels(channels, tmp_path):
    pcm = make_test_signal(5000, channels, 16)
    ref = ref_encode(pcm, 44100, 16, 1, str(tmp_path))
    ours = oracle_encode(pcm, 44100, 16, 1)
    assert ref == ours


def test_fixed_byte_identical_wasted_bits(tmp_path):
    pcm = (make_test_signal(5000, 2, 16) >> 3) << 3
    ref = ref_encode(pcm, 44100, 16, 2, str(tmp_path))
    ours = oracle_encode(pcm, 44100, 16, 2)
    assert ref == ours


def test_verbatim_mode_byte_identical(tmp_path):
    pcm = make_test_signal(5000, 2, 16, kind="noise")
    ref = ref_encode(pcm, 44100, 16, 5, str(tmp_path),
                     extra_args=["-t", "0"])
    ours = oracle_encode(pcm, 44100, 16, 5,
                         prediction_type=int(P.Prediction.NONE))
    assert ref == ours


@pytest.mark.parametrize("level", list(range(13)))
def test_decoder_decodes_reference_output(level, tmp_path):
    pcm = make_test_signal(12000, 2, 16, seed=100 + level)
    ref = ref_encode(pcm, 44100, 16, level, str(tmp_path))
    dec = decode_stream(ref)
    assert dec.md5_ok
    np.testing.assert_array_equal(dec.samples, pcm)


@pytest.mark.parametrize("level", [5, 8, 11])
def test_lpc_levels_size_parity(level, tmp_path):
    """Oracle compression must track the reference closely (selection
    may differ by float rounding, size should not drift)."""
    pcm = make_test_signal(30000, 2, 16, seed=level)
    ref = ref_encode(pcm, 44100, 16, level, str(tmp_path))
    ours = oracle_encode(pcm, 44100, 16, level)
    assert abs(len(ours) - len(ref)) / len(ref) < 0.005
