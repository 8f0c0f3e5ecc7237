"""The packaged multi-host runner must reproduce single-host bytes
exactly: frame-aligned sharding, global frame numbering, chained MD5,
rank-ordered assembly (SURVEY §2.6), with and without a per-host chip
mesh."""

import numpy as np
import pytest

import jax

from flake_tpu import params as P
from flake_tpu.decoder import decode_stream
from flake_tpu.encoder import Encoder
from flake_tpu.parallel.mesh import make_mesh
from flake_tpu.parallel.runner import (
    encode_stream_multihost,
    shard_ranges,
)

from conftest import make_test_signal


def _cfg(level=5, bs=512):
    p = P.set_defaults(level)
    p.block_size = bs
    return P.StreamConfig(channels=2, sample_rate=44100,
                          bits_per_sample=16, params=p)


def test_shard_ranges_frame_aligned():
    r = shard_ranges(10 * 512 + 100, 512, 3)
    assert r == [(0, 4 * 512), (4 * 512, 7 * 512), (7 * 512, 5220)]
    assert all((b - a) % 512 == 0 for a, b in r[:-1])


@pytest.mark.parametrize("n_hosts", [1, 3])
def test_multihost_matches_single(n_hosts):
    cfg = _cfg()
    pcm = make_test_signal(512 * 9 + 130, 2, 16, seed=11)
    single = Encoder(cfg, batch_frames=4).encode_stream(pcm)
    multi = encode_stream_multihost(pcm, cfg, n_hosts, batch_frames=4)
    assert multi == single
    dec = decode_stream(multi)
    assert dec.md5_ok
    np.testing.assert_array_equal(dec.samples, pcm)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the virtual 8-device mesh")
def test_multihost_with_local_mesh_matches_single():
    """2 simulated hosts, each analyzing over a 4-chip dp mesh."""
    cfg = _cfg()
    pcm = make_test_signal(512 * 8, 2, 16, seed=12)
    single = Encoder(cfg, batch_frames=4).encode_stream(pcm)
    mesh = make_mesh(4)
    multi = encode_stream_multihost(pcm, cfg, 2, mesh=mesh,
                                    batch_frames=4)
    assert multi == single
