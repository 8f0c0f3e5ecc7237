"""Multi-shard stream assembly + checkpoint/resume tests.

Simulates the multi-host protocol in-process (SURVEY §2.6): shard the
stream by frame ranges, encode each shard with its own Encoder seeded at
the right global frame offset, assemble in rank order with the chained
MD5 — the result must be byte-identical to single-host encoding.
"""

import numpy as np

from flake_tpu import metadata
from flake_tpu import params as P
from flake_tpu.decoder import decode_stream
from flake_tpu.encoder import Encoder
from flake_tpu.parallel.assemble import (
    ShardResult,
    assemble_stream,
    chained_md5,
)

from conftest import make_test_signal


def _cfg(level=2, bs=512):
    cfg = P.StreamConfig(channels=2, sample_rate=44100,
                         bits_per_sample=16, params=P.set_defaults(level))
    cfg.params.block_size = bs
    return cfg


def test_sharded_assembly_matches_single_host():
    bs = 512
    n_shards = 4
    frames_per_shard = 3
    n = bs * frames_per_shard * n_shards
    pcm = make_test_signal(n, 2, 16)

    # single-host reference
    single = Encoder(_cfg(), batch_frames=4,
                     vendor_string="t").encode_stream(pcm)

    # sharded: each rank encodes its frame range with the right global
    # frame numbering
    shards = []
    pcm_shards = []
    for rank in range(n_shards):
        lo = rank * frames_per_shard * bs
        hi = lo + frames_per_shard * bs
        enc = Encoder(_cfg(), batch_frames=4, vendor_string="t")
        enc.frame_count = rank * frames_per_shard  # global frame offset
        body = enc.encode(pcm[lo:hi], last=True)
        shards.append(ShardResult(
            rank=rank, frame_bytes=body,
            frame_lengths=np.array([len(body)]),
            n_samples=hi - lo, max_frame_size=enc.max_frame_size))
        pcm_shards.append(pcm[lo:hi])

    md5 = chained_md5(pcm_shards, 16)

    header_enc = Encoder(_cfg(), batch_frames=4, vendor_string="t")
    header_enc.sample_count = n
    header = header_enc.header()

    def patch(gmax, total):
        si = header_enc.streaminfo()
        si.max_frame_size = gmax
        si.samples = total
        si.md5sum = md5
        return metadata.write_streaminfo(si)

    blob = assemble_stream(header, shards, patch)
    assert blob == single

    dec = decode_stream(blob)
    assert dec.md5_ok
    np.testing.assert_array_equal(dec.samples, pcm)


def test_checkpoint_resume_byte_identical():
    pcm = make_test_signal(4000, 2, 16)

    one = Encoder(_cfg(), batch_frames=4, vendor_string="t")
    one.sample_count = 4000
    full = one.encode(pcm, last=True)

    # encode half, snapshot, corrupt the original, resume from snapshot
    a = Encoder(_cfg(), batch_frames=4, vendor_string="t")
    a.sample_count = 4000
    part1 = a.encode(pcm[:2100])
    state = a.save_state()
    _ = a.encode(pcm[2100:2600])  # diverge past the snapshot

    b = Encoder(_cfg(), batch_frames=4, vendor_string="t")
    b.sample_count = 4000
    b.load_state(state)
    part2 = b.encode(pcm[2100:], last=True)

    assert part1 + part2 == full
    assert b.streaminfo().md5sum == one.streaminfo().md5sum
