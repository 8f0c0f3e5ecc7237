"""Multi-host distributed encoding runner.

SURVEY §2.6: a FLAC stream needs almost nothing across hosts — frames
are self-contained, numbering derives from global offsets, and the only
shared state is per-shard byte lengths (ordered concatenation), the
global max frame size (STREAMINFO), and the sequential MD5 chain. This
module packages that protocol around the Encoder:

- :func:`shard_ranges` — frame-aligned split of a stream across hosts;
- :func:`encode_shard` — what each host runs locally (its frame span,
  with the correct global frame numbering, optionally mesh-sharded over
  its local chips);
- :func:`assemble` — rank-0 assembly from the gathered shard results;
- :func:`encode_stream_multihost` — the whole flow in one call, either
  in-process (n_hosts simulated shards — the test path) or with a
  caller-supplied ``allgather`` for a real ``jax.distributed`` job
  (e.g. ``jax.experimental.multihost_utils.process_allgather`` for the
  lengths/stats and a host-side object store or rank-ordered send for
  the frame bytes).

Output is byte-identical to single-host Encoder.encode_stream
(test_parallel_assembly, test_multihost_runner).
"""

from __future__ import annotations

import numpy as np

from flake_tpu import metadata
from flake_tpu import params as P
from flake_tpu.encoder import Encoder
from flake_tpu.parallel.assemble import ShardResult, chained_md5


def shard_ranges(n_samples: int, block_size: int,
                 n_hosts: int) -> list[tuple[int, int]]:
    """Frame-aligned [start, end) sample ranges per host: whole frames
    only (frames never reference other frames' samples), remainder and
    the final partial frame land on the last host."""
    n_frames = n_samples // block_size
    per = n_frames // n_hosts
    extra = n_frames % n_hosts
    ranges = []
    start = 0
    for r in range(n_hosts):
        f = per + (1 if r < extra else 0)
        end = start + f * block_size
        if r == n_hosts - 1:
            end = n_samples
        ranges.append((start, end))
        start = end
    return ranges


def encode_shard(pcm_local: np.ndarray, cfg: P.StreamConfig, rank: int,
                 start_sample: int, *, mesh=None,
                 batch_frames: int = 512,
                 lpc_dtype: str = "float64") -> ShardResult:
    """Encode one host's span. ``start_sample`` fixes the global frame
    numbering (frame index, or first-sample number in VBS streams,
    encode.c:970-975)."""
    enc = Encoder(cfg, batch_frames=batch_frames, lpc_dtype=lpc_dtype,
                  mesh=mesh)
    bs = cfg.params.block_size
    enc.frame_count = (start_sample if cfg.params.allow_vbs
                       else start_sample // bs)
    body = enc.encode(pcm_local, last=True)
    return ShardResult(
        rank=rank, frame_bytes=body,
        frame_lengths=np.array([len(body)], dtype=np.int64),
        n_samples=pcm_local.shape[0],
        max_frame_size=enc.max_frame_size)


def assemble(cfg: P.StreamConfig, shards: list[ShardResult],
             md5: bytes, *, vendor_string: str | None = None,
             vorbis_entries: list[str] | None = None) -> bytes:
    """Rank-0 assembly: header + rank-ordered frames + STREAMINFO
    rewrite with the global stats."""
    shards = sorted(shards, key=lambda s: s.rank)
    total = sum(s.n_samples for s in shards)
    gmax = max(s.max_frame_size for s in shards)

    enc = Encoder(cfg, vendor_string=vendor_string,
                  vorbis_entries=vorbis_entries)
    enc.sample_count = total
    blob = bytearray(enc.header())
    for s in shards:
        blob += s.frame_bytes
    si = enc.streaminfo()
    si.max_frame_size = max(gmax, si.max_frame_size)
    si.samples = total
    si.md5sum = md5
    blob[8:8 + 34] = metadata.write_streaminfo(si)
    return bytes(blob)


def encode_stream_multihost(pcm: np.ndarray, cfg: P.StreamConfig,
                            n_hosts: int, *, mesh=None,
                            batch_frames: int = 512,
                            lpc_dtype: str = "float64") -> bytes:
    """In-process simulation of the n-host flow (each shard encoded
    independently with only the protocol's cross-host state exchanged).
    In a real ``jax.distributed`` job, each process runs
    :func:`encode_shard` on its range and rank 0 runs :func:`assemble`
    after an allgather of (lengths, max_frame_size) and a rank-ordered
    byte gather; MD5 chains over the raw input in rank order."""
    pcm = np.asarray(pcm, dtype=np.int32).reshape(-1, cfg.channels)
    ranges = shard_ranges(pcm.shape[0], cfg.params.block_size, n_hosts)
    shards = []
    for rank, (lo, hi) in enumerate(ranges):
        shards.append(encode_shard(pcm[lo:hi], cfg, rank, lo, mesh=mesh,
                                   batch_frames=batch_frames,
                                   lpc_dtype=lpc_dtype))
    md5 = chained_md5([pcm[lo:hi] for lo, hi in ranges],
                      cfg.bits_per_sample)
    return assemble(cfg, shards, md5)
