"""Distributed stream assembly: ordered frame gather, global statistics,
and the chained MD5 across shards.

SURVEY §2.6: the only cross-shard state a FLAC stream needs is
  1. nothing for the frames themselves (self-contained; numbering from
     global offsets),
  2. global max_frame_size for STREAMINFO (all-reduce max),
  3. byte offsets for the ordered concatenation (exclusive scan of
     per-frame lengths in shard-rank order),
  4. the stream MD5, a strictly sequential chain over raw input bytes —
     carried host-side across shard boundaries in rank order.

This module implements the host-side protocol; it is exercised in-tests
by simulating multiple shards in one process (the on-wire exchanges are
a trivial allgather of ints plus passing 92 bytes of MD5 state).
"""

from __future__ import annotations

import dataclasses
import hashlib

import numpy as np


@dataclasses.dataclass
class ShardResult:
    """What each shard contributes to assembly."""

    rank: int
    frame_bytes: bytes          # concatenated frames, shard-local order
    frame_lengths: np.ndarray   # [frames_in_shard]
    n_samples: int              # samples consumed by this shard
    max_frame_size: int


def exclusive_offsets(lengths_per_shard: list[np.ndarray]) -> list[int]:
    """Byte offset of each shard's first frame in the final stream
    (after the header)."""
    offsets = []
    acc = 0
    for lens in lengths_per_shard:
        offsets.append(acc)
        acc += int(lens.sum())
    return offsets


def chained_md5(pcm_shards: list[np.ndarray], bps: int) -> bytes:
    """Sequential MD5 over shard-ordered raw sample bytes
    (md5.c:281-320 semantics: little-endian, (bps+7)/8 bytes/sample)."""
    h = hashlib.md5()
    bytes_per_sample = (bps + 7) >> 3
    for pcm in pcm_shards:
        flat = np.ascontiguousarray(pcm.reshape(-1).astype("<i4"))
        raw = flat.view(np.uint8).reshape(-1, 4)[:, :bytes_per_sample]
        h.update(np.ascontiguousarray(raw).tobytes())
    return h.digest()


def assemble_stream(header: bytes, shards: list[ShardResult],
                    streaminfo_patch) -> bytes:
    """Concatenate shard outputs in rank order and patch STREAMINFO.

    ``streaminfo_patch(max_frame_size, total_samples) -> bytes`` builds
    the final 34-byte STREAMINFO body (the caller owns MD5/metadata)."""
    shards = sorted(shards, key=lambda s: s.rank)
    out = bytearray(header)
    for s in shards:
        out += s.frame_bytes
    gmax = max(s.max_frame_size for s in shards)
    total = sum(s.n_samples for s in shards)
    out[8:8 + 34] = streaminfo_patch(gmax, total)
    return bytes(out)
