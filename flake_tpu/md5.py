"""State-portable MD5 chain.

The FLAC stream MD5 (reference md5.c:281-320) is a strictly sequential
chain over raw little-endian sample bytes. For multi-host encoding the
chain state must travel between processes in rank order (SURVEY §2.6
item 4) — hashlib cannot export its state, so this class keeps the MD5
(state, count, pending-tail) triple in plain Python/numpy with the block
compress in the native runtime, making the chain serializable,
resumable, and ring-passable as 88 opaque bytes.
"""

from __future__ import annotations

import numpy as np

_INIT = np.array([0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476],
                 dtype=np.uint32)


class Md5Chain:
    """Incremental MD5 whose state can be exported/imported."""

    def __init__(self):
        self._state = _INIT.copy()
        self._count = 0          # total message bytes so far
        self._pending = b""     # < 64 bytes awaiting a full block

    # -- hashing -----------------------------------------------------------

    def update(self, data: bytes | np.ndarray) -> None:
        from flake_tpu.native import get_lib

        if isinstance(data, np.ndarray):
            data = data.tobytes()
        if not data:
            return
        self._count += len(data)
        buf = self._pending + data
        nblocks = len(buf) // 64
        if nblocks:
            arr = np.frombuffer(buf[:nblocks * 64], dtype=np.uint8)
            get_lib().flake_md5_blocks(self._state,
                                       np.ascontiguousarray(arr),
                                       nblocks)
        self._pending = buf[nblocks * 64:]

    def digest(self) -> bytes:
        """Final digest (does not consume the chain: copy first)."""
        from flake_tpu.native import get_lib

        state = self._state.copy()
        # RFC 1321 padding: 0x80, zeros, 64-bit LE bit length
        bitlen = (self._count * 8) & 0xFFFFFFFFFFFFFFFF
        pad_len = (55 - self._count) % 64
        tail = (self._pending + b"\x80" + b"\x00" * pad_len
                + bitlen.to_bytes(8, "little"))
        arr = np.frombuffer(tail, dtype=np.uint8)
        get_lib().flake_md5_blocks(state, np.ascontiguousarray(arr),
                                   len(tail) // 64)
        return state.tobytes()

    def hexdigest(self) -> str:
        return self.digest().hex()

    # -- state portability ---------------------------------------------------

    def export_state(self) -> bytes:
        """Fixed 88-byte blob: 16B state + 8B count + 1B tail_len +
        63B tail (zero-padded)."""
        tail = self._pending
        return (self._state.tobytes()
                + self._count.to_bytes(8, "little")
                + bytes([len(tail)]) + tail.ljust(63, b"\x00"))

    @classmethod
    def import_state(cls, blob: bytes) -> "Md5Chain":
        if len(blob) != 88:
            raise ValueError("bad md5 state blob")
        h = cls.__new__(cls)
        h._state = np.frombuffer(blob[:16], dtype=np.uint32).copy()
        h._count = int.from_bytes(blob[16:24], "little")
        tail_len = blob[24]
        h._pending = blob[25:25 + tail_len]
        return h

    def copy(self) -> "Md5Chain":
        return Md5Chain.import_state(self.export_state())


def pcm_md5_bytes(pcm: np.ndarray, bps: int) -> bytes:
    """Raw sample bytes as the FLAC MD5 consumes them: interleaved,
    little-endian, (bps+7)/8 bytes per sample (md5 semantics of
    reference encode.c / md5.c)."""
    bytes_per_sample = (bps + 7) >> 3
    flat = np.ascontiguousarray(pcm.reshape(-1).astype("<i4"))
    raw = flat.view(np.uint8).reshape(-1, 4)[:, :bytes_per_sample]
    return np.ascontiguousarray(raw).tobytes()
