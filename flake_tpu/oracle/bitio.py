"""MSB-first bit writer with bounded-buffer semantics.

Behavioural mirror of the reference BitWriter (libflake/bitio.h:33-141):
same count/flush/eof semantics so the oracle encoder reproduces the
reference's verbatim-fallback decisions exactly.
"""

from __future__ import annotations


class BitWriter:
    """MSB-first bit packer writing into a bounded byte buffer."""

    def __init__(self, size: int):
        self.buf = bytearray()
        self.size = max(size, 0)
        self.acc = 0          # bit accumulator (value of pending bits)
        self.nacc = 0         # number of pending bits (< 8 after _drain)
        self.eof = False

    def count(self) -> int:
        """Bytes written so far, counting a partial byte as one
        (bitio.h:55-59)."""
        return len(self.buf) + ((self.nacc + 7) >> 3)

    def writebits(self, bits: int, val: int) -> None:
        """Write ``bits`` bits of ``val`` (bitio.h:83-111).

        Mirrors the reference's early-out: nothing is written once the
        buffer is within 4 bytes of full (the 32-bit store guard at
        bitio.h:90-93), which is what flags oversized frames.
        """
        assert 0 <= bits <= 32
        assert bits == 32 or 0 <= val < (1 << bits), (bits, val)
        if bits == 0 or self.eof:
            return
        if len(self.buf) >= self.size - 3:
            self.eof = True
            return
        self.acc = ((self.acc << bits) | val) & 0xFFFFFFFFFFFFFFFF
        self.nacc += bits
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)

    def writebits_signed(self, bits: int, val: int) -> None:
        """Two's-complement write (bitio.h:113-118); fields up to 33
        bits (bps-32 stereo side channel) split into two stores."""
        assert 0 <= bits <= 33
        if bits > 32:
            self.writebits(bits - 16, (val >> 16) & ((1 << (bits - 16)) - 1))
            self.writebits(16, val & 0xFFFF)
        else:
            self.writebits(bits, val & ((1 << bits) - 1))

    def write_rice_signed(self, k: int, val: int) -> None:
        """Zigzag + unary quotient + k-bit remainder (bitio.h:120-141)."""
        if k < 0:
            return
        # signed -> unsigned zigzag: v = -2*val-1; v ^= v>>31
        v = -2 * val - 1
        if v < 0:
            v = ~v  # v ^ -1 for negative v (arithmetic shift semantics)
        q = (v >> k) + 1
        while q > 31:
            self.writebits(31, 0)
            q -= 31
        self.writebits(q, 1)
        self.writebits(k, v & ((1 << k) - 1))

    def flush(self) -> None:
        """Pad to a byte boundary with zero bits (bitio.h:61-81)."""
        if self.eof:
            return
        if self.nacc > 0:
            pad = 8 - self.nacc
            if len(self.buf) >= self.size:
                self.eof = True
                self.acc = 0
                self.nacc = 0
                return
            self.buf.append((self.acc << pad) & 0xFF)
            self.acc = 0
            self.nacc = 0

    def getvalue(self) -> bytes:
        return bytes(self.buf)
