"""MSB-first bit reader/writer over in-memory byte buffers.

Semantics match the reference bitstream (src/SLABitStream.c:162-325): bits are
emitted most-significant-first, `flush` pads the current byte with zero bits,
`seek`/`tell` operate on byte granularity (after an implicit flush), and the
zero-run-length read consumes the terminating 1 bit.

This pure-Python implementation is the semantic reference used by the tests
and cold paths; the hot entropy loops use the native C++ module
(sla_tpu/native) operating on whole arrays instead.
"""

from __future__ import annotations

import numpy as np


def sint32_to_uint32(v: int) -> int:
    """Zigzag map: signed -> unsigned (SLAUtility.h:37)."""
    v = int(v)
    return (-(v << 1)) - 1 if v < 0 else (v << 1)


def uint32_to_sint32(u: int) -> int:
    """Inverse zigzag map (SLAUtility.h:39)."""
    u = int(u)
    return (u >> 1) ^ -(u & 1)


def zigzag_encode_array(v: np.ndarray) -> np.ndarray:
    """Vectorized zigzag for int32 arrays -> uint32."""
    v64 = v.astype(np.int64)
    return np.where(v64 < 0, (-(v64 << 1)) - 1, v64 << 1).astype(np.uint32)


def zigzag_decode_array(u: np.ndarray) -> np.ndarray:
    """Vectorized inverse zigzag for uint32 arrays -> int32."""
    u = u.astype(np.uint32)
    return ((u >> np.uint32(1)).astype(np.int64) ^ -(u & np.uint32(1)).astype(np.int64)).astype(np.int32)


class BitWriter:
    """MSB-first bit writer accumulating into a bytearray."""

    __slots__ = ("_buf", "_acc", "_nacc")

    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0  # pending bits, MSB-aligned within _nacc bits
        self._nacc = 0

    def put(self, val: int, nbits: int) -> None:
        """Write the low `nbits` of `val` (1..64)."""
        assert 0 < nbits <= 64
        self._acc = (self._acc << nbits) | (int(val) & ((1 << nbits) - 1))
        self._nacc += nbits
        while self._nacc >= 8:
            self._nacc -= 8
            self._buf.append((self._acc >> self._nacc) & 0xFF)
        self._acc &= (1 << self._nacc) - 1

    def put_unary(self, q: int) -> None:
        """q zero bits followed by a one bit."""
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)

    def flush(self) -> None:
        """Pad with zeros up to the next byte boundary."""
        if self._nacc:
            self.put(0, 8 - self._nacc)

    def tell(self) -> int:
        """Current byte position (whole bytes emitted). Byte-aligned only:
        a mid-byte tell would underreport by one and a write_bytes_at
        back-patch at that offset would corrupt the preceding byte."""
        assert self._nacc == 0, "flush before tell"
        return len(self._buf)

    def getvalue(self) -> bytes:
        assert self._nacc == 0, "flush before reading out"
        return bytes(self._buf)

    def write_bytes_at(self, pos: int, data: bytes) -> None:
        """Back-patch already-emitted bytes (offset/CRC fields)."""
        if pos < 0 or pos + len(data) > len(self._buf):
            # bytearray slice assignment would silently APPEND at the end
            # for an out-of-range pos — a stale back-patch offset must be
            # loud, not a corrupted stream
            raise ValueError(
                f"back-patch [{pos}, {pos + len(data)}) outside the "
                f"{len(self._buf)}-byte buffer"
            )
        self._buf[pos : pos + len(data)] = data

    def put_bytes(self, data: bytes) -> None:
        """Append whole bytes (writer must be byte-aligned)."""
        assert self._nacc == 0, "flush before appending bytes"
        self._buf.extend(data)


class BitReader:
    """MSB-first bit reader over a bytes-like object."""

    __slots__ = ("_mem", "_bitpos")

    def __init__(self, data: bytes | bytearray | memoryview, bit_offset: int = 0) -> None:
        self._mem = memoryview(data)
        self._bitpos = bit_offset

    def get(self, nbits: int) -> int:
        """Read `nbits` (0..64), MSB-first, right-aligned result."""
        out = 0
        pos = self._bitpos
        end = pos + nbits
        mem = self._mem
        while pos < end:
            byte = mem[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, end - pos)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
        self._bitpos = end
        return out

    def get_zero_run(self) -> int:
        """Count consecutive 0 bits; consume them plus the terminating 1."""
        run = 0
        mem = self._mem
        pos = self._bitpos
        nbits_total = len(mem) * 8
        while pos < nbits_total:
            byte = mem[pos >> 3]
            avail = 8 - (pos & 7)
            chunk = byte & ((1 << avail) - 1)
            if chunk == 0:
                run += avail
                pos += avail
                continue
            lead = avail - chunk.bit_length()
            run += lead
            pos += lead + 1  # consume the 1 bit too
            self._bitpos = pos
            return run
        # the run fell off the buffered end without its terminating 1:
        # mark the over-read (pos = total + 1, like the native reader and
        # hostref twin) so a later get() raises and the end-of-payload
        # position checks see the overshoot — otherwise a stream truncated
        # inside a zero tail decodes to silent garbage on the Python path
        self._bitpos = nbits_total + 1
        return run

    def mark_overread(self) -> None:
        """Force the over-read state (tell past the buffer): callers'
        end-position checks then surface the corruption (native twin:
        BitReader::mark_overread)."""
        self._bitpos = len(self._mem) * 8 + 1

    def flush(self) -> None:
        """Advance to the next byte boundary."""
        self._bitpos = (self._bitpos + 7) & ~7

    def tell(self) -> int:
        """Current byte offset (ceil of bit position)."""
        return (self._bitpos + 7) >> 3

    def seek_bytes(self, byte_pos: int) -> None:
        self._bitpos = byte_pos * 8
