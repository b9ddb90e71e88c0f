"""CRC16-IBM (reflected polynomial 0xA001) used to guard the file header and
every block (reference: src/SLAUtility.c:322-339).

The byte-at-a-time table is generated here rather than hardcoded; a
slice-by-8 variant keeps large-buffer checking fast on the single host core.
"""

from __future__ import annotations

import numpy as np

_POLY = 0xA001


def _make_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint16)
    for byte in range(256):
        crc = byte
        for _ in range(8):
            crc = (crc >> 1) ^ _POLY if (crc & 1) else (crc >> 1)
        table[byte] = crc
    return table


_TABLE = _make_table()

# Slice-by-8 tables: T[k][b] = CRC16 advance of byte b followed by k zero bytes.
_TABLES8 = np.zeros((8, 256), dtype=np.uint16)
_TABLES8[0] = _TABLE
for _k in range(1, 8):
    prev = _TABLES8[_k - 1]
    _TABLES8[_k] = (prev >> 8) ^ _TABLE[prev & 0xFF]


def crc16(data: bytes | bytearray | memoryview | np.ndarray, init: int = 0x0000) -> int:
    """Compute CRC16-IBM over `data` with initial value `init`."""
    if init == 0:
        from . import native

        if native.available():
            # memoryviews pass through zero-copy (native.crc16 wraps them
            # with np.frombuffer); only non-contiguous views need a copy
            if isinstance(data, memoryview) and not data.contiguous:
                data = bytes(data)
            return native.crc16(data)
    if isinstance(data, np.ndarray):
        # reinterpret the raw bytes (like the native path) — astype would
        # keep only each element's low byte and silently diverge from the
        # native backend on any wider dtype
        if not data.flags.c_contiguous:  # .view needs contiguity first
            data = np.ascontiguousarray(data)
        buf = data.view(np.uint8) if data.dtype != np.uint8 else data
    else:
        buf = np.frombuffer(bytes(data), dtype=np.uint8)
    crc = init
    n = buf.size
    i = 0
    # Process 8 bytes per iteration (slice-by-8).
    t = _TABLES8
    n8 = n - (n % 8)
    b = buf[:n8].reshape(-1, 8) if n8 else None
    if b is not None:
        rows = b.tolist()
        for r0, r1, r2, r3, r4, r5, r6, r7 in rows:
            c0 = crc ^ r0 ^ (r1 << 8)
            crc = int(
                t[7][c0 & 0xFF]
                ^ t[6][(c0 >> 8) & 0xFF]
                ^ t[5][r2]
                ^ t[4][r3]
                ^ t[3][r4]
                ^ t[2][r5]
                ^ t[1][r6]
                ^ t[0][r7]
            )
        i = n8
    tb = _TABLE
    while i < n:
        crc = (crc >> 8) ^ int(tb[(crc ^ int(buf[i])) & 0xFF])
        i += 1
    return crc & 0xFFFF
