"""Lossless mid/side stereo transforms (reference: src/SLAUtility.c:370-433).

mid = (L + R) >> 1 (arithmetic shift), side = L - R; reconstruction restores
the dropped LSB of mid from side's parity. Vectorized NumPy (host) and
jax.numpy (device) versions share the same integer semantics.
"""

from __future__ import annotations

import numpy as np


def lr_to_ms_int32(left: np.ndarray, right: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    # (L + R) >> 1 without int64 temporaries: with floor-shift semantics
    # L + R = 2*(L>>1) + 2*(R>>1) + (L&1) + (R&1), so the exact mean is
    # (L>>1) + (R>>1) + (L&1 & R&1) — always within int32 (mean of two
    # int32). side wraps in int32 exactly like the reference's int32 C
    # arithmetic (SLAUtility.c:391-412).
    mid = (left >> 1) + (right >> 1) + (left & right & np.int32(1))
    with np.errstate(over="ignore"):
        side = left - right
    return mid, side


def ms_to_lr_int32(mid: np.ndarray, side: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    # pure int32 with two's-complement wrap — exactly the reference's
    # arithmetic (SLAUtility.c:415-433), and no int64 temporaries
    one = np.int32(1)
    with np.errstate(over="ignore"):
        full_mid = (mid << one) | (side & one)
        left = (full_mid + side) >> one
        right = (full_mid - side) >> one
    return left, right


def lr_to_ms_double(left: np.ndarray, right: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mid = (left + right) / 2.0
    side = left - right
    return mid, side


class LazyDoubleSource:
    """Lazy float64 (MS-transformed) view of the original int32 signal.

    The partition sweeps and analysis fills convert int32 -> float64 in
    registers (native span_autocorr_multi_i32 / lpc_analyze_rows_at_i32),
    so the whole-file 8-byte/sample array never materializes. Every
    conversion step is EXACT in float64 — x*2^-31, (l+r)/2, l-r — so any
    consumer sees bit-identical values to the materialized array. The
    rare exact-reprice and no-native paths materialize slices on demand.

    data: (C, N) canonical int32, rows possibly strided (segment views)."""

    __slots__ = ("data", "ms")

    def __init__(self, data: np.ndarray, ms: bool):
        self.data = data
        self.ms = bool(ms)

    @property
    def shape(self) -> tuple[int, ...]:
        return self.data.shape

    def materialize(self, start: int, stop: int) -> np.ndarray:
        d = self.data[:, start:stop].astype(np.float64)
        d *= 2.0 ** -31
        if self.ms:
            d[0], d[1] = lr_to_ms_double(d[0], d[1])
        return d
