"""Lossless mid/side stereo transforms (reference: src/SLAUtility.c:370-433).

mid = (L + R) >> 1 (arithmetic shift), side = L - R; reconstruction restores
the dropped LSB of mid from side's parity. Vectorized NumPy (host) and
jax.numpy (device) versions share the same integer semantics.
"""

from __future__ import annotations

import numpy as np


def lr_to_ms_int32(left: np.ndarray, right: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    l64 = left.astype(np.int64)
    r64 = right.astype(np.int64)
    mid = ((l64 + r64) >> 1).astype(np.int32)
    side = (l64 - r64).astype(np.int32)
    return mid, side


def ms_to_lr_int32(mid: np.ndarray, side: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    m64 = mid.astype(np.int64)
    s64 = side.astype(np.int64)
    full_mid = (m64 << 1) | (s64 & 1)
    left = ((full_mid + s64) >> 1).astype(np.int32)
    right = ((full_mid - s64) >> 1).astype(np.int32)
    return left, right


def lr_to_ms_double(left: np.ndarray, right: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mid = (left + right) / 2.0
    side = left - right
    return mid, side
