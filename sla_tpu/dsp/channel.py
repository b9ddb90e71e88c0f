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
