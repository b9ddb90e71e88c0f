"""Coefficient quantization with the reference's exact integer semantics.

PARCOR (SLAEncoder.c:567-589): order-dependent width (16 bits below order 4,
8 bits from order 4 up), round-half-away-from-zero, clip to signed range,
left-align to 16-bit base, then arithmetic right shift by the per-channel
`rshift` derived from the data bit width.

Long-term (SLAEncoder.c:634-640): Q15 round then << 16 (Q31 compute scale).
"""

from __future__ import annotations

import numpy as np

from ..constants import parcor_quantize_bit_width


def c_round(x: np.ndarray) -> np.ndarray:
    """round() as the reference defines it: half away from zero
    (SLAUtility.c:436-439)."""
    return np.where(x >= 0.0, np.floor(x + 0.5), -np.floor(-x + 0.5))


def _cast_int32_x86(r: np.ndarray) -> np.ndarray:
    """`(int32_t)` of an integral double with x86 cvttsd2si semantics:
    NaN, +/-inf and anything outside int32 range become INT32_MIN
    ("integer indefinite"). The reference casts BEFORE clipping
    (SLAEncoder.c:578-583), so this is load-bearing for byte-identity on
    degenerate Levinson recursions (e_vec -> 0 makes reflection
    coefficients inf/NaN/huge; only |auto_corr[0]| < FLT_EPSILON is
    guarded, SLAPredictor.c:274,301). If the reference were built on a
    target with different out-of-range cast behavior (e.g. aarch64
    saturates), this helper is the single place to match it."""
    with np.errstate(invalid="ignore"):
        in_range = (r >= -2147483648.0) & (r <= 2147483647.0)  # NaN -> False
    return np.where(in_range, r, -2147483648.0).astype(np.int64)


def rshift_for_sint32(bitwidth: np.ndarray | int) -> np.ndarray | int:
    """SLAUTILITY_CALC_RSHIFT_FOR_SINT32: max(bitwidth - 16, 0)."""
    return np.maximum(np.asarray(bitwidth) - 16, 0)


def quantize_parcor(
    parcor: np.ndarray, order: int, rshift: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Quantize PARCOR coefficients.

    parcor: (..., order+1) float64; rshift: (...,) int.
    Returns (code, coef_int32): `code` is what goes in the bitstream
    (order-dependent width), `coef_int32` the filter coefficient.
    Index 0 is always 0.
    """
    batch = parcor.shape[:-1]
    code = np.zeros(batch + (order + 1,), dtype=np.int32)
    coef = np.zeros(batch + (order + 1,), dtype=np.int32)
    rs = np.asarray(rshift, dtype=np.int32)[..., None]
    # qbits is a function of the order index only: vectorize over orders
    qbits = np.array(
        [0] + [parcor_quantize_bit_width(o) for o in range(1, order + 1)], dtype=np.int32
    )
    scale = (1 << (qbits[1:] - 1)).astype(np.float64)
    # cast-then-clip, exactly like the reference (see _cast_int32_x86):
    # an int64 cast would instead clip huge finite values to +max
    c = _cast_int32_x86(c_round(parcor[..., 1 : order + 1] * scale))
    c = np.clip(c, -(1 << (qbits[1:] - 1)), (1 << (qbits[1:] - 1)) - 1).astype(np.int32)
    code[..., 1:] = c
    coef[..., 1:] = (c << (16 - qbits[1:])) >> rs
    return code, coef


def dequantize_parcor(code: np.ndarray, order: int, rshift: np.ndarray) -> np.ndarray:
    """Decoder-side coefficient reconstruction (SLADecoder.c:379-390)."""
    batch = code.shape[:-1]
    coef = np.zeros(batch + (order + 1,), dtype=np.int32)
    rs = np.asarray(rshift, dtype=np.int32)[..., None]
    qbits = np.array([parcor_quantize_bit_width(o) for o in range(1, order + 1)], dtype=np.int32)
    coef[..., 1:] = (code[..., 1 : order + 1].astype(np.int32) << (16 - qbits)) >> rs
    return coef


def quantize_longterm(ltm_coef: np.ndarray) -> np.ndarray:
    """Q15 round then << 16 -> Q31 int32 coefficients (no clip — the
    reference has none, SLAEncoder.c:634-640; same cvttsd2si semantics as
    quantize_parcor for NaN/out-of-range, though such coefs only exist
    when the pitch analysis failed and pitch_period=0 keeps them out of
    the stream)."""
    r = c_round(np.asarray(ltm_coef, dtype=np.float64) * float(1 << 15))
    q15 = _cast_int32_x86(r).astype(np.int32)
    return q15 << 16
