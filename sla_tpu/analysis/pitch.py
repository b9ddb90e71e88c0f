"""Long-term (pitch) predictor analysis.

Mirrors SLALongTermCalculator_CalculateCoef (src/SLAPredictor.c:791-980):
autocorrelation via the Wiener-Khinchin theorem (FFT of the zero-padded
signal, power spectrum, inverse FFT), zero-crossing-bracketed local-peak
pitch search up to lag 256, Toeplitz normal equations solved for the
(odd-count) tap coefficients, and a stability fallback to the single-tap
solution R[pitch]/R[0] when the L1 norm of the solution reaches 1.

The FFT stage is batched over all (block, channel) rows at once; the scalar
peak walk runs per row (256-lag arrays, negligible cost). Absolute FFT
scaling differs from the reference's Numerical-Recipes routine by a positive
constant, which cancels everywhere it is used (peak comparison, normal
equations, coefficient ratios).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..constants import LONGTERM_MAX_PERIOD

_FLT_MIN = float(np.finfo(np.float32).tiny)


@dataclasses.dataclass
class LongTermResult:
    pitch_period: int  # 0 when the long-term predictor is unusable
    coef: np.ndarray  # (num_taps,) float64 (zeros when unusable)


def _find_pitch(ac: np.ndarray, max_pitch: int) -> int:
    """Zero-crossing-bracketed local-peak search; returns pitch lag or 0."""
    candidates: list[int] = []
    max_peak = 0.0
    i = 1
    while i < max_pitch and len(candidates) < max_pitch:
        start = i
        while start < max_pitch:
            if ac[start - 1] < 0.0 and ac[start] > 0.0:
                break
            start += 1
        end = start + 1
        while end < max_pitch:
            if ac[end] > 0.0 and ac[end + 1] < 0.0:
                break
            end += 1
        local_peak_index = 0
        local_peak = 0.0
        for j in range(start, min(end, len(ac) - 1) + 1):
            if ac[j] > ac[j - 1] and ac[j] > ac[j + 1] and ac[j] > local_peak:
                local_peak_index = j
                local_peak = ac[j]
        if local_peak_index != 0:
            candidates.append(local_peak_index)
            if local_peak > max_peak:
                max_peak = local_peak
        i = end + 1
    if not candidates:
        return 0
    for cand in candidates:
        if ac[cand] >= max_peak:  # ratio threshold is 1.0 in the reference
            return cand
    return candidates[-1]


def longterm_coef_rows(
    data: np.ndarray, num_samples: int, num_taps: int, fft_size: int
) -> list[LongTermResult]:
    """Analyze each row of `data` (rows, num_samples) for long-term
    prediction. Returns one LongTermResult per row; pitch 0 marks rows where
    the predictor is disabled (silent / no peak / unstable / too short a
    lag), matching the encoder's fallback (SLAEncoder.c:628-632).

    Both paths are byte-identical to the C encoder: the native module runs
    the reference's exact FFT arithmetic and LU solver (8-row interleaved);
    without it the pure-Python twins in sla_tpu.exact replicate the same
    float64 op order, so the guarantee holds toolchain-free (slowly)."""
    assert num_taps % 2 == 1, "tap count must be odd"
    assert 2 * num_samples <= fft_size
    from .. import native

    use_native = native.available()
    out_lags = LONGTERM_MAX_PERIOD + num_taps + 4
    if use_native:
        ac = native.longterm_autocorr_rows(
            np.ascontiguousarray(data[:, :num_samples]),
            np.full(data.shape[0], num_samples, dtype=np.int32),
            fft_size,
            out_lags,
        )
        # decision pass (pitch walk + exact LU + stability clamp) for all
        # rows in one native call — same per-row logic as the loop below
        pitch_all, coef_all = native.longterm_post(
            ac, num_taps, LONGTERM_MAX_PERIOD
        )
        return [
            LongTermResult(int(pitch_all[r]), coef_all[r])
            for r in range(data.shape[0])
        ]
    # toolchain-free exact path (no g++): pure-Python twins of the exact
    # FFT autocorrelation, pitch walk, and refined LU solve — bit-identical
    # to the native analysis (sla_tpu.exact), just slow
    from .. import exact

    results = []
    for row in range(data.shape[0]):
        acr = exact.longterm_autocorr(
            np.ascontiguousarray(data[row, :num_samples]), num_samples,
            fft_size, out_lags,
        )
        pitch, coef = exact.longterm_post(acr, num_taps, LONGTERM_MAX_PERIOD)
        results.append(LongTermResult(pitch, coef))
    return results
