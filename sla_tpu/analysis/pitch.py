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


def _fft_autocorr_rows(data: np.ndarray, fft_size: int) -> np.ndarray:
    """Circular autocorrelation (unnormalized scale) of int32 rows.

    data: (rows, n) int32, n <= fft_size // 2. Returns (rows, fft_size)."""
    buf = data.astype(np.float64) * (2.0 ** -31)
    spec = np.fft.rfft(buf, n=fft_size, axis=-1)
    power = spec.real * spec.real + spec.imag * spec.imag
    # Scale by fft_size to match the reference's unnormalized inverse FFT
    # up to the (harmless) constant factor noted in the module docstring.
    return np.fft.irfft(power, n=fft_size, axis=-1) * fft_size


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

    When the native module is present, the autocorrelation uses the
    reference's exact FFT arithmetic and the normal equations its exact LU
    solver, so every pitch decision and coefficient bit matches the C
    encoder. The NumPy fallback is mathematically equivalent but may differ
    in the last float64 ulp (streams remain valid and losslessly decodable,
    just not guaranteed byte-identical)."""
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
    # pure-NumPy fallback (no g++): mathematically equivalent analysis,
    # last-ulp float64 differences possible (streams valid, not guaranteed
    # byte-identical — see the module docstring)
    ac = _fft_autocorr_rows(data[:, :num_samples], fft_size)
    results: list[LongTermResult] = []
    zeros = np.zeros(num_taps, dtype=np.float64)
    for row in range(data.shape[0]):
        acr = ac[row]
        if abs(acr[0]) <= _FLT_MIN:
            results.append(LongTermResult(0, zeros.copy()))
            continue
        pitch = _find_pitch(acr, LONGTERM_MAX_PERIOD)
        if pitch == 0 or pitch < (num_taps // 2) + 1 or pitch >= LONGTERM_MAX_PERIOD:
            results.append(LongTermResult(0, zeros.copy()))
            continue
        # Toeplitz normal equations: R_mat[j][k] = ac[|j-k|]
        idx = np.abs(np.arange(num_taps)[:, None] - np.arange(num_taps)[None, :])
        R = acr[idx]
        rhs = acr[np.arange(num_taps) + pitch - num_taps // 2]
        try:
            coef = np.linalg.solve(R, rhs)
        except np.linalg.LinAlgError:
            results.append(LongTermResult(0, zeros.copy()))
            continue
        if not np.all(np.isfinite(coef)):
            results.append(LongTermResult(0, zeros.copy()))
            continue
        if np.abs(coef).sum() >= 1.0:
            coef = zeros.copy()
            coef[num_taps // 2] = acr[pitch] / acr[0]
        results.append(LongTermResult(int(pitch), coef))
    return results
