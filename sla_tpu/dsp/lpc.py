"""LPC analysis: autocorrelation, Levinson-Durbin, code-length estimate.

Batched over a leading batch axis (blocks x channels) in float64 NumPy.
Numerical conventions follow the reference (src/SLAPredictor.c:189-502):

* num_samples < order        -> all-zero coefficients (silence treatment)
* |R[0]| < FLT_EPSILON       -> all-zero coefficients
* PARCOR sign convention: parcor[k] = -gamma_k (reflection coefficient
  negated), parcor[0] == 0
* code length per sample (bytes) from the Laplace-distribution entropy
  estimate with beta = sqrt(2 e^2).
"""

from __future__ import annotations

import numpy as np

_FLT_EPSILON = np.float32(np.finfo(np.float32).eps)  # 1.1920929e-7
_FLT_MIN = np.float32(np.finfo(np.float32).tiny)  # 1.1754944e-38
BETA_CONST_FOR_LAPLACE_DIST = 1.9426950408889634  # sqrt(2 * E * E)


def autocorrelation(data: np.ndarray, order: int) -> np.ndarray:
    """Sample autocorrelation R[..., k] for k in [0, order).

    `data` has shape (..., N); lags beyond N-1 are zero. The reference
    reorders the summation for scalar-CPU speed (SLAPredictor.c:331-388);
    here each lag is one vectorized dot product (mathematically identical).
    """
    data = np.asarray(data, dtype=np.float64)
    n = data.shape[-1]
    batch_shape = data.shape[:-1]
    out = np.zeros(batch_shape + (order,), dtype=np.float64)
    kmax = min(order, n)
    for k in range(kmax):
        out[..., k] = np.einsum("...i,...i->...", data[..., : n - k], data[..., k:])
    return out


def levinson_durbin(auto_corr: np.ndarray, order: int) -> tuple[np.ndarray, np.ndarray]:
    """Batched Levinson-Durbin recursion.

    auto_corr: (..., order+1). Returns (lpc_coef, parcor_coef), both
    (..., order+1). Rows with |R[0]| < FLT_EPSILON yield zeros.
    """
    R = np.asarray(auto_corr, dtype=np.float64)
    batch_shape = R.shape[:-1]
    a = np.zeros(batch_shape + (order + 2,), dtype=np.float64)
    parcor = np.zeros(batch_shape + (order + 1,), dtype=np.float64)
    live = np.abs(R[..., 0]) >= _FLT_EPSILON
    if not live.any() or order == 0:
        return a[..., : order + 1], parcor

    # Guard dead rows against division by zero; zero their output at the end.
    R0 = np.where(live, R[..., 0], 1.0)
    e = np.where(live, R0 + R[..., 1] * (-R[..., 1] / R0), 1.0)
    a[..., 0] = 1.0
    a[..., 1] = -R[..., 1] / R0
    parcor[..., 1] = R[..., 1] / R0

    for delay in range(1, order):
        # gamma = sum_{i<=delay} a[i] * R[delay+1-i] / (-e)
        gamma = np.einsum(
            "...i,...i->...", a[..., : delay + 1], R[..., delay + 1 : 0 : -1][..., : delay + 1]
        )
        # DELIBERATE finite substitution when e == 0 exactly, matching the
        # native fast estimator op-for-op (sla_native.cpp scalar tail:
        # `gamma /= -(fabs(e) > 0 ? e : 1.0)`). This is NOT the reference's
        # IEEE division (the exact twins do that, exact.py _c_div): keeping
        # the fast path finite lets span_cost_error_bound see degeneracy as
        # a huge-but-finite sensitivity. Safety: every route to e == 0
        # leaves a <= ~1e-300-clamped factor in the reconstructed
        # e_p = R0 * prod(max(1-k^2, 1e-300)), so the bound escalates to
        # inf and the partition re-prices those windows reference-exactly.
        gamma = gamma / (-np.where(np.abs(e) > 0, e, 1.0))
        e = (1.0 - gamma * gamma) * e
        # a_new[i] = u[i] + gamma * v[i]; u = [1, a1..adelay, 0], v = reverse
        u = np.concatenate(
            [np.ones(batch_shape + (1,)), a[..., 1 : delay + 1], np.zeros(batch_shape + (1,))],
            axis=-1,
        )
        v = np.concatenate(
            [np.zeros(batch_shape + (1,)), a[..., 1 : delay + 1][..., ::-1], np.ones(batch_shape + (1,))],
            axis=-1,
        )
        a[..., : delay + 2] = u + gamma[..., None] * v
        parcor[..., delay + 1] = -gamma

    mask = live[..., None]
    return np.where(mask, a[..., : order + 1], 0.0), np.where(mask, parcor, 0.0)


def calculate_parcor(data: np.ndarray, order: int) -> np.ndarray:
    """Windowed data (..., N) -> PARCOR coefficients (..., order+1)."""
    data = np.asarray(data, dtype=np.float64)
    n = data.shape[-1]
    R = autocorrelation(data, order + 1)
    if n < order:
        return np.zeros(data.shape[:-1] + (order + 1,), dtype=np.float64)
    _, parcor = levinson_durbin(R, order)
    return parcor


def estimate_code_length(
    data: np.ndarray, bits_per_sample: int, parcor_coef: np.ndarray, order: int
) -> np.ndarray:
    """Estimated code length per sample in BYTES (SLAPredictor.c:416-468).

    data: (..., N) float64 in [-1, 1) scale; parcor_coef: (..., >=order+1).
    """
    data = np.asarray(data, dtype=np.float64)
    n = data.shape[-1]
    power = np.einsum("...i,...i->...", data, data) * (2.0 ** (2 * (bits_per_sample - 1)))
    silent = np.abs(power) <= _FLT_MIN
    safe_power = np.where(silent, 1.0, power)
    log2_mean_power = np.log2(safe_power) - np.log2(float(n))
    k = parcor_coef[..., 1 : order + 1]
    with np.errstate(divide="ignore"):
        log2_var_ratio = np.sum(np.log2(1.0 - k * k), axis=-1)
    length = BETA_CONST_FOR_LAPLACE_DIST + 0.5 * (log2_mean_power + log2_var_ratio)
    length = length / 8.0
    length = np.where(length <= 0, 1.0 / 8, length)
    return np.where(silent, 0.0, length)


def calculate_residual_power(data: np.ndarray, parcor_coef: np.ndarray, order: int) -> np.ndarray:
    """Predicted residual power: mean power times the variance ratio
    (SLAPredictor.c:471-502)."""
    data = np.asarray(data, dtype=np.float64)
    power = np.einsum("...i,...i->...", data, data) / data.shape[-1]
    k = parcor_coef[..., 1 : order + 1]
    var_ratio = np.prod(1.0 - k * k, axis=-1)
    return power * var_ratio


def width_from_maxabs(maxabs: np.ndarray) -> np.ndarray:
    """Bit width (incl. sign, >= 1) from per-element max |x| — the
    SLAUTILITY_LOG2CEIL rule (SLAUtility.c:677-696). Shared by
    data_bit_width and the encoder's fused block-stats path so the
    byte-identity-critical formula lives in exactly one place."""
    flat = np.asarray(maxabs, dtype=np.int64).ravel()
    width = np.fromiter(
        ((int(m - 1).bit_length() + 1) if m > 0 else 1 for m in flat),
        dtype=np.int32,
        count=flat.size,
    )
    return width.reshape(np.shape(maxabs))


def data_bit_width(data: np.ndarray) -> np.ndarray:
    """Bit width (incl. sign) covering all values; >= 1
    (SLAUtility.c:677-696). data: (..., N) int32 -> (...,) int."""
    a = np.asarray(data)
    # max |x| from the per-axis max and min (no |x| temp, no int64 pass)
    mx = a.max(axis=-1).astype(np.int64)
    mn = a.min(axis=-1).astype(np.int64)
    return width_from_maxabs(np.maximum(mx, -mn))


