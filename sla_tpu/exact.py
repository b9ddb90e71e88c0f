"""Pure-Python exact-arithmetic analysis twins (toolchain-free byte-identity).

Python floats ARE IEEE float64 and CPython's math module calls the same
libm the reference C links, so every float64 operation sequence the stream
format pins down is replicable without a C compiler. This module mirrors,
op for op:

  * four1/realft — the reference's Numerical-Recipes real FFT
    (/root/reference/src/SLAUtility.c:218-319; native sla_fft). The
    butterfly loops vectorize over the independent lanes of one stage
    (element-wise ops round identically); the twiddle recurrences and
    bit-reversal stay serial, exactly as in C.
  * make_window — libm trig with the reference's association
    (SLAUtility.c:99-216; native sla_make_window).
  * lpc_analyze — windowing + double pre-emphasis + the term-reuse
    autocorrelation summation order (SLAPredictor.c:331-388) + the
    Levinson-Durbin recursion (:253-328) + the per-sample code length
    estimate (:416-468); native sla_lpc_analyze / lpc_finish_row.
  * longterm_autocorr — Wiener-Khinchin with the exact FFT
    (SLAPredictor.c:827-853; native sla_longterm_autocorr).
  * lesolve — Crout LU with implicit scaling, partial pivoting, and
    long-double iterative refinement (SLAUtility.c:487-674; native
    sla_lesolve). np.longdouble is x86 80-bit extended, matching the
    reference's `long double` on the platforms the reference targets.

Used by the analysis fallbacks when the native library is unavailable
(SLA_TPU_NO_NATIVE / no g++). Speed is secondary here — the native and
device paths own performance; this path owns portability of the
byte-identity guarantee.
"""

from __future__ import annotations

import math
import warnings

import numpy as np

_INV_LOGE2 = 1.4426950408889634


class LongDoubleParityWarning(UserWarning):
    """np.longdouble on this platform is not x86 80-bit extended precision.

    The reference's iterative refinement accumulates in C ``long double``
    (SLAUtility.c:654-656), which is 80-bit extended on the x86 platforms
    the reference targets. Where np.longdouble is something else (IEEE quad
    on aarch64, plain float64 on MSVC), the refinement error terms round
    differently in the last ulps, so the *pure-Python fallback's*
    byte-identity guarantee weakens to "almost always identical" on
    degenerate near-singular systems. The native library (and any x86
    host) is unaffected."""


# the reference's `long double`: x86 80-bit extended = 63 mantissa bits
_REF_LONGDOUBLE_NMANT = 63


def _longdouble_matches_reference() -> bool:
    """Capability probe: does this platform's np.longdouble reproduce the
    reference's 80-bit extended accumulate bit for bit?"""
    return np.finfo(np.longdouble).nmant == _REF_LONGDOUBLE_NMANT


_longdouble_checked = False


def _check_longdouble() -> None:
    global _longdouble_checked
    if _longdouble_checked:
        return
    _longdouble_checked = True
    if not _longdouble_matches_reference():
        warnings.warn(
            "np.longdouble carries "
            f"{np.finfo(np.longdouble).nmant} mantissa bits on this platform "
            f"(reference long double: {_REF_LONGDOUBLE_NMANT}); the "
            "pure-Python lesolve refinement may differ from the reference "
            "in the last ulp on near-singular systems — use the native "
            "library for the strict byte-identity guarantee",
            LongDoubleParityWarning,
            stacklevel=3,
        )


def _ref_log2(x: float) -> float:
    """SLAUtility_Log2 replica: log(x) * (1/ln 2) with the reference's
    exact constant (SLAUtility.c:442-446) — NOT math.log2, which differs
    in the last ulp for ~19% of inputs.

    C's log() never raises: log(0) = -inf, log(<0) = log(NaN) = NaN
    (reachable on degenerate content — e.g. a zero mean residual power
    before the |x| <= FLT_MIN guard at SLAPredictor.c:439). math.log
    raises ValueError there instead, so branch explicitly; the native
    twin (std::log) already matches C."""
    if x > 0.0:
        return math.log(x) * _INV_LOGE2
    if x == 0.0:
        return float("-inf")
    return float("nan")


def _c_div(a: float, b: float) -> float:
    """IEEE-754 division like C: never raises. Python float `/` raises
    ZeroDivisionError on b == 0 where C gives ±inf (sign from both
    operands, including the sign of a zero divisor) or NaN for 0/0."""
    if b != 0.0:
        return a / b
    if a != a or a == 0.0:
        return float("nan")
    sign = (1.0 if a > 0.0 else -1.0) * math.copysign(1.0, b)
    return sign * float("inf")


_FLT_EPS = 1.1920928955078125e-07  # FLT_EPSILON
_FLT_MIN = 1.1754943508222875e-38  # FLT_MIN
_BETA_LAPLACE = 1.9426950408889634  # sqrt(2 e^2)
_EMPH = 31.0 / 32.0  # (2^5 - 1) * 2^-5, exact


# --------------------------------------------------------------------- FFT
def four1(d: np.ndarray, nn: int, isign: int) -> None:
    """In-place complex FFT, d = interleaved re/im of nn points (2*nn
    doubles, 0-indexed here; the C code's data[i] is d[i-1])."""
    n = nn << 1
    j = 1
    for i in range(1, n, 2):  # bit reversal (pure swaps, no rounding)
        if j > i:
            d[j - 1], d[i - 1] = d[i - 1], d[j - 1]
            d[j], d[i] = d[i], d[j]
        m = n >> 1
        while m >= 2 and j > m:
            j -= m
            m >>= 1
        j += m
    mmax = 2
    while n > mmax:
        istep = mmax << 1
        theta = isign * (6.28318530717959 / float(mmax))
        wtemp = math.sin(0.5 * theta)
        wpr = -2.0 * wtemp * wtemp
        wpi = math.sin(theta)
        wr, wi = 1.0, 0.0
        for m in range(1, mmax, 2):
            # butterflies for this twiddle: i = m, m+istep, ... <= n.
            # Independent element-wise ops -> exact under vectorization.
            cnt = (n - m) // istep + 1
            sl = lambda a: slice(a, a + cnt * istep, istep)  # noqa: E731
            re_i = d[sl(m - 1)]
            im_i = d[sl(m)]
            re_j = d[sl(m - 1 + mmax)]
            im_j = d[sl(m + mmax)]
            tempr = wr * re_j - wi * im_j
            tempi = wr * im_j + wi * re_j
            re_j[...] = re_i - tempr
            im_j[...] = im_i - tempi
            re_i += tempr
            im_i += tempi
            wtemp = wr
            wr = wr * wpr - wi * wpi + wr
            wi = wi * wpr + wtemp * wpi + wi
        mmax = istep


def realft(d: np.ndarray, n: int, isign: int) -> None:
    """In-place real FFT of n doubles (NR convention; C data[1..n] = d[0..n-1])."""
    c1 = 0.5
    theta = 3.141592653589793 / float(n >> 1)
    if isign == 1:
        c2 = -0.5
        four1(d, n >> 1, 1)
    else:
        c2 = 0.5
        theta = -theta
    wtemp = math.sin(0.5 * theta)
    wpr = -2.0 * wtemp * wtemp
    wpi = math.sin(theta)
    wr, wi = 1.0 + wpr, wpi
    np3 = n + 3
    count = (n >> 2) - 1  # i = 2 .. n>>2
    if count > 0:
        # serial twiddle recurrence (exact order), then vectorized butterflies
        wr_a = np.empty(count)
        wi_a = np.empty(count)
        for k in range(count):
            wr_a[k] = wr
            wi_a[k] = wi
            wtemp = wr
            wr = wr * wpr - wi * wpi + wr
            wi = wi * wpr + wtemp * wpi + wi
        i = np.arange(2, (n >> 2) + 1)
        i1 = i + i - 1
        i2 = 1 + i1
        i3 = np3 - i2
        i4 = 1 + i3
        p1 = d[i1 - 1]
        p2 = d[i2 - 1]
        p3 = d[i3 - 1]
        p4 = d[i4 - 1]
        h1r = c1 * (p1 + p3)
        h1i = c1 * (p2 - p4)
        h2r = -c2 * (p2 + p4)
        h2i = c2 * (p1 - p3)
        d[i1 - 1] = h1r + wr_a * h2r - wi_a * h2i
        d[i2 - 1] = h1i + wr_a * h2i + wi_a * h2r
        d[i3 - 1] = h1r - wr_a * h2r + wi_a * h2i
        d[i4 - 1] = -h1i + wr_a * h2i + wi_a * h2r
    if isign == 1:
        h1r = d[0]
        d[0] = h1r + d[1]
        d[1] = h1r - d[1]
    else:
        h1r = d[0]
        d[0] = c1 * (h1r + d[1])
        d[1] = c1 * (h1r - d[1])
        four1(d, n >> 1, -1)


def fft(data: np.ndarray, n: int, sign: int) -> None:
    """sla_fft: in-place real FFT with the reference index convention."""
    realft(data, n, sign)


# ------------------------------------------------------------------ window
def make_window(kind_int: int, n: int) -> np.ndarray:
    """sla_make_window: libm trig, the reference's exact association.
    0=rect 1=sin 2=hann 3=blackman 4=vorbis 5=tukey(0.5)."""
    pi = 3.14159265358979323846
    w = np.empty(n, dtype=np.float64)
    if n == 1:
        w[0] = 1.0
        return w
    if kind_int == 0:
        w[:] = 1.0
    elif kind_int == 1:
        for i in range(n):
            w[i] = math.sin(pi * (float(i) / (n - 1)))
    elif kind_int == 2:
        for i in range(n):
            w[i] = 0.5 - 0.5 * math.cos(2.0 * pi * (float(i) / (n - 1)))
    elif kind_int == 3:
        for i in range(n):
            x = float(i) / (n - 1)
            # float literals 0.42f/0.08f promoted to double in the
            # reference (SLAUtility.c:147) — np.float32 reproduces them
            w[i] = (float(np.float32(0.42)) - 0.5 * math.cos(2.0 * pi * x)
                    + float(np.float32(0.08)) * math.cos(4.0 * pi * x))
    elif kind_int == 4:
        for i in range(n):
            x = float(i) / (n - 1)
            # association as in the reference: ((pi/2) * sin) * sin
            w[i] = math.sin((pi / 2.0) * math.sin(pi * x) * math.sin(pi * x))
    elif kind_int == 5:
        alpha = 0.5
        for i in range(n):
            x = float(i) / (n - 1)
            if x < alpha / 2.0:
                w[i] = 0.5 * (1.0 + math.cos(pi * ((2.0 / alpha) * x - 1.0)))
            elif x > 1.0 - alpha / 2.0:
                w[i] = 0.5 * (1.0 + math.cos(pi * ((2.0 / alpha) * x - (2.0 / alpha) + 1.0)))
            else:
                w[i] = 1.0
    else:
        raise ValueError(f"invalid window type {kind_int}")
    return w


# ------------------------------------------------------------ LPC analysis
def _autocorr_exact(x: list[float], n: int, order: int) -> list[float]:
    """Term-reuse autocorrelation, the reference's exact loop structure and
    summation order (SLAPredictor.c:331-388)."""
    ac = [0.0] * (order + 1)
    if n >= order:
        lags = min(order + 1, n)
        s = 0.0
        for v in x:
            s += v * v
        ac[0] = s
        for lag in range(1, lags):
            lag2 = lag << 1
            L = 1 + (n - 3 * lag) // lag2 if 3 * lag < n else 0
            Llag2 = L * lag2
            acc = 0.0
            for i in range(lag):
                for l in range(0, Llag2, lag2):
                    acc += x[l + lag + i] * (x[l + i] + x[l + lag2 + i])
            for i in range(n - Llag2 - lag):
                acc += x[Llag2 + lag + i] * x[Llag2 + i]
            ac[lag] = acc
    return ac


def _lpc_finish_row(
    ac: list[float], n: int, order: int, bits_per_sample: int, power: float
) -> tuple[np.ndarray, float]:
    """Levinson-Durbin + code-length tail (native lpc_finish_row)."""
    parcor = np.zeros(order + 1, dtype=np.float64)
    # order 0: the reference's init step writes into capacity-sized arrays
    # (parcor_coef[1] with order+1..max capacity allocated) and then uses
    # none of it — the recursion is a no-op and only the power-based
    # length estimate below remains
    if order >= 1 and n >= order and abs(ac[0]) >= _FLT_EPS:
        a = [0.0] * (order + 2)
        u = [0.0] * (order + 2)
        v = [0.0] * (order + 2)
        e = [0.0] * (order + 2)
        a[0] = 1.0
        e[0] = ac[0]
        a[1] = -ac[1] / ac[0]
        parcor[1] = ac[1] / e[0]
        e[1] = ac[0] + ac[1] * a[1]
        u[0] = 1.0
        v[1] = 1.0
        for delay in range(1, order):
            gamma = 0.0
            for i in range(delay + 1):
                gamma += a[i] * ac[delay + 1 - i]
            # e[delay] reaches exactly 0 on perfectly predictable content:
            # C divides to ±inf/NaN and keeps going (SLAPredictor.c:301)
            gamma = _c_div(gamma, -e[delay])
            e[delay + 1] = (1.0 - gamma * gamma) * e[delay]
            for i in range(delay):
                u[i + 1] = v[delay - i] = a[i + 1]
            u[0] = 1.0
            u[delay + 1] = 0.0
            v[0] = 0.0
            v[delay + 1] = 1.0
            for i in range(delay + 2):
                a[i] = u[i] + gamma * v[i]
            parcor[delay + 1] = -gamma
    power *= math.pow(2.0, float(2 * (bits_per_sample - 1)))
    if abs(power) <= _FLT_MIN:
        return parcor, 0.0
    log2_mean = _ref_log2(power) - _ref_log2(float(n))
    log2_var = 0.0
    for ordn in range(1, order + 1):
        log2_var += _ref_log2(1.0 - parcor[ordn] * parcor[ordn])
    length = _BETA_LAPLACE + 0.5 * (log2_mean + log2_var)
    length /= 8.0
    if length <= 0:
        length = 1.0 / 8
    return parcor, length


def lpc_analyze(
    data: np.ndarray,
    order: int,
    bits_per_sample: int,
    window: np.ndarray | None = None,
    emphasis: bool = False,
) -> tuple[np.ndarray, float]:
    """Exact-order LPC analysis of ONE row (native sla_lpc_analyze with the
    fused windowing + double pre-emphasis preprocessing). Returns
    (parcor[0..order], length_per_sample)."""
    x = np.asarray(data, dtype=np.float64)
    n = x.shape[0]
    if window is not None:
        x = x * window[:n]  # element-wise, exact
    if emphasis:
        y = x.copy()
        y[1:] -= x[:-1] * _EMPH  # y[i] = x[i] - x[i-1]*31/32, exact
        x = y
    xl = x.tolist()
    ac = _autocorr_exact(xl, n, order)
    power = 0.0
    for v in xl:
        power += v * v
    return _lpc_finish_row(ac, n, order, bits_per_sample, power)


# -------------------------------------------------------- long-term (pitch)
def longterm_autocorr(
    data: np.ndarray, num_samples: int, fft_size: int, out_lags: int
) -> np.ndarray:
    """sla_longterm_autocorr: int32 row scaled by 2^-31, exact forward FFT,
    power spectrum in place, exact inverse FFT; first out_lags lags."""
    scale = math.ldexp(1.0, -31)
    work = np.zeros(fft_size, dtype=np.float64)
    work[:num_samples] = data[:num_samples].astype(np.float64) * scale
    fft(work, fft_size, 1)
    work[0] *= work[0]
    work[1] *= work[1]
    re = work[2::2]
    im = work[3::2]
    work[2::2] = re * re + im * im
    work[3::2] = 0.0
    fft(work, fft_size, -1)
    return work[:out_lags].copy()


def _lu_decompose(A: np.ndarray, dim: int) -> tuple[np.ndarray, list[int]] | None:
    """Crout LU with implicit scaling + partial pivoting (SLAUtility.c:487-572)."""
    A = A.copy()
    change_index = [0] * dim
    row_scale = [0.0] * dim
    for row in range(dim):
        mx = 0.0
        for col in range(dim):
            if abs(A[row, col]) > mx:
                mx = abs(A[row, col])
        if abs(mx) <= _FLT_EPS:
            return None
        row_scale[row] = 1.0 / mx
    for col in range(dim):
        for row in range(col):
            s = A[row, col]
            for k in range(row):
                s -= A[row, k] * A[k, col]
            A[row, col] = s
        mx = 0.0
        max_index = col
        for row in range(col, dim):
            s = A[row, col]
            for k in range(col):
                s -= A[row, k] * A[k, col]
            A[row, col] = s
            if row_scale[row] * abs(s) >= mx:
                mx = row_scale[row] * abs(s)
                max_index = row
        if col != max_index:
            for k in range(dim):
                A[max_index, k], A[col, k] = A[col, k], A[max_index, k]
            row_scale[max_index] = row_scale[col]
        change_index[col] = max_index
        if abs(A[col, col]) <= _FLT_EPS:
            return None
        if col != dim - 1:
            denom = 1.0 / A[col, col]
            for row in range(col + 1, dim):
                A[row, col] *= denom
    return A, change_index


def _lu_forward_back(A: np.ndarray, b: np.ndarray, dim: int, change_index: list[int]) -> None:
    nonzero_row = 0
    for row in range(dim):
        pivot = change_index[row]
        s = b[pivot]
        b[pivot] = b[row]
        if nonzero_row != 0:
            for col in range(nonzero_row, row):
                s -= A[row, col] * b[col]
        elif s != 0.0:
            nonzero_row = row
        b[row] = s
    for row in range(dim - 1, -1, -1):
        s = b[row]
        for col in range(row + 1, dim):
            s -= A[row, col] * b[col]
        b[row] = s / A[row, row]


def lesolve(A: np.ndarray, b: np.ndarray, iteration_count: int = 2) -> np.ndarray | None:
    """sla_lesolve: LU solve + long-double iterative refinement. Returns the
    solution, or None when singular (the caller's disable path)."""
    dim = len(b)
    _check_longdouble()
    lu = _lu_decompose(np.asarray(A, dtype=np.float64), dim)
    if lu is None:
        return None
    A_lu, change_index = lu
    A = np.asarray(A, dtype=np.float64)
    x = np.array(b, dtype=np.float64)
    _lu_forward_back(A_lu, x, dim, change_index)
    for _ in range(iteration_count):
        err = np.empty(dim, dtype=np.float64)
        for row in range(dim):
            error = np.longdouble(-b[row])
            for col in range(dim):
                # product rounds to double FIRST (the reference multiplies
                # two doubles, then accumulates long double,
                # SLAUtility.c:654-656)
                error = error + np.longdouble(np.float64(A[row, col] * x[col]))
            err[row] = np.float64(error)
        _lu_forward_back(A_lu, err, dim, change_index)
        for row in range(dim):
            x[row] -= err[row]
    return x


def longterm_post(
    acr: np.ndarray, num_taps: int, max_period: int
) -> tuple[int, np.ndarray]:
    """sla_longterm_post for one row: pitch walk, Toeplitz normal equations
    via the exact LU solve, and the stability clamp."""
    from .analysis.pitch import _find_pitch

    T = num_taps
    zeros = np.zeros(T, dtype=np.float64)
    if abs(acr[0]) <= _FLT_MIN:
        return 0, zeros
    pitch = _find_pitch(acr, max_period)
    if pitch == 0 or pitch < T // 2 + 1 or pitch >= max_period:
        return 0, zeros
    R = np.empty((T, T), dtype=np.float64)
    for j in range(T):
        for k in range(T):
            R[j, k] = acr[abs(j - k)]
    rhs = np.array([acr[pitch - T // 2 + j] for j in range(T)], dtype=np.float64)
    coef = lesolve(R, rhs, 2)
    if coef is None:
        return 0, zeros
    finite = True
    abs_sum = 0.0
    for j in range(T):
        if not math.isfinite(coef[j]):
            finite = False
        abs_sum += abs(coef[j])
    if not finite:
        return 0, zeros
    if abs_sum >= 1.0:
        coef = zeros.copy()
        coef[T // 2] = acr[pitch] / acr[0]
    return int(pitch), coef
