"""Analysis window functions (reference: src/SLAUtility.c:88-216).

All windows are length-N float64 with the x = n/(N-1) convention and the
window_size==1 guard of the reference.
"""

from __future__ import annotations

import functools

import numpy as np

from ..constants import WindowFunctionType


def _x(n: int) -> np.ndarray:
    if n == 1:
        return np.zeros(1)
    return np.arange(n, dtype=np.float64) / (n - 1)


def rectangular(n: int) -> np.ndarray:
    return np.ones(n, dtype=np.float64)


def hann(n: int) -> np.ndarray:
    if n == 1:
        return np.ones(1)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * _x(n))


def blackman(n: int) -> np.ndarray:
    if n == 1:
        return np.ones(1)
    x = _x(n)
    return 0.42 - 0.5 * np.cos(2.0 * np.pi * x) + 0.08 * np.cos(4.0 * np.pi * x)


def sin_window(n: int) -> np.ndarray:
    if n == 1:
        return np.ones(1)
    return np.sin(np.pi * _x(n))


def vorbis(n: int) -> np.ndarray:
    if n == 1:
        return np.ones(1)
    s = np.sin(np.pi * _x(n))
    return np.sin((np.pi / 2.0) * s * s)


def tukey(n: int, alpha: float) -> np.ndarray:
    if n == 1:
        return np.ones(1)
    x = _x(n)
    w = np.ones(n, dtype=np.float64)
    left = x < alpha / 2
    right = x > (1 - alpha / 2)
    w[left] = 0.5 * (1.0 + np.cos(np.pi * ((2.0 / alpha) * x[left] - 1)))
    w[right] = 0.5 * (1.0 + np.cos(np.pi * ((2.0 / alpha) * x[right] - (2.0 / alpha) + 1)))
    return w


def make_window(kind: WindowFunctionType, n: int) -> np.ndarray:
    # NumPy's vectorized trig differs from libm in the last ulp, which leaks
    # into quantized coefficients; both generators below (native and
    # sla_tpu.exact) call libm per sample with the reference's association,
    # so every enum kind is exact. The vectorized formulas above are kept as
    # the readable semantic reference (PARITY.md row 13) and for callers
    # that want a window without the identity guarantee (e.g. Tukey, which
    # the reference exposes as a utility but never selects via the enum:
    # SLAUtility.c:192).
    # Cached: per-sample libm sin/cos is ~0.25 ms per 12288-sample window
    # and corpus runs regenerate the same few shapes constantly. The native
    # flag is part of the key (availability can flip via SLA_TPU_NO_NATIVE),
    # and cached arrays are frozen so a mutating caller fails loudly instead
    # of poisoning every later encode.
    from .. import native

    return _make_window_cached(int(kind), n, native.available())


@functools.lru_cache(maxsize=32)
def _make_window_cached(kind_int: int, n: int, use_native: bool) -> np.ndarray:
    WindowFunctionType(kind_int)  # reject unknown kinds (raises ValueError)
    from .. import native

    if use_native and native.available():
        w = native.make_window(kind_int, n)
    else:
        # toolchain-free exact path: CPython's math module calls the same
        # libm as the compiled generator, with the reference's association
        # (sla_tpu.exact.make_window) — byte-identity holds without g++
        from .. import exact

        w = exact.make_window(kind_int, n)
    w.setflags(write=False)
    return w
