"""Entropy coding: recursive Rice / Golomb / Elias-gamma codes.

Semantics follow the reference coder (src/SLACoder.c) exactly so that
bitstreams interoperate:

* Parameters are u64 fixed point with 8 fraction bits; per-symbol adaptation
  is exponential smoothing `p = (119*p + 9*(v<<8) + 64) >> 7`
  (SLACoder.c:26-28).
* The Rice parameter of stage i is `roundup_pow2(max(round(p_i/2), 1))`
  (SLACoder.c:30-31), where round(x) of the fixed-point value is
  `(x + 128) >> 8`.
* Two recursive stages (SLAInternal.h:18); quotients >= 16 at the tail stage
  escape to a gamma code (SLACoder.c:258-264).
* If the cross-channel mean of initial parameters is <= 8, the whole payload
  uses static Golomb coding with each channel's initial parameter
  (SLACoder.c:450-466).
* Symbols are channel-interleaved: sample-major, channel-minor.

This module holds the pure-Python/NumPy reference implementation; the native
C++ module provides the fast array codecs with identical semantics.
"""

from __future__ import annotations

import numpy as np

from .bitio import BitReader, BitWriter, sint32_to_uint32, uint32_to_sint32, zigzag_encode_array
from .constants import (
    CODER_LOW_THRESHOLD_PARAMETER,
    CODER_NUM_RECURSIVE_RICE_PARAMETER,
    CODER_QUOTPART_THRESHOLD,
)

_FRAC = 8
_HALF = 1 << (_FRAC - 1)
_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def _roundup_pow2(x: int) -> int:
    """ROUNDUP2POWERED via 1U << LOG2CEIL(x). For x > 2^31 the C shift count
    is 32, which on x86 executes as a shift by 0 — replicated here."""
    bl = (int(x) - 1).bit_length()
    return 1 << (bl & 31)


def param_set_fixed(v: int) -> int:
    """PARAMETER_SET: (u32)v << 8 computed in uint32 — wraps mod 2^32
    (SLACoder.c:14,18-20)."""
    return (int(v) << _FRAC) & _M32


def fixed_to_uint(p: int) -> int:
    """FIXED_FLOAT_TO_UINT32: ROUNDING uint32 conversion — the macro adds
    half before the shift, (x + 128) >> 8 (SLACoder.c:16); removing the
    + _HALF would change every derived Rice parameter (invariant 1)."""
    return ((p + _HALF) >> _FRAC) & _M32


def param_get(p: int) -> int:
    """Reconstructed (integer) parameter, at least 1."""
    return max(fixed_to_uint(p), 1)


def param_update(p: int, code: int) -> int:
    """Exponential-smoothing update. The 9*(code<<8) term is computed in
    uint32 and wraps (SLACoder.c:26-28) — load-bearing for large residuals."""
    term = (9 * ((int(code) << _FRAC) & _M32)) & _M32
    return ((119 * p + term + (1 << 6)) & _M64) >> 7


def rice_param(p: int) -> int:
    """Power-of-two Rice parameter derived from the running mean."""
    return _roundup_pow2(param_get(p >> 1))


def effective_init_param(init: int) -> int:
    """The value actually transmitted for an initial parameter: GET(SET(v)),
    i.e. after the uint32 wrap of the fixed-point store."""
    return param_get(param_set_fixed(init))


def calculate_initial_params(data_per_channel: list[np.ndarray]) -> list[int]:
    """Initial parameter per channel: mean of zigzag magnitudes, >= 1
    (SLACoder.c:361-385). Returned as plain integers (not fixed point)."""
    out = []
    for ch_data in data_per_channel:
        zz = zigzag_encode_array(np.asarray(ch_data, dtype=np.int32))
        s = int(zz.astype(np.uint64).sum())
        out.append(max(s // max(len(ch_data), 1), 1) & _M32)  # uint32 cast as in C
    return out


class RiceState:
    """Adaptive parameter state for one channel (fixed-point values)."""

    __slots__ = ("params",)

    def __init__(self, init_param: int, num_params: int = CODER_NUM_RECURSIVE_RICE_PARAMETER):
        self.params = [param_set_fixed(init_param) for _ in range(num_params)]


def put_gamma(w: BitWriter, val: int) -> None:
    if val == 0:
        w.put(1, 1)
        return
    ndigit = (val + 1).bit_length()  # log2ceil(val + 2)
    if ndigit - 1:
        w.put(0, ndigit - 1)
    w.put(val + 1, ndigit)


def get_gamma(r: BitReader) -> int:
    ndigit = r.get_zero_run() + 1
    if ndigit == 1:
        return 0
    if ndigit > 32:
        # no uint32 gamma code has more than 32 digits (put_gamma emits
        # bit_length(val+1) <= 32): corruption. Poison the reader like the
        # native twin so the caller's end-position check reports it.
        r.mark_overread()
        return 0
    rest = r.get(ndigit - 1)
    return (1 << (ndigit - 1)) + rest - 1


# static-Golomb DoS guard: unlike the adaptive recursive-Rice path (which
# gamma-escapes quotients >= 16, SLACoder.c:258-264), static Golomb has NO
# escape — a symbol's unary run is val/m bits. A pathological channel whose
# zigzag mean wraps the u32 parameter store to a tiny m (e.g. mean 2^31+1
# -> m=1) would make the reference emit a multi-GIGABIT run for one symbol.
# No real content comes near this bound (~8 MB for ONE symbol); refuse with
# a structured error like the other reference-defect gates.
_GOLOMB_MAX_QUOT = 1 << 26


def put_golomb(w: BitWriter, m: int, val: int) -> None:
    quot, rest = divmod(val, m)
    if quot > _GOLOMB_MAX_QUOT:
        from .errors import ApiResult, SLAError

        raise SLAError(
            ApiResult.INVALID_ARGUMENT,
            "pathological static-Golomb run (the reference would emit a "
            "multi-gigabit unary string here)",
        )
    w.put_unary(quot)
    if m & (m - 1) == 0:  # power of two: Rice fast path
        if m > 1:
            w.put(rest, m.bit_length() - 1)
        return
    b = (m - 1).bit_length()  # log2ceil(m)
    two_b = 1 << b
    if rest < two_b - m:
        w.put(rest, b - 1)
    else:
        w.put(rest + two_b - m, b)


def get_golomb(r: BitReader, m: int) -> int:
    # returns wrap to uint32 like the C (corrupt payloads can overflow the
    # quot*m product; valid streams never reach the mask)
    quot = r.get_zero_run()
    if m & (m - 1) == 0:
        rest = r.get(m.bit_length() - 1) if m > 1 else 0
        return (quot * m + rest) & _M32
    b = (m - 1).bit_length()
    two_b = 1 << b
    rest = r.get(b - 1)
    if rest < two_b - m:
        return (quot * m + rest) & _M32
    rest = (rest << 1) + r.get(1)
    return (quot * m + rest - (two_b - m)) & _M32


def put_recursive_rice(w: BitWriter, state: RiceState, val: int) -> None:
    """Encode one symbol with the two-stage adaptive recursive Rice code."""
    params = state.params
    nump = len(params)
    reduced = val
    for i in range(nump - 1):
        k = rice_param(params[i])
        if reduced < k:
            w.put_unary(i)
            if k != 1:
                w.put(reduced & (k - 1), k.bit_length() - 1)
            params[i] = param_update(params[i], reduced)
            return
        params[i] = param_update(params[i], reduced)
        reduced -= k
    i = nump - 1
    k = rice_param(params[i])
    tail_quot = i + reduced // k
    if tail_quot < CODER_QUOTPART_THRESHOLD:
        w.put_unary(tail_quot)
    else:
        w.put_unary(CODER_QUOTPART_THRESHOLD)
        put_gamma(w, tail_quot - CODER_QUOTPART_THRESHOLD)
    if k != 1:
        w.put(reduced & (k - 1), k.bit_length() - 1)
    params[i] = param_update(params[i], reduced)


def get_recursive_rice(r: BitReader, state: RiceState) -> int:
    params = state.params
    nump = len(params)
    quot = r.get_zero_run()
    val = 0
    for i in range(min(quot, nump - 1)):
        val += rice_param(params[i])
    i = min(quot, nump - 1)
    k = rice_param(params[i])
    if quot < nump - 1:
        if k != 1:
            val += r.get(k.bit_length() - 1)
    else:
        if quot == CODER_QUOTPART_THRESHOLD:
            quot += get_gamma(r)
        rest = r.get(k.bit_length() - 1) if k != 1 else 0
        val += k * (quot - (nump - 1)) + rest
    # corrupt payloads can produce quot/k products past 2^32: the C
    # reference computes in uint32 and wraps (the native backend matches);
    # without the mask the int32 store below raises a bare OverflowError
    val &= _M32
    tmp = val
    for i in range(min(quot + 1, nump)):
        k = rice_param(params[i])
        params[i] = param_update(params[i], tmp)
        tmp -= k
    return val


def put_data_array(
    w: BitWriter,
    init_params: list[int],
    data: list[np.ndarray],
    num_samples: int,
) -> None:
    """Channel-interleaved payload encode (SLACoder.c:429-467).

    `init_params` are the per-channel integer initial parameters (already
    transmitted in the block header)."""
    num_channels = len(data)
    eff = [effective_init_param(p) for p in init_params]
    param_ch_avg = sum(eff) // num_channels
    if param_ch_avg > CODER_LOW_THRESHOLD_PARAMETER:
        states = [RiceState(p) for p in init_params]
        for s in range(num_samples):
            for ch in range(num_channels):
                put_recursive_rice(w, states[ch], sint32_to_uint32(int(data[ch][s])))
    else:
        for s in range(num_samples):
            for ch in range(num_channels):
                put_golomb(w, eff[ch], sint32_to_uint32(int(data[ch][s])))


def get_data_array(
    r: BitReader,
    init_params: list[int],
    num_channels: int,
    num_samples: int,
) -> list[np.ndarray]:
    """Channel-interleaved payload decode (SLACoder.c:470-506)."""
    eff = [effective_init_param(p) for p in init_params]
    param_ch_avg = sum(eff) // num_channels
    out = [np.empty(num_samples, dtype=np.int32) for _ in range(num_channels)]
    if param_ch_avg > CODER_LOW_THRESHOLD_PARAMETER:
        states = [RiceState(p) for p in init_params]
        for s in range(num_samples):
            for ch in range(num_channels):
                out[ch][s] = uint32_to_sint32(get_recursive_rice(r, states[ch]))
    else:
        for s in range(num_samples):
            for ch in range(num_channels):
                out[ch][s] = uint32_to_sint32(get_golomb(r, eff[ch]))
    return out
