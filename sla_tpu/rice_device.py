"""Device-side recursive-Rice coding: per-symbol bit patterns and lengths
as a batched scan, leaving the host only a branch-free (value, length) pack.

This is the BASELINE.json north-star split for the entropy stage: the
per-symbol work — zigzag, the two-stage recursive Rice code with its
fixed-point parameter adaptation (SLACoder.c:26-31, 224-318), the gamma
escape — is data-parallel across (blocks x channels) rows and sequential
only in the tiny parameter state, so it runs as one `lax.scan` over the
sample axis on device. The host-side bit emission collapses to a dumb
concatenation of (value, length) parts with no per-symbol branching
(native `sla_pack_parts`).

Each symbol is emitted as up to 4 parts, each <= 33 bits so values fit
uint32 even for pathological residuals:

    part 0: the unary run   — `quot` zero bits then a 1   (quot <= 16)
    part 1: gamma zeros     — (ndigit-1) zero bits        (escape only)
    part 2: gamma value     — `ndigit` bits of v+1        (escape only)
    part 3: Rice remainder  — log2(k) low bits

The fixed-point parameters are uint64 in the reference; values stay well
under 2^53, so the scan carries them as float64-free uint64 under
jax_enable_x64 (XLA emulates 64-bit integers on TPU — acceptable for this
stage, whose arithmetic is a handful of ops per symbol).

Byte-identity with the host coder is asserted in tests; the encoder uses
this path when SLA_TPU_DEVICE_ENTROPY=1 and the filter backend is the
device (it shares the residual already resident in HBM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .constants import (
    CODER_LOW_THRESHOLD_PARAMETER,
    CODER_NUM_RECURSIVE_RICE_PARAMETER,
    CODER_QUOTPART_THRESHOLD,
)

_FRAC = 8
_HALF = jnp.uint64(1 << (_FRAC - 1))
_M32 = jnp.uint64(0xFFFFFFFF)


def _u32(x):
    return jnp.bitwise_and(x.astype(jnp.uint64), _M32)


def _bit_length_u32(x: jnp.ndarray) -> jnp.ndarray:
    """bit_length of a uint32-valued array (0 -> 0)."""
    x32 = x.astype(jnp.uint32)
    return (32 - jax.lax.clz(x32)).astype(jnp.int32)



def _param_update(p: jnp.ndarray, code: jnp.ndarray) -> jnp.ndarray:
    """p <- (119 p + 9 * u32(code << 8) + 64) >> 7 with the uint32 wrap of
    the 9*(code<<8) term (rice.py param_update)."""
    term = _u32(jnp.uint64(9) * _u32(code.astype(jnp.uint64) << jnp.uint64(_FRAC)))
    return (jnp.uint64(119) * p + term + jnp.uint64(64)) >> jnp.uint64(7)


def _rice_param(p: jnp.ndarray) -> jnp.ndarray:
    """roundup_pow2(max(round(p/2), 1)) with the x86 shift masking
    (rice.py rice_param)."""
    h = jnp.maximum(_u32(((p >> jnp.uint64(1)) + _HALF) >> jnp.uint64(_FRAC)), jnp.uint64(1))
    bl = _bit_length_u32((h - jnp.uint64(1)).astype(jnp.uint32))
    return (jnp.uint64(1) << (bl.astype(jnp.uint64) & jnp.uint64(31)))


@functools.partial(jax.jit, static_argnames=())
def rice_encode_parts(residual: jnp.ndarray, init_params: jnp.ndarray):
    """Per-symbol code parts for a (B, L) residual batch.

    residual: (B, L) int32; init_params: (B,) uint32 initial parameters.
    Returns (values (L, B, 4) uint32, lengths (L, B, 4) int32), sample-major
    so the host pack walks symbols in stream order per row.

    Implements the 2-stage recursive Rice encoder exactly (rice.py
    put_recursive_rice); the static-Golomb low-parameter branch is decided
    per block on host and does not use this path.
    """
    assert CODER_NUM_RECURSIVE_RICE_PARAMETER == 2
    B = residual.shape[0]
    p0 = init_params.astype(jnp.uint64) << jnp.uint64(_FRAC)
    init = (_u32(p0), _u32(p0))

    def step(state, x):
        pa, pb = state  # (B,) uint64 fixed-point params
        # zigzag
        u = jnp.where(x < 0, (-2 * x.astype(jnp.int64) - 1), 2 * x.astype(jnp.int64))
        u = u.astype(jnp.uint64)
        k0 = _rice_param(pa)
        k1 = _rice_param(pb)
        in_stage0 = u < k0
        reduced = jnp.where(in_stage0, u, u - k0)
        # stage-0 symbol: unary(0)='1', rest = reduced & (k0-1) in log2(k0) bits
        k0_bits = _bit_length_u32(k0.astype(jnp.uint32)) - 1  # log2 (k0 pow2)
        k1_bits = _bit_length_u32(k1.astype(jnp.uint32)) - 1
        tail_quot = jnp.where(in_stage0, jnp.uint64(0), jnp.uint64(1) + reduced // k1)
        escape = jnp.logical_and(~in_stage0, tail_quot >= CODER_QUOTPART_THRESHOLD)
        # part 0: unary run (quot zeros + 1)
        quot = jnp.where(
            in_stage0, jnp.uint64(0),
            jnp.minimum(tail_quot, jnp.uint64(CODER_QUOTPART_THRESHOLD)),
        )
        v0 = jnp.uint32(1)
        l0 = (quot + jnp.uint64(1)).astype(jnp.int32)
        # parts 1+2: gamma(tail_quot - 16) when escaping
        gv = jnp.where(escape, tail_quot - jnp.uint64(CODER_QUOTPART_THRESHOLD), jnp.uint64(0))
        ndigit = _bit_length_u32((gv + jnp.uint64(1)).astype(jnp.uint32))  # log2ceil(gv+2)
        l1 = jnp.where(escape, ndigit - 1, 0).astype(jnp.int32)  # zeros
        v1 = jnp.uint32(0)
        l2 = jnp.where(escape, ndigit, 0).astype(jnp.int32)
        v2 = jnp.where(escape, (gv + jnp.uint64(1)).astype(jnp.uint32), jnp.uint32(0))
        # part 3: remainder bits of the landing stage
        k_land_bits = jnp.where(in_stage0, k0_bits, k1_bits)
        k_land = jnp.where(in_stage0, k0, k1)
        l3 = k_land_bits.astype(jnp.int32)  # 0 when k == 1
        v3 = (reduced & (k_land - jnp.uint64(1))).astype(jnp.uint32)
        # parameter adaptation: stage 0 always sees u; stage 1 sees u - k0
        # only when reached (rice.py put_recursive_rice update order)
        pa2 = _param_update(pa, u)
        pb2 = jnp.where(in_stage0, pb, _param_update(pb, reduced))
        values = jnp.stack([jnp.broadcast_to(v0, x.shape).astype(jnp.uint32),
                            jnp.broadcast_to(v1, x.shape).astype(jnp.uint32),
                            v2, v3], axis=-1)
        lengths = jnp.stack([l0, l1, l2, l3], axis=-1)
        return (pa2, pb2), (values, lengths)

    (_, _), (values, lengths) = jax.lax.scan(step, init, jnp.swapaxes(residual, 0, 1))
    return values, lengths  # (L, B, 4)


def encode_block_payload_device(
    residual: np.ndarray,
    init_params: list[int],
    parts: tuple[np.ndarray, np.ndarray] | None = None,
) -> bytes:
    """Full device-coded payload for one block: returns the byte-aligned
    channel-interleaved payload, byte-identical to the host coder.

    residual: (C, n) int32. Falls back to the host coder for the static
    Golomb branch (cross-channel mean parameter <= 8). parts: optional
    precomputed ((n, C, 4) values, lengths) from a batched on-chip pass
    over the whole filter chunk (encoder._attach_device_parts) — then no
    per-block device dispatch happens at all."""
    from . import native, rice

    eff = [rice.effective_init_param(p) for p in init_params]
    if sum(eff) // len(eff) <= CODER_LOW_THRESHOLD_PARAMETER:
        return native.put_data_array(residual, init_params)
    C, n = residual.shape
    if parts is None:
        values, lengths = rice_encode_parts(
            jnp.asarray(residual), jnp.asarray(init_params, dtype=np.uint32)
        )
        v_np, l_np = np.asarray(values), np.asarray(lengths)
    else:
        v_np, l_np = parts
    # (n, C, 4) sample-major with channel-minor order == stream order
    v = np.ascontiguousarray(v_np).reshape(n * C * 4)
    l = np.ascontiguousarray(l_np).reshape(n * C * 4)
    return native.pack_parts(v, l)
