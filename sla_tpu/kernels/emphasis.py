"""Pre/de-emphasis filters (reference: src/SLAPredictor.c:1741-1813).

y_pre[n] = x[n] - ((x[n-1] * 31) >> 5)   — non-recursive: fully vectorized.
y_de[n]  = x[n] + ((y[n-1] * 31) >> 5)   — recursive: cheap lax.scan,
batched over the (blocks*channels) axis.

State is the previous sample (one int32 per row), carried explicitly so the
streaming decoder can resume mid-block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import PRE_EMPHASIS_SHIFT

_COEF = (1 << PRE_EMPHASIS_SHIFT) - 1  # 31


def pre_emphasis(data: jnp.ndarray, prev: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """data: (B, N) int32; prev: (B,) int32 state. Returns (out, new_prev)."""
    shifted = jnp.concatenate([prev[:, None], data[:, :-1]], axis=1)
    out = data - ((shifted * _COEF) >> PRE_EMPHASIS_SHIFT)
    return out, data[:, -1]


def de_emphasis(data: jnp.ndarray, prev: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse filter; data: (B, N) int32, prev: (B,) int32 state."""

    def step(carry, x):
        y = x + ((carry * _COEF) >> PRE_EMPHASIS_SHIFT)
        return y, y

    new_prev, out_t = jax.lax.scan(step, prev, jnp.swapaxes(data, 0, 1))
    return jnp.swapaxes(out_t, 0, 1), new_prev
