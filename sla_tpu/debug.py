"""Opt-in on-device overflow asserts (SLA_TPU_DEBUG_ASSERTS=1).

The reference peppers its hot loops with `SLA_Assert` (disabled by NDEBUG in
release builds, e.g. the per-tap LMS overflow checks at
src/SLAPredictor.c:1265-1271). The JAX equivalent is `checkify`: with the
env flag set, the scan kernels embed `checkify.check` calls and the pipeline
dispatchers route through a checkified (functionalized) trace that raises
`JaxRuntimeError` on the first violated assert. Off by default — exactly
like NDEBUG — so the release path carries zero overhead. The Pallas kernels
do not carry the checks; assert mode forces the scan path.
"""

from __future__ import annotations

import functools
import os


def asserts_enabled() -> bool:
    return bool(os.environ.get("SLA_TPU_DEBUG_ASSERTS"))


def check(cond, msg: str) -> None:
    """checkify.check, only callable from inside a checkified trace."""
    from jax.experimental import checkify

    checkify.check(cond, msg)


def run_checked(fn, *args, **static_kwargs):
    """Run `fn` under the checkify transform and raise on any failed check.

    `fn` may be jit-wrapped; static arguments go through as keywords."""
    from jax.experimental import checkify

    err, out = checkify.checkify(functools.partial(fn, **static_kwargs))(*args)
    err.throw()
    return out
