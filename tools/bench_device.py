#!/usr/bin/env python
"""On-chip throughput of the device filter pipelines (run on a real TPU).

Generates the batch ON the device (no host transfers in the timed loop;
only a scalar reduction comes back), runs the compiled fused stages, and
reports steady-state row-samples/s:

  * encode: stage1 (pre-emphasis + lattice predict) -> stage2 (long-term +
    LMS predict), the Pallas path pipeline.py dispatches on TPU
  * decode: the full synthesis cascade (LMS -> long-term -> lattice)

This is the production-TPU proxy for hosts whose device link is too slow
to feed end-to-end encode (BASELINE.md context).
"""

from __future__ import annotations

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    import jax
    import jax.numpy as jnp

    import sla_tpu  # noqa: F401
    from sla_tpu.pipeline import decode_stage, encode_stage1, encode_stage2

    backend = jax.default_backend()
    device = jax.devices()[0]
    print(f"backend={backend} device={device.device_kind}", flush=True)
    if backend not in ("tpu", "axon"):
        print("FAIL: run on TPU hardware")
        return 1

    B, L, p, T, M = 256, 12288, 16, 1, 8
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    data = jax.random.randint(k1, (B, L), -30000, 30000, dtype=jnp.int32)
    coef = jax.random.randint(k2, (B, p), -25000, 25000, dtype=jnp.int32)
    pitch = jax.random.randint(k3, (B,), 40, 200, dtype=jnp.int32)
    ltm = jax.random.randint(k4, (B, T), -20000, 20000, dtype=jnp.int32) << 16

    # K pipeline iterations inside ONE jit (lax.fori_loop, each chained on
    # the previous scalar): the tunnel's per-dispatch latency (~2-4 ms) is
    # paid once per K, so this measures on-chip throughput, not dispatch.
    K = 16

    @jax.jit
    def encode_pipeline(d, c, pi, lt):
        def body(i, acc):
            r1 = encode_stage1(d + (acc & 1), c, p)
            r2 = encode_stage2(r1, pi, lt, T, M)
            return jnp.sum(r2, dtype=jnp.int32)

        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    @jax.jit
    def _sum32(x):
        return jnp.sum(x, dtype=jnp.int32)

    def decode_pipeline(d, c, pi, lt):
        # decode_stage dispatches its own jitted impls (and picks the
        # chunked long-term scan from the concrete pitches) — call it
        # eagerly like the decoder does, then reduce on device. K=1
        # per call; the chained outer loop amortizes what it can.
        return _sum32(decode_stage(d, c, pi, lt, p, T, M))

    import numpy as np

    # decode_stage sizes its VMEM ring from np.asarray(pitch) — hand it a
    # HOST numpy array so the timed loop never pays a device->host fetch
    # per iteration (the 'no host transfers in the timed loop' rule)
    pitch_host = np.asarray(pitch)

    # second decode config: lags under 128 dispatch the smaller VMEM ring
    # (typical music pitch; the per-step masked work is linear in ring
    # depth); fresh key so the two pitch sets are independent draws
    k5 = jax.random.split(k4)[0]
    pitch_low = np.asarray(
        jax.random.randint(k5, (B,), 40, 120, dtype=jnp.int32)
    )

    for name, fn, pi_arg, per_call in [
        ("encode stage1+2", encode_pipeline, pitch, K),
        ("decode cascade ", decode_pipeline, pitch_host, 1),
        ("decode cascade (pitch<120)", decode_pipeline, pitch_low, 1),
    ]:
        # warm the exact chained pattern below: compiles both shapes and
        # absorbs the tunnel's first-dispatch stall. On tunneled runtimes
        # block_until_ready can return before the device finishes — only a
        # host fetch truly synchronizes, hence np.asarray.
        acc = jnp.int32(0)
        for _ in range(3):
            acc = fn(data + (acc & 1), coef, pi_arg, ltm)
        np.asarray(acc)
        iters = 30
        t0 = time.time()
        acc = jnp.int32(0)
        for _ in range(iters):
            # chain each step through the previous result so the queue can't
            # be collapsed, then fetch the final scalar to drain it
            acc = fn(data + (acc & 1), coef, pi_arg, ltm)
        np.asarray(acc)
        dt = (time.time() - t0) / (iters * per_call)
        rate = B * L / dt
        print(f"{name}: {dt * 1e3:.2f} ms / ({B}x{L}) batch -> "
              f"{rate / 1e9:.2f} G row-samples/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
