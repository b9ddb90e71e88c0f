#!/usr/bin/env python
"""On-chip throughput of the device filter pipelines (run on a real TPU).

Generates the batch ON the device (no host transfers in the timed loop;
only a scalar reduction comes back), runs the compiled fused stages, and
reports steady-state row-samples/s:

  * encode fused: the fully-merged cascade (pre-emphasis -> lattice predict
    -> windowed long-term FIR -> LMS predict, ONE kernel / one HBM round
    trip — round 5)
  * encode stage1+2: the prior two-dispatch form (kept for contrast)
  * decode: the full synthesis cascade (LMS -> long-term -> lattice)

Each kernel also gets a ROOFLINE record (VERDICT r4 #3): HBM bytes moved
and VPU ops executed per row-sample (static counts from the kernel
formulas), the attainable bound on this chip from whichever is binding,
and achieved %. Chip numbers (v5e): HBM ~819 GB/s; VPU 8x128 lanes x 4
ALUs x ~0.94 GHz ~= 3.85e12 int32 ops/s (the public scaling-book model).

This is the production-TPU proxy for hosts whose device link is too slow
to feed end-to-end encode (BASELINE.md context).
"""

from __future__ import annotations

import math
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

HBM_BW = 819e9  # v5e bytes/s
VPU_OPS = 3.85e12  # v5e int32 lane-ops/s (8x128 x 4 ALUs x 0.94 GHz)


def _roofline(name, ops_per_rs, bytes_per_rs, measured_g):
    """Attainable G row-samples/s = min(HBM, VPU) bound; achieved %."""
    bound_mem = HBM_BW / bytes_per_rs / 1e9
    bound_vpu = VPU_OPS / ops_per_rs / 1e9
    attainable = min(bound_mem, bound_vpu)
    return {
        "kernel": name,
        "vpu_ops_per_row_sample": round(ops_per_rs, 1),
        "hbm_bytes_per_row_sample": round(bytes_per_rs, 2),
        "bound": "vpu" if bound_vpu < bound_mem else "hbm",
        "attainable_g_rs": round(attainable, 2),
        "achieved_g_rs": measured_g,
        "achieved_pct": round(100.0 * measured_g / attainable, 1),
    }


def _ops_lms(M):
    # acc: 2M mul + 2M add; pred shift; step: ~8 (abs, clz, sign, mul, shift,
    # select); update: 2M mul + 2M add + 2 sign(3 ops) ~ 4M + 6; history
    # concat: register moves ~2M; warmup selects ~4
    return 4 * M + 1 + 8 + 4 * M + 6 + 2 * M + 4


def _ops_longterm_win(T, win):
    # per tap: (win+8) cmp + (win+8) mul + (win+8) add (masked sum) + 3
    # limb muls + 3 adds + 2 masks/shifts; reassembly ~6; gate select ~3
    return T * (3 * (win + 8) + 8) + 9


def _ops_lattice(p, synth):
    # m: p mul + p add + p shift; suffix/prefix scan: log2(p) shifted adds
    # over p rows; f/b updates: p mul + 3p add/shift; de/pre-emphasis ~4
    return 3 * p + int(math.ceil(math.log2(max(p, 2)))) * p + 4 * p + 4


def main() -> int:
    import jax
    import jax.numpy as jnp

    import sla_tpu  # noqa: F401
    from sla_tpu.pipeline import encode_stage1, encode_stage2

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

    import numpy as np

    from sla_tpu.kernels.pallas_filters import longterm_ring_depth
    from sla_tpu.pipeline import (
        _decode_stage_pallas,
        _encode_filters_pallas_win,
        _encode_stage2_pallas_win,
        _window_plan_dev,
    )

    def plan(pitch_np):
        ring = longterm_ring_depth(int(pitch_np[pitch_np > 0].max()) + T // 2)
        lt_win, hi8s, order = _window_plan_dev(
            np.ascontiguousarray(pitch_np, dtype=np.int32).tobytes(), T, B
        )
        return ring, lt_win, hi8s, order

    def make_encode_fused(pitch_np):
        # the round-5 fully-merged encode kernel (one HBM round trip),
        # chained K deep inside ONE jit
        ring, lt_win, hi8s, order = plan(pitch_np)
        assert lt_win > 0, "bench pitches must admit the window plan"
        pitch_dev = jnp.asarray(pitch_np)

        @jax.jit
        def chained(d, c, _pi, lt):
            def body(i, acc):
                r = _encode_filters_pallas_win(
                    d + (acc & 1), c, pitch_dev, lt, p, T, M,
                    lt_ring=ring, lt_win=lt_win, hi8s=hi8s, order=order,
                )
                return jnp.sum(r, dtype=jnp.int32)

            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        return chained, lt_win

    def make_encode_two(pitch_np):
        # the prior two-dispatch form (stage1 kernel + merged stage2),
        # mirroring the production encoder's concrete-pitch dispatch
        ring, lt_win, hi8s, order = plan(pitch_np)
        pitch_dev = jnp.asarray(pitch_np)

        @jax.jit
        def chained(d, c, _pi, lt):
            def body(i, acc):
                r1 = encode_stage1(d + (acc & 1), c, p)
                if lt_win > 0:
                    r2 = _encode_stage2_pallas_win(
                        r1, pitch_dev, lt, T, M,
                        lt_ring=ring, lt_win=lt_win, hi8s=hi8s, order=order,
                    )
                else:
                    r2 = encode_stage2(r1, pitch_dev, lt, T, M)
                return jnp.sum(r2, dtype=jnp.int32)

            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        return chained

    def make_decode(pitch_np):
        # the production decode step (_decode_stage_pallas: lag sort +
        # fused windowed cascade + unsort), chained K deep inside ONE jit
        ring, lt_win, hi8s, order = plan(pitch_np)
        pitch_dev = jnp.asarray(pitch_np)

        @jax.jit
        def chained(d, c, _pi, lt):
            def body(i, acc):
                r = _decode_stage_pallas(
                    d + (acc & 1), c, pitch_dev, lt, p, T, M,
                    lt_ring=ring, lt_win=lt_win, hi8s=hi8s, order=order,
                )
                return jnp.sum(r, dtype=jnp.int32)

            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        return chained, lt_win

    pitch_host = np.asarray(pitch)
    # second decode config: lags under 128 dispatch the smaller VMEM ring
    # (typical music pitch); fresh key so the two pitch sets are
    # independent draws
    k5 = jax.random.split(k4)[0]
    pitch_low = np.asarray(
        jax.random.randint(k5, (B,), 40, 120, dtype=jnp.int32)
    )

    enc_fused, enc_win = make_encode_fused(pitch_host)
    dec_fused, dec_win = make_decode(pitch_host)
    dec_low, dec_low_win = make_decode(pitch_low)

    results: dict[str, float] = {}
    for name, fn, pi_arg, per_call in [
        ("encode fused", enc_fused, pitch, K),
        ("encode stage1+2", make_encode_two(pitch_host), pitch, K),
        ("decode cascade ", dec_fused, pitch_host, K),
        ("decode cascade (pitch<120)", dec_low, pitch_low, K),
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
        results[name.strip()] = round(rate / 1e9, 3)
        print(f"{name}: {dt * 1e3:.2f} ms / ({B}x{L}) batch -> "
              f"{rate / 1e9:.2f} G row-samples/s", flush=True)

    # ---- roofline records (VERDICT r4 #3) ----------------------------------
    # HBM bytes/row-sample: data in + residual out (4 B each) + the tiled
    # coef/prm blocks (pp or 8 rows per TILE_L samples) + the (B,L)<->(L,B)
    # transposes XLA materializes around the kernel (one extra read+write
    # each way = 16 B). The two-dispatch encode pays the transposes AND the
    # (L,B) intermediate twice.
    pp = -(-p // 8) * 8
    small = 4.0 * (pp + 8) / 2048
    xpose = 16.0
    rl = [
        _roofline(
            "encode_fused",
            _ops_lattice(p, False) + _ops_longterm_win(T, enc_win) + _ops_lms(M),
            8.0 + small + xpose,
            results.get("encode fused"),
        ),
        _roofline(
            "encode_two_dispatch",
            _ops_lattice(p, False) + _ops_longterm_win(T, enc_win) + _ops_lms(M),
            16.0 + 2 * small + 2 * xpose,
            results.get("encode stage1+2"),
        ),
        _roofline(
            "decode_fused",
            _ops_lms(M) + _ops_longterm_win(T, dec_win) + _ops_lattice(p, True),
            8.0 + small + xpose,
            results.get("decode cascade"),
        ),
        _roofline(
            "decode_fused_low_pitch",
            _ops_lms(M) + _ops_longterm_win(T, dec_low_win) + _ops_lattice(p, True),
            8.0 + small + xpose,
            results.get("decode cascade (pitch<120)"),
        ),
    ]
    for r in rl:
        print(f"roofline {r['kernel']}: {r['vpu_ops_per_row_sample']} VPU "
              f"ops/rs, {r['hbm_bytes_per_row_sample']} B/rs -> "
              f"{r['bound']}-bound, attainable {r['attainable_g_rs']} G, "
              f"achieved {r['achieved_g_rs']} G ({r['achieved_pct']}%)",
              flush=True)

    # machine-readable artifact line (the round's driver-visible device
    # bench): one JSON object with G row-samples/s per pipeline + roofline;
    # tee it into DEVBENCH_r*.json per round
    import json

    print(json.dumps({
        "device": device.device_kind,
        "batch": [B, L],
        "unit": "G row-samples/s",
        "encode_fused": results.get("encode fused"),
        "encode_two_dispatch": results.get("encode stage1+2"),
        "decode_fused": results.get("decode cascade"),
        "decode_fused_low_pitch": results.get("decode cascade (pitch<120)"),
        "roofline": rl,
        "roofline_model": {
            "hbm_bytes_per_s": HBM_BW,
            "vpu_int32_ops_per_s": VPU_OPS,
            "note": ("v5e: 8x128 VPU lanes x 4 ALUs x ~0.94 GHz; ops are "
                     "static per-sample counts from the kernel formulas, "
                     "bytes include the layout transposes around the "
                     "kernel"),
        },
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
