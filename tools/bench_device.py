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
# v5e int32 lane-ops/s: 8x128 lanes x 4 ALUs x ~1.5 GHz. The clock falls
# out of the published chip peak (197 bf16 TFLOPs / (4 MXUs x 128x128 x 2
# flops) = 1.50 GHz); the previous 0.94 GHz figure made the measured wide
# cascades exceed "attainable", which is how it was caught.
VPU_OPS = 6.14e12


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


def _ops_cascade(p, T, M, win, wide, stages=("lattice", "longterm", "lms")):
    """Static VPU lane-ops per row-sample, derived from the kernel
    structure (pallas_filters.py). Ops on (R, TB) tiles cost their row
    count; the NARROW kernels run row-vector (1, TB) state ops (LMS
    acc/pred/out/step, lattice out, emphasis) at 1/8 sublane utilization
    — cost 8 lane-rows each — while the WIDE kernels pack 8 row-groups
    per vector register and amortize the same ops to cost 1. The p-row
    and M-row tiles are fully utilized in both forms. The window align
    runs once per 8-sample group in both forms (barrel-shift passes over
    ~2*(win+8) + nbits*(T+8) rows, ~2 ops/row)."""
    row = 1 if wide else 8
    ops = 0.0
    if "longterm" in stages:
        nbits = max(1, (win + 8 - 1).bit_length())
        ops += (2.0 * (win + 8) + 2.0 * nbits * (T + 8)) / 8.0  # align
        ops += 9 * T + 7 * row  # limb extract+mul+add per tap; reassembly
    if "lms" in stages:
        lg = max(1, int(math.ceil(math.log2(max(M, 2)))))
        ops += (4 * M          # two dot-product multiplies
                + 2 * M * lg   # slot/tree reduces
                + 8 * M        # coef updates + signs + history shifts
                + 12 * row)    # acc/pred/out/mag/step row-vector ops
    if "lattice" in stages:
        lg = max(1, int(math.ceil(math.log2(max(p, 2)))))
        ops += (9 * p + p * lg  # m, f, b_hi updates + cumsum/suffix scan
                + 6 * row)      # out row + pre/de-emphasis
    return ops + 4 * row  # loop/ring bookkeeping


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

    L, p, T, M = 12288, 16, 1, 8
    BN, BW = 256, 2048  # narrow-cell batch (r04 continuity) / wide-cell batch

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
        _window_plan_auto,
    )

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def batch_for(B):
        data = jax.random.randint(k1, (B, L), -30000, 30000, dtype=jnp.int32)
        coef = jax.random.randint(k2, (B, p), -25000, 25000, dtype=jnp.int32)
        ltm = jax.random.randint(k4, (B, T), -20000, 20000, dtype=jnp.int32) << 16
        return data, coef, ltm

    def plan(pitch_np, B):
        ring = longterm_ring_depth(int(pitch_np[pitch_np > 0].max()) + T // 2)
        wide, lt_win, hi8s, order = _window_plan_auto(pitch_np, T, B, L)
        return ring, wide, lt_win, hi8s, order

    def make_encode_fused(pitch_np, B):
        # the fully-merged encode kernel (one HBM round trip); the plan
        # picks the wide sublane-batched form for 1024-row-aligned batches
        ring, wide, lt_win, hi8s, order = plan(pitch_np, B)
        assert lt_win > 0, "bench pitches must admit the window plan"
        pitch_dev = jnp.asarray(pitch_np)

        @jax.jit
        def chained(d, c, lt):
            def body(i, acc):
                r = _encode_filters_pallas_win(
                    d + (acc & 1), c, pitch_dev, lt, p, T, M,
                    lt_ring=ring, lt_win=lt_win, hi8s=hi8s, order=order,
                    wide=wide,
                )
                return jnp.sum(r, dtype=jnp.int32)

            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        return chained, wide, lt_win

    def make_encode_two(pitch_np, B):
        # the production encoder's two-dispatch form (stage1 lattice kernel
        # + merged stage2 — pitch analysis sits between them in the real
        # pipeline); both stages pick their wide forms by shape/plan
        ring, wide, lt_win, hi8s, order = plan(pitch_np, B)
        pitch_dev = jnp.asarray(pitch_np)

        @jax.jit
        def chained(d, c, lt):
            def body(i, acc):
                r1 = encode_stage1(d + (acc & 1), c, p)
                if lt_win > 0:
                    r2 = _encode_stage2_pallas_win(
                        r1, pitch_dev, lt, T, M,
                        lt_ring=ring, lt_win=lt_win, hi8s=hi8s, order=order,
                        wide=wide,
                    )
                else:
                    r2 = encode_stage2(r1, pitch_dev, lt, T, M)
                return jnp.sum(r2, dtype=jnp.int32)

            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        return chained, wide, lt_win

    def make_decode(pitch_np, B):
        # the production decode step (_decode_stage_pallas: lag sort +
        # fused windowed cascade + unsort), chained K deep inside ONE jit
        ring, wide, lt_win, hi8s, order = plan(pitch_np, B)
        pitch_dev = jnp.asarray(pitch_np)

        @jax.jit
        def chained(d, c, lt):
            def body(i, acc):
                r = _decode_stage_pallas(
                    d + (acc & 1), c, pitch_dev, lt, p, T, M,
                    lt_ring=ring, lt_win=lt_win, hi8s=hi8s, order=order,
                    wide=wide,
                )
                return jnp.sum(r, dtype=jnp.int32)

            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        return chained, wide, lt_win

    def pitches_for(B, lo=40, hi=200, key=k3):
        return np.asarray(jax.random.randint(key, (B,), lo, hi, dtype=jnp.int32))

    # second decode config: lags under 128 dispatch the smaller VMEM ring
    # (typical music pitch); fresh key so the two pitch sets are
    # independent draws
    k5 = jax.random.split(k4)[0]

    cells = []  # (cell_name, B, maker, pitch)
    for B, tag in ((BN, ""), (BW, "_wide")):
        ph = pitches_for(B)
        cells.append((f"encode_fused{tag}", B, make_encode_fused, ph))
        cells.append((f"encode_stage12{tag}", B, make_encode_two, ph))
        cells.append((f"decode_fused{tag}", B, make_decode, ph))
        if tag == "":
            cells.append((
                "decode_fused_low_pitch", B, make_decode,
                pitches_for(B, 40, 120, k5),
            ))

    results: dict[str, float] = {}
    wins: dict[str, tuple[bool, int]] = {}
    for name, B, maker, ph in cells:
        data, coef, ltm = batch_for(B)
        fn, wide, lt_win = maker(ph, B)
        wins[name] = (wide, lt_win)
        # warm the exact chained pattern below: compiles both shapes and
        # absorbs the tunnel's first-dispatch stall. On tunneled runtimes
        # block_until_ready can return before the device finishes — only a
        # host fetch truly synchronizes, hence np.asarray.
        acc = jnp.int32(0)
        for _ in range(3):
            acc = fn(data + (acc & 1), coef, ltm)
        np.asarray(acc)
        iters = 30
        t0 = time.time()
        acc = jnp.int32(0)
        for _ in range(iters):
            # chain each step through the previous result so the queue can't
            # be collapsed, then fetch the final scalar to drain it
            acc = fn(data + (acc & 1), coef, ltm)
        np.asarray(acc)
        dt = (time.time() - t0) / (iters * K)
        rate = B * L / dt
        results[name] = round(rate / 1e9, 3)
        print(f"{name} (B={B}, wide={wide}, win={lt_win}): "
              f"{dt * 1e3:.2f} ms -> {rate / 1e9:.2f} G row-samples/s",
              flush=True)

    # ---- roofline records (VERDICT r4 #3) ----------------------------------
    # HBM bytes/row-sample: data in + residual out (4 B each) + the tiled
    # coef/prm blocks (pp or 8 rows per L-tile) + the (B,L)<->(L,B)
    # transposes XLA materializes around the kernel (one extra read+write
    # each way = 16 B; the wide pack/unpack relayout adds another copy
    # each way). The two-dispatch encode pays the intermediate twice.
    pp = -(-p // 8) * 8
    small = 4.0 * (pp + 8) / 2048
    rl = []
    for name, g in results.items():
        wide, lt_win = wins[name]
        stages = (
            ("longterm", "lms") if "stage2_only" in name
            else ("lattice", "longterm", "lms")
        )
        ops = _ops_cascade(p, T, M, lt_win, wide, stages)
        xpose = 32.0 if wide else 16.0
        bytes_rs = 8.0 + small + xpose
        if "stage12" in name:  # two dispatches: intermediate + layout twice
            ops += _ops_cascade(p, 0, M, 0, wide, ())  # extra loop overhead
            bytes_rs = 16.0 + 2 * small + 2 * xpose
        rl.append(_roofline(name, ops, bytes_rs, g))
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
        "batch_narrow": [BN, L],
        "batch_wide": [BW, L],
        "unit": "G row-samples/s",
        **results,
        "roofline": rl,
        "roofline_model": {
            "hbm_bytes_per_s": HBM_BW,
            "vpu_int32_ops_per_s": VPU_OPS,
            "note": ("v5e: 8x128 VPU lanes x 4 ALUs x ~1.5 GHz (clock from "
                     "197 bf16 TFLOPs / 4 MXUs); ops are "
                     "static per-row-sample counts from the kernel "
                     "structure — row-vector (1,TB) ops cost 8 lane-rows "
                     "in the narrow kernels, 1 in the wide (sublane-"
                     "batched) ones; bytes include the layout transposes "
                     "around the kernel"),
        },
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
