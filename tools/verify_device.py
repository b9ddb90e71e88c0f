#!/usr/bin/env python
"""On-hardware Pallas identity check (run on a real TPU; CI covers the same
kernels in interpreter mode only — tests/test_pallas.py).

Asserts, with COMPILED kernels on the live device:
  1. Pallas lattice filter (predict + synthesize) == lax.scan path, bitwise.
  2. Pallas LMS filter (predict + synthesize) == lax.scan path, bitwise.
  3. A full `backend="device"` encode == `backend="host"` encode, bytewise.

Prints one summary line per check plus a BASELINE.md-ready record line.
Exit code 0 only if every check passes. Keep shapes modest: the device may
sit behind a slow tunnel (transfers are the cost, not compute).
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _probe_backend(timeout_s: int | None = None) -> bool:
    """Fail fast when the device tunnel is down: backend init on a dead
    tunnel hangs indefinitely (observed: >40 min), so probe it in a
    subprocess with a hard timeout before committing to the run.
    A HEALTHY tunneled handshake can itself take minutes (CLAUDE.md
    invariant 3), so the default is generous and SLA_TPU_PROBE_TIMEOUT
    overrides it."""
    import os as _os

    if timeout_s is None:
        try:
            timeout_s = int(_os.environ.get("SLA_TPU_PROBE_TIMEOUT", 420))
        except ValueError:
            timeout_s = 420
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    if not _probe_backend():
        print(
            "verify_device: device backend unavailable (tunnel down or "
            "init timed out) — aborting instead of hanging", file=sys.stderr,
        )
        return 2

    import jax
    import jax.numpy as jnp

    import sla_tpu as sla
    from sla_tpu.kernels.emphasis import de_emphasis, pre_emphasis
    from sla_tpu.kernels.lattice import (
        lattice_init_state,
        lattice_predict,
        lattice_synthesize,
    )
    from sla_tpu.kernels.lms import lms_init_state, lms_predict, lms_synthesize
    from sla_tpu.kernels.pallas_filters import TILE_B, TILE_L, lattice_filter_tl, lms_filter_tl

    backend = jax.default_backend()
    device = jax.devices()[0]
    print(f"backend={backend} device={device.device_kind}", flush=True)
    if backend not in ("tpu", "axon"):
        print("FAIL: not running on a TPU backend — this script verifies "
              "the compiled Mosaic path, run it on hardware")
        return 1

    rng = np.random.default_rng(0)
    B, L, p, M = TILE_B, 2 * TILE_L, 16, 8
    data = rng.integers(-30000, 30000, (B, L), dtype=np.int32)
    coef = rng.integers(-25000, 25000, (B, p), dtype=np.int32)
    ok = True
    t0 = time.time()

    # 1. lattice predict (with pre-emphasis folded) + synthesize
    emph, _ = pre_emphasis(jnp.asarray(data), jnp.zeros((B,), jnp.int32))
    ref_pred, _ = lattice_predict(emph, jnp.asarray(coef), lattice_init_state(B, p))
    got_pred = np.asarray(
        lattice_filter_tl(jnp.asarray(data.T), jnp.asarray(coef.T), p, pre_emphasis=True)
    ).T
    match = np.array_equal(got_pred, np.asarray(ref_pred))
    ok &= match
    print(f"lattice predict  (compiled): {'OK' if match else 'MISMATCH'}", flush=True)

    ref_syn, _ = lattice_synthesize(
        jnp.asarray(data), jnp.asarray(coef), lattice_init_state(B, p)
    )
    ref_syn, _ = de_emphasis(ref_syn, jnp.zeros((B,), jnp.int32))
    got_syn = np.asarray(
        lattice_filter_tl(
            jnp.asarray(data.T), jnp.asarray(coef.T), p, pre_emphasis=True,
            synthesize=True,
        )
    ).T
    match = np.array_equal(got_syn, np.asarray(ref_syn))
    ok &= match
    print(f"lattice synth    (compiled): {'OK' if match else 'MISMATCH'}", flush=True)

    # 2. LMS predict + synthesize
    ref_lms, _ = lms_predict(jnp.asarray(data), lms_init_state(B, M), M)
    got_lms = np.asarray(lms_filter_tl(jnp.asarray(data.T), M)).T
    match = np.array_equal(got_lms, np.asarray(ref_lms))
    ok &= match
    print(f"lms predict      (compiled): {'OK' if match else 'MISMATCH'}", flush=True)

    ref_lms_s, _ = lms_synthesize(jnp.asarray(data), lms_init_state(B, M), M)
    got_lms_s = np.asarray(lms_filter_tl(jnp.asarray(data.T), M, synthesize=True)).T
    match = np.array_equal(got_lms_s, np.asarray(ref_lms_s))
    ok &= match
    print(f"lms synth        (compiled): {'OK' if match else 'MISMATCH'}", flush=True)

    # 2b. long-term synthesis ring kernel (per-lane variable lags), all tap
    # counts, mixed active/inactive rows
    from sla_tpu.kernels.longterm import longterm_init_state, longterm_synthesize
    from sla_tpu.kernels.pallas_filters import longterm_synth_tl

    for T in (1, 3, 5):
        pitch = rng.integers(0, 256, (B,), dtype=np.int32)
        pitch[::3] = 0
        pitch[(pitch > 0) & (pitch < T)] += T
        ltc = rng.integers(-32768, 32768, (B, T), dtype=np.int32) << 16
        ref_lt, _ = longterm_synthesize(
            jnp.asarray(data), jnp.asarray(pitch), jnp.asarray(ltc), T,
            longterm_init_state(B),
        )
        ref_lt = np.where((pitch > 0)[:, None], np.asarray(ref_lt), data)
        md = np.where(pitch > 0, pitch + T // 2, 0).astype(np.int32)
        prm = np.concatenate([md[:, None], ltc >> 16], axis=1).astype(np.int32)
        got_lt = np.asarray(
            longterm_synth_tl(jnp.asarray(data.T), jnp.asarray(prm.T), T)
        ).T
        match = np.array_equal(got_lt, ref_lt)
        ok &= match
        print(f"longterm synth T={T} (compiled): {'OK' if match else 'MISMATCH'}",
              flush=True)

    # 2c. WIDE (sublane-batched) kernels vs their narrow twins, compiled at
    # a 1024-row batch: lattice (both directions), merged stage 2, and the
    # fully-merged encode/decode cascades (round 5: 8 row-groups per
    # sublane vector, ~2.5x the narrow throughput)
    from sla_tpu.kernels.pallas_filters import (
        _WG,
        fused_encode_tl,
        fused_encode_wide_tl,
        fused_stage2_tl,
        fused_stage2_wide_tl,
        fused_synth_tl,
        fused_synth_wide_tl,
        lattice_filter_wide_tl,
        longterm_ring_depth,
    )

    BW, LW = _WG * TILE_B, TILE_L
    dataw = rng.integers(-30000, 30000, (BW, LW), dtype=np.int32)
    coefw = rng.integers(-25000, 25000, (BW, p), dtype=np.int32)
    for synth in (False, True):
        ref_w = np.asarray(
            lattice_filter_tl(jnp.asarray(dataw.T), jnp.asarray(coefw.T), p,
                              synthesize=synth)
        )
        got_w = np.asarray(
            lattice_filter_wide_tl(jnp.asarray(dataw.T), jnp.asarray(coefw.T),
                                   p, synthesize=synth)
        )
        match = np.array_equal(got_w, ref_w)
        ok &= match
        print(f"wide lattice {'synth' if synth else 'predict'} (compiled): "
              f"{'OK' if match else 'MISMATCH'}", flush=True)

    # 150..250 keeps the single 1024-row group's lag band under the
    # plan's 160 cap (the production plan would fall back narrow above it)
    pitchw = np.sort(rng.integers(150, 250, (BW,), dtype=np.int32))[::-1].copy()
    pitchw[7::41] = 0
    ltcw = rng.integers(-32768, 32768, (BW, 1), dtype=np.int32) << 16
    mdw = np.where(pitchw > 0, pitchw + 0, 0).astype(np.int64)
    prmw = np.concatenate(
        [mdw[:, None].astype(np.int32), ltcw >> 16], axis=1
    ).astype(np.int32)
    ringw = longterm_ring_depth(int(mdw.max()))

    def _plan_w(tile_rows):
        g = mdw.reshape(-1, tile_rows)
        hi8 = ((g.max(1) + 7) // 8 * 8).astype(np.int32)
        lo = np.where(g > 0, g, 1 << 30).min(1)
        lo = np.where(g.max(1) > 0, lo, 0)
        return int(-(-max(int((hi8 - lo + 1).max()), 8) // 8) * 8), hi8

    win_n, hi8_n = _plan_w(TILE_B)
    win_w, hi8_w = _plan_w(_WG * TILE_B)
    for name, narrow, wide_fn in [
        ("stage2", fused_stage2_tl, fused_stage2_wide_tl),
    ]:
        ref_w = np.asarray(narrow(
            jnp.asarray(dataw.T), jnp.asarray(prmw.T), 1, M,
            hist_d=ringw, lt_win=win_n, hi8s=jnp.asarray(hi8_n)))
        got_w = np.asarray(wide_fn(
            jnp.asarray(dataw.T), jnp.asarray(prmw.T), 1, M,
            hist_d=ringw, lt_win=win_w, hi8s=jnp.asarray(hi8_w)))
        match = np.array_equal(got_w, ref_w)
        ok &= match
        print(f"wide {name}        (compiled): {'OK' if match else 'MISMATCH'}",
              flush=True)
    for name, narrow, wide_fn in [
        ("encode cascade", fused_encode_tl, fused_encode_wide_tl),
        ("decode cascade", fused_synth_tl, fused_synth_wide_tl),
    ]:
        ref_w = np.asarray(narrow(
            jnp.asarray(dataw.T), jnp.asarray(coefw.T), jnp.asarray(prmw.T),
            p, 1, M, hist_d=ringw, lt_win=win_n, hi8s=jnp.asarray(hi8_n)))
        got_w = np.asarray(wide_fn(
            jnp.asarray(dataw.T), jnp.asarray(coefw.T), jnp.asarray(prmw.T),
            p, 1, M, hist_d=ringw, lt_win=win_w, hi8s=jnp.asarray(hi8_w)))
        match = np.array_equal(got_w, ref_w)
        ok &= match
        print(f"wide {name} (compiled): {'OK' if match else 'MISMATCH'}",
              flush=True)

    # 3. full encode, device backend vs host backend, byte equality
    n = 6 * 12288
    t = np.arange(n) / 44100.0
    sig = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(0, 1, n)
    pcm = np.stack([sig, 0.9 * sig])
    pcm = (np.clip(pcm * 32767, -32768, 32767).astype(np.int32) << 16)

    def encode(backend_name: str) -> bytes:
        enc = sla.Encoder(sla.EncoderConfig(backend=backend_name))
        enc.set_wave_format(sla.WaveFormat(2, 16, 44100))
        enc.set_encode_parameter(sla.PRESETS[2])
        return enc.encode_whole(pcm)

    blob_host = encode("host")
    blob_dev = encode("device")
    match = blob_host == blob_dev
    ok &= match
    print(f"device-vs-host encode ({len(blob_host)} bytes): "
          f"{'OK' if match else 'MISMATCH'}", flush=True)

    # 3b. the CONTRAST case: device backend with HOST entropy. Device
    # entropy is the device backend's default, so check 3 above already
    # ran the on-chip Rice path — this one pins the host-entropy pack over
    # device-computed residuals, the combination nothing else exercises.
    enc_off = sla.Encoder(sla.EncoderConfig(backend="device",
                                            device_entropy="off"))
    enc_off.set_wave_format(sla.WaveFormat(2, 16, 44100))
    enc_off.set_encode_parameter(sla.PRESETS[2])
    blob_dev_hostent = enc_off.encode_whole(pcm)
    match = blob_dev_hostent == blob_host
    ok &= match
    print(f"device-backend host-entropy encode: "
          f"{'OK' if match else 'MISMATCH'}", flush=True)

    # 4. full decode, device backend vs host backend (exercises the compiled
    # Pallas synthesis + the single-tap long-term select path on hardware)
    def decode(backend_name: str) -> np.ndarray:
        dec = sla.Decoder(sla.DecoderConfig(backend=backend_name))
        return dec.decode_whole(blob_host)[1]

    pcm_host = decode("host")
    pcm_dev = decode("device")
    match = np.array_equal(pcm_host, pcm_dev) and np.array_equal(pcm_host, pcm)
    ok &= match
    print(f"device-vs-host decode: {'OK' if match else 'MISMATCH'}", flush=True)

    # 4b. device-entropy DECODE (rice_device.rice_decode_blocks on chip):
    # the device backend defaults to it, but pin the contrast explicitly —
    # forced on-chip entropy vs forced host entropy, byte-equal PCM
    import os

    os.environ["SLA_TPU_DEVICE_ENTROPY"] = "1"
    try:
        pcm_dev_ent = decode("device")
    finally:
        del os.environ["SLA_TPU_DEVICE_ENTROPY"]
    dec_off = sla.Decoder(sla.DecoderConfig(backend="device",
                                            device_entropy="off"))
    pcm_dev_hostent = dec_off.decode_whole(blob_host)[1]
    match = (np.array_equal(pcm_dev_ent, pcm_host)
             and np.array_equal(pcm_dev_hostent, pcm_host))
    ok &= match
    print(f"device-entropy decode (on-chip Rice scan): "
          f"{'OK' if match else 'MISMATCH'}", flush=True)

    # 5. merged windowed decode cascade vs the one-hot form ON HARDWARE
    # (interpret mode cannot check Mosaic rules — CLAUDE.md invariant 6)
    import jax
    import jax.numpy as jnp

    from sla_tpu.kernels.pallas_filters import TILE_B, fused_synth_tl

    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    Bk, Lk, pk, Tk, Mk = 2 * TILE_B, 4096, 16, 3, 8
    data_t = jax.random.randint(k1, (Lk, Bk), -(1 << 20), 1 << 20, jnp.int32)
    coef_t = jax.random.randint(k2, (pk, Bk), -25000, 25000, jnp.int32)
    pitch_w = np.sort(
        rng.integers(16, 250, Bk).astype(np.int32))[::-1].copy()
    pitch_w[5::37] = 0
    mdw = np.where(pitch_w > 0, pitch_w + Tk // 2, 0).astype(np.int64)
    q15w = jax.random.randint(k3, (Tk, Bk), -32768, 32768, jnp.int32)
    prm_w = jnp.concatenate(
        [jnp.asarray(mdw.astype(np.int32))[None, :], q15w], axis=0)
    tiles = mdw.reshape(-1, TILE_B)
    hi8 = ((tiles.max(1) + 7) // 8 * 8).astype(np.int32)
    low = np.where(tiles > 0, tiles, 1 << 30).min(1)
    low = np.where(tiles.max(1) > 0, low, 0)
    winv = int(-(-max(int((hi8 - low + Tk).max()), 8) // 8) * 8)
    a = np.asarray(fused_synth_tl(data_t, coef_t, prm_w, pk, Tk, Mk,
                                  hist_d=264))
    b = np.asarray(fused_synth_tl(data_t, coef_t, prm_w, pk, Tk, Mk,
                                  hist_d=264, lt_win=winv,
                                  hi8s=jnp.asarray(hi8)))
    match = np.array_equal(a, b)
    ok &= match
    print(f"windowed vs one-hot fused decode (compiled, win={winv}): "
          f"{'OK' if match else 'MISMATCH'}", flush=True)

    # 6. fully-merged encode cascade (round 5) vs the scan chain ON HARDWARE
    from sla_tpu.pipeline import encode_filters, encode_filters_fused

    pitch_e = np.sort(rng.integers(16, 250, Bk).astype(np.int32))[::-1].copy()
    pitch_e[7::29] = 0
    ltc_e = (np.asarray(
        jax.random.randint(k3, (Bk, Tk), -32768, 32768, jnp.int32)
    ) << 16).astype(np.int32)
    data_e = np.asarray(
        jax.random.randint(k1, (Bk, Lk), -30000, 30000, jnp.int32))
    coef_e = np.asarray(jax.random.randint(k2, (Bk, pk), -25000, 25000,
                                           jnp.int32))
    fused_e = np.asarray(encode_filters_fused(
        jnp.asarray(data_e), jnp.asarray(coef_e), pitch_e,
        jnp.asarray(ltc_e), pk, Tk, Mk,
    ))
    ref_e = np.asarray(encode_filters(
        jnp.asarray(data_e), jnp.asarray(coef_e), jnp.asarray(pitch_e),
        jnp.asarray(ltc_e), pk, Tk, Mk,
    ))
    match = np.array_equal(fused_e, ref_e)
    ok &= match
    print(f"fused encode cascade vs scan chain (compiled): "
          f"{'OK' if match else 'MISMATCH'}", flush=True)

    stamp = time.strftime("%Y-%m-%d")
    status = "all bit-identical" if ok else "MISMATCH DETECTED"
    print(
        f"BASELINE-RECORD: | {stamp} | {device.device_kind} ({backend}) | "
        f"compiled Pallas lattice+LMS+longterm vs scan, fused encode+decode "
        f"cascades, device-vs-host encode+decode, device+host entropy | "
        f"{status} |"
    )
    print(f"total {time.time() - t0:.1f}s")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
