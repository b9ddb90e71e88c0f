#!/usr/bin/env python
"""Randomized byte-identity fuzzer: encode random signals with both this
framework and the reference C binary and compare streams byte-for-byte
(plus cross-decode losslessness). Run from the repo root:

    python tools/fuzz_identity.py [count] [seed] [MODE]

MODE is at most one of:
  --near-ties   adversarial partition near-tie signals only
  --optimize    every case checks the ratio-optimizing mode's contract
                (reference-decodable, lossless, never larger than seed)
  --degenerate  Levinson-collapsing signals (exact-period tones, ramps,
                DC, two-tone, square) with parcor biased to 16/24/48

Covers waveform kinds (including cancellation-heavy nyquist tones and
mixed-segment long files that stress the block partitioner), channel
layouts, bit depths, presets, sampling rates, and offset left-shifts.
"""

import pathlib
import subprocess
import sys
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import sla_tpu as sla  # noqa: E402
from sla_tpu import wavio  # noqa: E402
from test_encode_decode import gen_wave  # noqa: E402

REF = REPO / "tools" / "sla_ref"
REF_CUSTOM = REPO / "tools" / "sla_ref_custom"  # library harness (API-only params)


def mixed_segments(rng, ch, n, width):
    sig = np.zeros((ch, n))
    pos = 0
    while pos < n:
        seg = min(int(rng.integers(3000, 20000)), n - pos)
        kind = rng.integers(0, 4)
        t = np.arange(seg)
        if kind == 0:
            s = 0.4 * np.sin(2 * np.pi * t / rng.integers(30, 300))
        elif kind == 1:
            s = np.convolve(rng.normal(0, 0.1, seg), np.ones(6) / 6, "same")
        elif kind == 2:
            s = np.zeros(seg)
        else:
            s = 0.3 * np.sin(2 * np.pi * t * t / (5 * seg))
        for c in range(ch):
            sig[c, pos : pos + seg] = s * (1 - 0.1 * c)
        pos += seg
    amp = (1 << (width - 1)) - 1
    return (np.clip(sig * amp, -amp - 1, amp).astype(np.int32) << (32 - width))


def degenerate_signal(rng, ch, n, width):
    """Signals that collapse the Levinson recursion (e_vec -> 0 at low
    order makes later reflection coefficients inf/NaN/huge — only
    |auto_corr[0]| < FLT_EPSILON is guarded, SLAPredictor.c:274,301):
    perfectly predictable tones at exact integer periods, linear ramps,
    constants, and two-tap recurrences, at full-scale amplitudes so the
    quantizer sees the degenerate values rather than raw fallback."""
    amp = (1 << (width - 1)) - 1
    t = np.arange(n, dtype=np.float64)
    kind = int(rng.integers(0, 5))
    if kind == 0:  # exact-period tone: predictable by order 2
        period = int(rng.choice([4, 8, 16, 32, 64]))
        sig = np.sin(2 * np.pi * t / period)
    elif kind == 1:  # linear ramp (sawtooth): near-perfect order-1 fit
        period = int(rng.integers(64, 2048))
        sig = ((t % period) / period) * 2 - 1
    elif kind == 2:  # constant DC at random level
        sig = np.full(n, float(rng.uniform(0.1, 1.0)))
    elif kind == 3:  # sum of two exact tones: rank-4 autocorrelation
        p1, p2 = rng.choice([4, 8, 16, 32, 64], size=2, replace=False)
        sig = 0.5 * np.sin(2 * np.pi * t / p1) + 0.5 * np.cos(2 * np.pi * t / p2)
    else:  # alternating two-level square wave (nyquist-like)
        period = int(rng.choice([2, 4, 8]))
        sig = np.where((t // period) % 2 == 0, 1.0, -1.0)
    scale = float(rng.choice([1.0, 1.0, 0.9, 1.0 / 64]))
    rows = np.stack([sig * scale * (1 - 0.01 * c) for c in range(ch)])
    return np.clip(rows * amp, -amp - 1, amp).astype(np.int32) << (32 - width)


def near_tie_signal(rng, ch, n, width):
    """Adversarial partition near-ties: tile one node-delta-length pattern so
    the signal is stationary at node granularity — span costs then depend
    (almost) only on span length and many Dijkstra paths tie. Optional
    single-LSB perturbations turn exact ties into near-ties, the case where
    the fast estimator's float rounding could otherwise flip a decision."""
    delta = 1024
    t = np.arange(delta)
    kind = int(rng.integers(0, 3))
    if kind == 0:
        base = np.convolve(rng.normal(0, 0.1, delta), np.ones(4) / 4, "same")
    elif kind == 1:
        base = 0.4 * np.sin(2 * np.pi * t * float(rng.integers(1, 16)) / delta)
    else:
        base = ((t % 256) - 128) / 400.0
    reps = (n + delta - 1) // delta
    sig = np.tile(base, reps)[:n].copy()
    if rng.random() < 0.6:
        for _ in range(int(rng.integers(1, 5))):
            sig[int(rng.integers(0, n))] += 1.0 / (1 << (width - 1))
    amp = (1 << (width - 1)) - 1
    rows = np.stack([sig * (1 - 0.05 * c) for c in range(ch)])
    return np.clip(rows * amp, -amp - 1, amp).astype(np.int32) << (32 - width)


def main():
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    known = {"--near-ties", "--optimize", "--degenerate"}
    unknown = [f for f in flags if f not in known]
    if unknown:
        print(f"unknown flag(s): {' '.join(unknown)} (known: "
              f"{' '.join(sorted(known))})", file=sys.stderr)
        return 2
    if len(flags) > 1:
        print(f"pick at most one mode flag, got: {' '.join(flags)}",
              file=sys.stderr)
        return 2
    near_ties = "--near-ties" in flags
    opt_only = "--optimize" in flags
    degenerate = "--degenerate" in flags
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    count = int(args[0]) if len(args) > 0 else 50
    seed = int(args[1]) if len(args) > 1 else 0
    rng = np.random.default_rng(seed)
    tmp_ctx = tempfile.TemporaryDirectory()
    tmp = pathlib.Path(tmp_ctx.name)
    fails = []
    skipped = 0
    compared = 0
    compared_opt = 0
    for i in range(count):
        ch = int(rng.choice([1, 2, 2, 4, 6, 8]))
        width = int(rng.choice([8, 16, 16, 24]))
        mode = int(rng.integers(0, 5))
        rate = int(rng.choice([8000, 22050, 44100, 48000, 96000, 192000]))
        if degenerate:
            ch = int(rng.choice([1, 2, 4]))
            n = int(rng.integers(8192, 40000))
            pcm = degenerate_signal(rng, ch, n, width)
        elif near_ties:
            ch = int(rng.choice([1, 2]))
            width = 16
            n = int(rng.integers(4096, 49152))
            pcm = near_tie_signal(rng, ch, n, width)
        elif rng.random() < 0.25:
            n = int(rng.integers(60000, 180000))
            pcm = mixed_segments(rng, ch, n, width)
        else:
            kind = str(rng.choice(
                ["sine", "noise", "chirp", "gauss", "nyquist", "constant", "silence"]))
            n = int(rng.integers(1500, 45000))
            lshift = int(rng.choice([0, 0, 4, 8])) if width >= 16 else 0
            pcm = gen_wave(kind, n, ch, width, lshift, seed=seed * 1000 + i)
        wavio.write_wav(str(tmp / "i.wav"), wavio.WavFile(ch, rate, width, pcm))
        # ~1 in 8 cases (all, with --optimize): the ratio-optimizing mode
        # (-O). The winner uses API-only parameters, so there is no
        # byte-identity oracle — the contract fuzzed here is:
        # reference-binary-decodable, lossless, and never larger than the
        # seed preset's stream.
        if opt_only or ((not near_ties) and rng.random() < 0.12):
            from sla_tpu.errors import SLAError
            from sla_tpu.optimize import optimize_encode

            wf = sla.WaveFormat(ch, width, rate)
            try:
                blob, winner = optimize_encode(pcm, wf, effort=1)
            except SLAError:
                skipped += 1  # both finalists reject (init-Rice overflow)
                continue
            compared_opt += 1
            enc = sla.Encoder()
            enc.set_wave_format(wf)
            enc.set_encode_parameter(sla.preset_parameter(2, ch))
            seed_blob = enc.encode_whole(pcm)
            (tmp / "o.sla").write_bytes(blob)
            r = subprocess.run(
                [str(REF), "-d", "-q", str(tmp / "o.sla"), str(tmp / "od.wav")],
                capture_output=True,
            )
            ref_ok = r.returncode == 0 and np.array_equal(
                wavio.read_wav(str(tmp / "od.wav")).data, pcm)
            try:
                _, out = sla.Decoder().decode_whole(blob)
                self_ok = np.array_equal(out, pcm)
            except SLAError:
                self_ok = False
            if (not ref_ok or not self_ok
                    or len(blob) > len(seed_blob)):
                fails.append((i, ch, width, "optimize", rate, pcm.shape[1],
                              ref_ok))
                keep = pathlib.Path(f"/tmp/fuzz_opt_fail_{i}")
                keep.mkdir(exist_ok=True)
                wavio.write_wav(str(keep / "i.wav"),
                                wavio.WavFile(ch, rate, width, pcm))
                (keep / "o.sla").write_bytes(blob)
                print(f"FAIL case {i} (optimize): ch={ch} width={width} "
                      f"rate={rate} n={pcm.shape[1]} ref_decodable={ref_ok} "
                      f"size {len(blob)} vs seed {len(seed_blob)} "
                      f"winner={winner} ref_stderr={r.stderr[:200]!r} "
                      f"artifacts={keep}")
            continue
        # 1 in 5 cases (1 in 3 under --near-ties): API-only encode
        # parameters through the reference LIBRARY harness (windows the
        # CLI cannot select, custom orders incl. the order-0 passthrough
        # lattice). In near-ties mode this stresses the last-ulp
        # Hann/Blackman/Vorbis window alignment against partition ties.
        custom = REF_CUSTOM.exists() and rng.random() < (
            1 / 3 if near_ties else 0.6 if degenerate else 0.2)
        params = None
        if custom:
            window = int(rng.choice([2, 3, 4]))  # HANN, BLACKMAN, VORBIS
            # degenerate content collapses Levinson at high order — bias
            # there so the inf/NaN/huge coefficient paths are the ones hit
            parcor = int(rng.choice([16, 24, 48] if degenerate
                                    else [0, 4, 12, 16, 24, 48]))
            longterm = int(rng.choice([0, 1, 3, 5]))
            lms = int(rng.choice([0, 4, 8, 16]))
            ms = 1 if (ch == 2 and rng.random() < 0.5) else 0
            maxblk = int(rng.choice([4096, 12288, 16384]))
            r = subprocess.run(
                [str(REF_CUSTOM), str(window), str(parcor), str(longterm),
                 str(lms), str(ms), str(maxblk),
                 str(tmp / "i.wav"), str(tmp / "r.sla")],
                capture_output=True,
            )
            params = (window, parcor, longterm, lms, ms, maxblk)
            ep = sla.EncodeParameter(
                parcor, longterm, lms,
                sla.ChannelProcessMethod.STEREO_MS if ms
                else sla.ChannelProcessMethod.NONE,
                sla.WindowFunctionType(window), maxblk,
            )
        else:
            r = subprocess.run(
                [str(REF), "-e", "-q", "-m", str(mode), str(tmp / "i.wav"), str(tmp / "r.sla")],
                capture_output=True,
            )
            p = sla.PRESETS[mode]
            chm = p.ch_process_method if ch == 2 else sla.ChannelProcessMethod.NONE
            ep = sla.EncodeParameter(p.parcor_order, p.longterm_order,
                                     p.lms_order_per_filter, chm,
                                     p.window_function_type, p.max_num_block_samples)
        if r.returncode != 0:
            skipped += 1
            continue
        ref_blob = (tmp / "r.sla").read_bytes()
        compared += 1
        enc = sla.Encoder()
        enc.set_wave_format(sla.WaveFormat(ch, width, rate))
        enc.set_encode_parameter(ep)
        from sla_tpu.errors import SLAError

        try:
            blob = enc.encode_whole(pcm)
        except SLAError:
            # our encoder rejects reference-DEFECT inputs (init Rice
            # parameter overflows its field and the reference silently
            # corrupts — PARITY.md known deviations). The rejection is only
            # legitimate when the reference's own round trip is broken:
            r2 = subprocess.run(
                [str(REF), "-d", "-q", str(tmp / "r.sla"), str(tmp / "rd.wav")],
                capture_output=True,
            )
            ref_lossless = (
                r2.returncode == 0
                and np.array_equal(wavio.read_wav(str(tmp / "rd.wav")).data, pcm)
            )
            if ref_lossless:
                fails.append((i, ch, width, mode, rate, pcm.shape[1], "rejected"))
                print(f"FAIL case {i}: our encoder rejected a case the "
                      f"reference round-trips losslessly")
            continue
        dec = sla.Decoder()
        try:
            _, out = dec.decode_whole(ref_blob)
            lossless = np.array_equal(out, pcm)
        except SLAError:
            lossless = False
        if blob != ref_blob or not lossless:
            fails.append((i, ch, width, mode, rate, pcm.shape[1], lossless))
            cfg = (f"custom={params}" if custom
                   else f"mode={mode}")
            print(f"FAIL case {i}: ch={ch} width={width} {cfg} rate={rate} "
                  f"n={pcm.shape[1]} lossless={lossless}")
    extra = f" ({skipped} configs the reference rejected)" if skipped else ""
    opt_fails = sum(1 for f in fails if f[3] == "optimize")
    id_fails = len(fails) - opt_fails
    opt = (f" + {compared_opt - opt_fails}/{compared_opt} optimize-mode "
           f"contracts held" if compared_opt else "")
    print(f"{compared - id_fails}/{compared} byte-identical + "
          f"cross-decode lossless{extra}{opt}")
    if compared == 0 and compared_opt == 0:
        print("VACUOUS RUN: zero comparisons executed")
        return 1
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
