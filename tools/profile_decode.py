#!/usr/bin/env python
"""Per-stage decode profile on the BASELINE weak rows (5.1 preset-2,
hi-res preset-4). Prints Decoder.stage_times plus wall throughput,
best-of-N. Usage: python tools/profile_decode.py [repeats]."""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import sla_tpu as sla  # noqa: E402

REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def profile(name, pcm, width, rate, mode):
    ch, n = pcm.shape
    ep = sla.PRESETS[mode]
    if ch != 2:
        ep = sla.EncodeParameter(
            ep.parcor_order, ep.longterm_order, ep.lms_order_per_filter,
            sla.ChannelProcessMethod.NONE, ep.window_function_type,
            ep.max_num_block_samples,
        )
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(ch, width, rate))
    enc.set_encode_parameter(ep)
    blob = enc.encode_whole(pcm)
    dec = sla.Decoder()
    dec.decode_whole(blob)  # warm
    best_t, best_st = None, None
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        dec.decode_whole(blob)
        t = time.perf_counter() - t0
        if best_t is None or t < best_t:
            best_t, best_st = t, dict(dec.stage_times)
    s = ch * n
    other = best_t - sum(best_st.values())
    stages = " ".join(f"{k} {v*1e3:.1f}ms" for k, v in best_st.items())
    print(f"{name}: {s/best_t/1e6:.1f} Msps wall {best_t*1e3:.1f}ms | "
          f"{stages} other {other*1e3:.1f}ms")


def main():
    rng = np.random.default_rng(7)

    n3 = 48000 * 15
    chs = [
        np.clip(
            (0.3 * np.sin(2 * np.pi * (200 + 150 * c) * np.arange(n3) / 48000.0)
             + np.convolve(rng.normal(0, 0.01, n3), np.ones(8) / 8, "same"))
            * (2**23 - 1), -(2**23), 2**23 - 1,
        )
        for c in range(6)
    ]
    fx = np.stack(chs).astype(np.int32) << 8
    profile("5.1 48k/24 15s preset2", fx, 24, 48000, 2)

    n2 = 96000 * 20
    sig2 = 0.4 * np.sin(2 * np.pi * 1000 * np.arange(n2) / 96000.0) + 0.1 * np.sin(
        2 * np.pi * 7000 * np.arange(n2) / 96000.0
    )
    noise2 = np.stack(
        [np.convolve(rng.normal(0, 0.01, n2), np.ones(16) / 16, "same") for _ in range(2)]
    )
    hr = (
        np.clip((sig2[None] * np.array([[1], [0.8]]) + noise2) * (2**23 - 1),
                -(2**23), 2**23 - 1).astype(np.int32) << 8
    )
    profile("Hi-res 96k/24 stereo 20s preset4", hr, 24, 96000, 4)

    n = 44100 * 60
    sig = 0.3 * np.sin(2 * np.pi * 440 * np.arange(n) / 44100.0)
    noise = np.stack(
        [np.convolve(rng.normal(0, 0.02, n), np.ones(8) / 8, "same") for _ in range(2)]
    )
    cd = (np.clip((sig[None] + noise) * 32767, -32768, 32767).astype(np.int32) << 16)
    profile("CD 44.1k/16 stereo 60s preset2", cd, 16, 44100, 2)


if __name__ == "__main__":
    main()
