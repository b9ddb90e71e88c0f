#!/usr/bin/env python
"""Streaming-decoder throughput: drive StreamingDecoder over a 60 s CD
stereo preset-2 stream at simulated 120 Hz ticks (the CLI `-s` loop,
main.c:278-423 shape) and report Msamples/s, best of N foreground runs.

    python tools/measure_streaming.py [repeats] [--seconds S]
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import sla_tpu as sla  # noqa: E402
from sla_tpu.constants import SLA_HEADER_SIZE
from sla_tpu.decoder import DecoderConfig, decode_header  # noqa: E402
from sla_tpu.streaming import StreamingDecoder, StreamingDecoderConfig  # noqa: E402


def make_stream(seconds: int, channels: int = 2) -> tuple[bytes, np.ndarray]:
    rng = np.random.default_rng(7)
    n = 44100 * seconds
    sig = 0.3 * np.sin(2 * np.pi * 440 * np.arange(n) / 44100.0)
    noise = np.stack(
        [np.convolve(rng.normal(0, 0.02, n), np.ones(8) / 8, "same")
         for _ in range(channels)]
    )
    gains = np.linspace(1.0, 0.7, channels)[:, None]
    pcm = np.clip((sig[None] * gains + noise) * 32767, -32768, 32767).astype(np.int32) << 16
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(channels, 16, 44100))
    import dataclasses
    ep = sla.PRESETS[2]
    if channels != 2:
        ep = dataclasses.replace(ep, ch_process_method=sla.ChannelProcessMethod.NONE)
    enc.set_encode_parameter(ep)
    return enc.encode_whole(pcm), pcm


def run_once(blob: bytes, pcm: np.ndarray) -> float:
    header, _ = decode_header(blob)
    wf = header.wave_format
    sd = StreamingDecoder(
        StreamingDecoderConfig(
            core=DecoderConfig(enable_crc_check=True),
            decode_interval_hz=120.0,
            max_bit_per_sample=wf.bit_per_sample,
        )
    )
    sd.set_wave_format(wf)
    sd.set_encode_parameter(header.encode_param)
    out = np.zeros((wf.num_channels, header.num_samples), dtype=np.int32)
    total = header.num_samples
    pos, done = SLA_HEADER_SIZE, 0
    t0 = time.perf_counter()
    while done < total:
        need = sd.estimate_minimum_necessary_data_size()
        if pos < len(blob) and sd.remaining_data_size() < need:
            take = min(need, len(blob) - pos)
            sd.append_data_fragment(blob[pos : pos + take])
            pos += take
        n = sd.decode_into(out, done, max_samples=total - done)
        if n == 0:
            if pos >= len(blob):
                break
            take = min(need, len(blob) - pos)
            sd.append_data_fragment(blob[pos : pos + take])
            pos += take
        done += n
        sd.collect_data_fragments()
    dt = time.perf_counter() - t0
    assert done == header.num_samples, "streaming decode ended early"
    assert np.array_equal(out, pcm), "streaming round-trip mismatch"
    return dt


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    seconds = 60
    if "--seconds" in sys.argv:
        seconds = int(sys.argv[sys.argv.index("--seconds") + 1])
    channels = 2
    if "--channels" in sys.argv:
        channels = int(sys.argv[sys.argv.index("--channels") + 1])
    blob, pcm = make_stream(seconds, channels)
    samples = pcm.size
    best = min(run_once(blob, pcm) for _ in range(repeats))
    print(
        f"Streaming decode {seconds}s {channels}ch 44.1kHz preset2 @120Hz ticks: "
        f"{samples / best / 1e6:.2f} Msps (best of {repeats}, {best:.3f}s, "
        f"{samples / 44100 / channels / best:.1f}x realtime)"
    )


if __name__ == "__main__":
    main()
