#!/usr/bin/env python
"""Corruption fuzzer: mutate valid streams and assert the decoder always
terminates with either correct-shaped output or a structured SLAError —
never a crash, hang, or native out-of-bounds write. Run from the repo root:

    python tools/fuzz_corruption.py [count] [seed]

Mutations: single/multi bit flips, byte stomps, truncations, duplicated and
deleted spans, header-field rewrites with re-stamped CRCs (so corruption
reaches the deeper parsers), and random tails. Exercised with CRC checking
both on and off, plus the streaming decoder fed the mutant in fragments.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import sla_tpu as sla  # noqa: E402
from sla_tpu.crc16 import crc16  # noqa: E402
from sla_tpu.constants import SLA_HEADER_SIZE
from sla_tpu.errors import SLAError  # noqa: E402
from test_encode_decode import gen_wave  # noqa: E402


def make_stream(rng) -> bytes:
    kind = rng.choice(["sine", "chirp", "noise", "gauss"])
    # weighted toward stereo; 3..8 channels drive the multichannel vector
    # decode lanes through the corrupt-input parsers
    ch = int(rng.choice([1, 2, 2, 2, 3, 6, 8]))
    width = int(rng.choice([16, 16, 24]))
    n = int(rng.integers(4000, 40000))
    pcm = gen_wave(str(kind), n, ch, width, 0, seed=int(rng.integers(1 << 30)))
    if rng.random() < 0.3:
        pcm[:, n // 3 : n // 2] = 0  # silent block
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(ch, width, 44100))
    ep = sla.PRESETS[2 if ch == 2 else 0]
    if ch != 2:
        ep = sla.EncodeParameter(
            ep.parcor_order, ep.longterm_order, ep.lms_order_per_filter,
            sla.ChannelProcessMethod.NONE, ep.window_function_type,
            ep.max_num_block_samples,
        )
    enc.set_encode_parameter(ep)
    return enc.encode_whole(pcm)


def mutate(blob: bytes, rng) -> bytes:
    b = bytearray(blob)
    kind = rng.integers(0, 7)
    if kind == 0:  # random bit flips
        for _ in range(int(rng.integers(1, 9))):
            i = int(rng.integers(0, len(b)))
            b[i] ^= 1 << int(rng.integers(0, 8))
    elif kind == 1:  # byte stomp
        i = int(rng.integers(0, len(b)))
        w = int(rng.integers(1, 64))
        for j in range(i, min(i + w, len(b))):
            b[j] = int(rng.integers(0, 256))
    elif kind == 2:  # truncation
        b = b[: int(rng.integers(1, len(b)))]
    elif kind == 3:  # duplicated span
        i = int(rng.integers(0, len(b)))
        w = int(rng.integers(1, 256))
        b = b[:i] + b[i : i + w] + b[i:]
    elif kind == 4:  # deleted span
        i = int(rng.integers(0, len(b)))
        w = int(rng.integers(1, 256))
        b = b[:i] + b[i + w :]
    elif kind == 5:  # header-field rewrite with re-stamped CRC: reaches the
        # deeper parsers instead of tripping the header CRC check
        if len(b) >= SLA_HEADER_SIZE:
            off = int(rng.integers(10, SLA_HEADER_SIZE))
            b[off] = int(rng.integers(0, 256))
            b[8:10] = crc16(bytes(b[10:SLA_HEADER_SIZE])).to_bytes(2, "big")
    else:  # random tail
        b = b + bytes(rng.integers(0, 256, int(rng.integers(1, 512)), dtype=np.uint8))
    return bytes(b)


def drive(mutant: bytes) -> None:
    for crc in (True, False):
        dec = sla.Decoder(sla.DecoderConfig(enable_crc_check=crc))
        try:
            header, out = dec.decode_whole(mutant)
            assert out.shape[0] >= 1 and out.dtype == np.int32
        except (SLAError, ValueError, OverflowError):
            pass
    # random-access window decode over the mutant
    try:
        _, win = sla.Decoder().decode_range(mutant, 3000, 5000)
        assert win.dtype == np.int32
    except (SLAError, ValueError, OverflowError):
        pass
    # salvage decode: must terminate with structured segments or an error
    try:
        _, segs = sla.Decoder().decode_salvage(mutant)
        for seg in segs:
            assert seg.pcm.dtype == np.int32
    except (SLAError, ValueError, OverflowError):
        pass
    # streaming decoder, fragment-fed
    from sla_tpu.decoder import DecoderConfig
    from sla_tpu.format import decode_header
    from sla_tpu.streaming import StreamingDecoder, StreamingDecoderConfig

    try:
        header, _ = decode_header(mutant)
        sd = StreamingDecoder(
            StreamingDecoderConfig(
                core=DecoderConfig(), decode_interval_hz=120.0,
                # width-matched: a fixed 16 made every 24-bit base stream
                # skip streaming coverage via EXCEED_HANDLE_CAPACITY
                max_bit_per_sample=max(header.wave_format.bit_per_sample, 8),
            )
        )
        sd.set_wave_format(header.wave_format)
        sd.set_encode_parameter(header.encode_param)
        done = 0
        for pos in range(SLA_HEADER_SIZE, min(len(mutant), 20000), 997):
            sd.append_data_fragment(mutant[pos : pos + 997])
            chunk = sd.decode()
            done += chunk.shape[1]
            sd.collect_data_fragments()
            if done > header.num_samples:
                break
    except (SLAError, ValueError, OverflowError):
        # NOT AssertionError: an internal assert tripping on a mutant is
        # exactly the crash class this fuzzer exists to surface
        pass


def main() -> int:
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)
    streams = [make_stream(rng) for _ in range(6)]
    for i in range(count):
        mutant = mutate(streams[i % len(streams)], rng)
        drive(mutant)
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{count} mutants survived", flush=True)
    print(f"{count}/{count} mutants: no crash, no hang, structured errors only")
    return 0


if __name__ == "__main__":
    sys.exit(main())
