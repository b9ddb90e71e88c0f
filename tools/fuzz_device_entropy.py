#!/usr/bin/env python
"""Device-entropy decode differential fuzzer.

Asserts that a decode with the on-chip entropy path FORCED
(SLA_TPU_DEVICE_ENTROPY=1, backend='device') is sample-exact against the
host coder on the same stream — including the straggler machinery: a
minority of static-Golomb blocks host-decodes and scatters into the
device batch, and payload corruption must flag the block so its host
re-decode reproduces the reference's deterministic garbage (CRC off).

    python tools/fuzz_device_entropy.py [count] [seed]

Shapes are held fixed (stereo, 16-bit, preset 2, 12288-sample blocks) so
rice_decode_blocks compiles once per (B, W) bucket instead of per case.
Content per case mixes loud noise/chirp spans with quiet (Golomb-branch)
spans at random positions; half the cases then corrupt 1-3 payload bytes.
"""

from __future__ import annotations

import os
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import sla_tpu as sla  # noqa: E402
from sla_tpu.errors import SLAError  # noqa: E402
from test_encode_decode import gen_wave  # noqa: E402


def make_pcm(rng) -> np.ndarray:
    """Stereo stream of 4-9 block-sized spans, each independently loud
    (recursive-Rice branch) or quiet (static-Golomb branch)."""
    spans = []
    for _ in range(int(rng.integers(4, 10))):
        n = int(rng.integers(6000, 16000))
        if rng.random() < 0.4:  # quiet span: Golomb-branch blocks
            spans.append(
                (rng.integers(-3, 4, size=(2, n)).astype(np.int32) << 16)
            )
        else:
            kind = str(rng.choice(["noise", "chirp", "sine", "gauss"]))
            spans.append(gen_wave(kind, n, 2, 16, 0, seed=int(rng.integers(1 << 30))))
    return np.concatenate(spans, axis=1)


def drive(blob: bytes, corrupt: bool) -> None:
    host = dev = None
    host_err = dev_err = None
    cfg_host = sla.DecoderConfig(enable_crc_check=not corrupt)
    try:
        host = sla.Decoder(cfg_host).decode_whole(blob)[1]
    except (SLAError, ValueError, OverflowError) as e:
        host_err = type(e)
    os.environ["SLA_TPU_DEVICE_ENTROPY"] = "1"
    try:
        cfg = sla.DecoderConfig(
            enable_crc_check=not corrupt, backend="device"
        )
        try:
            dev = sla.Decoder(cfg).decode_whole(blob)[1]
        except (SLAError, ValueError, OverflowError) as e:
            dev_err = type(e)
    finally:
        del os.environ["SLA_TPU_DEVICE_ENTROPY"]
    assert host_err == dev_err, (host_err, dev_err)
    if host is not None:
        assert np.array_equal(host, dev), "device-entropy decode diverged"


def main() -> int:
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)
    for i in range(count):
        pcm = make_pcm(rng)
        enc = sla.Encoder()
        enc.set_wave_format(sla.WaveFormat(2, 16, 44100))
        enc.set_encode_parameter(sla.PRESETS[2])
        blob = enc.encode_whole(pcm)
        corrupt = i % 2 == 1
        if corrupt:
            # payload bytes only (flipping a block HEADER makes scan_blocks
            # raise on both sides before the device-entropy path runs, so
            # the case would test nothing): scan the intact stream and pick
            # byte offsets inside COMPRESSDATA payload regions
            dec0 = sla.Decoder()
            header = dec0._open_stream(blob)
            blocks = dec0.scan_blocks(blob, header.num_samples)
            spans = [
                (b_.payload_bit_offset // 8 + 1, b_.data_offset + b_.block_size)
                for b_ in blocks
                if b_.block_type == sla.BlockDataType.COMPRESSDATA
                and b_.data_offset + b_.block_size > b_.payload_bit_offset // 8 + 2
            ]
            b = bytearray(blob)
            for _ in range(int(rng.integers(1, 4))):
                lo, hi = spans[int(rng.integers(0, len(spans)))]
                j = int(rng.integers(lo, hi))
                b[j] ^= 1 << int(rng.integers(0, 8))
            blob = bytes(b)
        drive(blob, corrupt)
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{count} cases identical", flush=True)
    print(f"{count}/{count}: device-entropy decode == host decode (PCM and errors)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
