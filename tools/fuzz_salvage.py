#!/usr/bin/env python
"""Salvage-quality fuzzer: damage 1-3 blocks of a valid stream and assert
`Decoder.decode_salvage` recovers every OTHER block bit-exactly (exact
oracle: the concatenation of all intact blocks' PCM, in stream order).
Run from the repo root:

    python tools/fuzz_salvage.py [count] [seed]

The no-crash guarantee on arbitrary mutants is tools/fuzz_corruption.py's
job; this checks the RECOVERY guarantee (decoder.py decode_salvage: each
segment's pcm is bit-exact with the originally encoded blocks it covers,
and the reference aborts at the first corrupt block — SLADecoder.c:660-732
— so everything after the damage is salvage-only surface).
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import sla_tpu as sla  # noqa: E402
from sla_tpu.constants import SLA_HEADER_SIZE  # noqa: E402
from sla_tpu.errors import SLAError  # noqa: E402
from test_encode_decode import gen_wave  # noqa: E402


def main() -> int:
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)
    fails = 0
    checked = 0
    skipped = 0
    for i in range(count):
        ch = int(rng.choice([1, 2, 2, 6]))
        width = int(rng.choice([8, 16, 24]))
        mode = int(rng.integers(0, 5))
        kind = str(rng.choice(["sine", "noise", "chirp", "gauss", "constant"]))
        n = int(rng.integers(20000, 90000))
        pcm = gen_wave(kind, n, ch, width, 0, seed=seed * 1000 + i)
        enc = sla.Encoder()
        enc.set_wave_format(sla.WaveFormat(ch, width, 44100))
        p = sla.PRESETS[mode]
        chm = p.ch_process_method if ch == 2 else sla.ChannelProcessMethod.NONE
        enc.set_encode_parameter(
            sla.EncodeParameter(p.parcor_order, p.longterm_order,
                                p.lms_order_per_filter, chm,
                                p.window_function_type, p.max_num_block_samples))
        try:
            blob = enc.encode_whole(pcm)
        except SLAError:
            skipped += 1
            continue

        # map the block layout (header parse only — no payload decode)
        dec = sla.Decoder()
        header = sla.decode_header(blob)[0]
        dec.set_wave_format(header.wave_format)
        dec.set_encode_parameter(header.encode_param)
        blocks = dec.scan_blocks(blob, header.num_samples)
        if len(blocks) < 3:
            skipped += 1
            continue

        # stomp byte runs inside 1-3 middle blocks' PAYLOADs (past each
        # header region so the following sync-hunt anchors stay clean)
        n_gaps = int(rng.integers(1, min(4, len(blocks) - 1)))
        damaged = sorted(
            rng.choice(np.arange(1, len(blocks) - 1), size=n_gaps,
                       replace=False).tolist())
        offsets = np.cumsum([SLA_HEADER_SIZE]
                            + [b.block_size for b in blocks[:-1]])
        mut = bytearray(blob)
        stomped = []
        for k in damaged:
            blk = blocks[k]
            lo = int(offsets[k]) + min(64, blk.block_size - 1)
            hi = int(offsets[k]) + blk.block_size
            if hi - lo < 4:
                continue
            start = int(rng.integers(lo, hi - 3))
            for j in range(start, min(start + int(rng.integers(1, 16)), hi)):
                mut[j] ^= int(rng.integers(1, 256))
            stomped.append(k)
        if not stomped:
            skipped += 1
            continue
        damaged = stomped
        mut = bytes(mut)

        # skip the ~2^-16 CRC-collision mutants (corrupt block validates)
        try:
            _, whole = sla.Decoder().decode_whole(mut)
            skipped += 1  # collided or damage was a no-op for the decoder
            continue
        except SLAError:
            pass

        _, segments = sla.Decoder().decode_salvage(mut)
        got = np.concatenate([s.pcm for s in segments], axis=1) \
            if segments else np.empty((ch, 0), dtype=np.int32)
        # oracle: exactly the intact blocks' PCM, in stream order (blocks
        # are independent and a damaged block is dropped whole — CRC gates
        # partial decodes out)
        pos = np.cumsum([0] + [b.num_samples for b in blocks])
        expected = np.concatenate(
            [pcm[:, pos[k] : pos[k + 1]] for k in range(len(blocks))
             if k not in damaged], axis=1)
        checked += 1
        ok = (
            segments
            and segments[0].sample_offset == 0
            and np.array_equal(got, expected)
        )
        if not ok:
            fails += 1
            shapes = [s.pcm.shape[1] for s in segments]
            print(f"FAIL case {i}: ch={ch} width={width} mode={mode} n={n} "
                  f"damaged blocks {damaged}/{len(blocks)} segs={shapes} "
                  f"expected {expected.shape[1]} got {got.shape[1]}")
    extra = f" ({skipped} skipped)" if skipped else ""
    print(f"{checked - fails}/{checked} damaged-stream salvages (1-3 gaps) "
          f"recovered all intact blocks bit-exactly{extra}")
    if checked == 0:
        print("VACUOUS RUN: zero salvages checked")
        return 1
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
