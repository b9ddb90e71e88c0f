#!/usr/bin/env python
"""Streaming feed-contract fuzzer: random fragment-size policies x tick
rates x channels (1..8) x consumption modes (decode alloc / caller buffer /
zero-copy strided decode_into), each case checked sample-exact against the
bulk decoder. Run from the repo root:

    python tools/fuzz_streaming.py [count] [seed] [--seek]

--seek switches to the seek-hop fuzzer (run_seek_case): random
(index, sample) targets including block boundaries and past-the-end,
repeated seeks on one decoder, seek-then-underrun-then-resume, and seeks
from sidecar-loaded lazy indexes, each hop checked sample-exact against
Decoder.decode_range over the same window.

The contract under test (streaming.py decode/decode_into/append_data_fragment,
reference SLADecoder.c:752-1123): any feed pattern — byte-dribbles, bursts,
exactly-estimate feeds — yields the same PCM as one-shot decode, underruns
return empty/0 with nothing consumed, and decode_into lands rows at the
caller's own stride.
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
from sla_tpu.decoder import Decoder, DecoderConfig  # noqa: E402
from sla_tpu.errors import ApiResult, SLAError  # noqa: E402
from sla_tpu.format import decode_header  # noqa: E402
from sla_tpu.streaming import (  # noqa: E402
    StreamingDecoder,
    StreamingDecoderConfig,
)
from test_encode_decode import gen_wave  # noqa: E402


def _encode(pcm, ch, width, rate, mode):
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
    return enc.encode_whole(pcm)


def _next_fragment(rng, policy, need, left):
    """Fragment size per the case's feed policy (>=1 when data remains)."""
    if left <= 0:
        return 0
    if policy == "dribble":
        take = int(rng.integers(1, 17))
    elif policy == "odd":
        take = int(rng.integers(211, 2048))
    elif policy == "burst":
        take = int(rng.integers(1 << 12, 1 << 15))
    elif policy == "exact":
        take = max(int(need), 1)
    else:  # 'jitter': the estimate plus noise, sometimes less
        take = max(1, int(need) + int(rng.integers(-64, 256)))
    return min(take, left)


def run_case(rng, i, seed):
    ch = int(rng.choice([1, 2, 2, 3, 4, 6, 8]))
    width = int(rng.choice([8, 16, 24]))
    mode = int(rng.integers(0, 5))
    rate = int(rng.choice([16000, 44100, 48000, 96000]))
    tick_hz = float(rng.choice([30.0, 60.0, 120.0, 240.0, 93.7]))
    kind = str(rng.choice(["sine", "noise", "chirp", "gauss", "constant"]))
    policy = str(rng.choice(["dribble", "odd", "burst", "exact", "jitter"]))
    consume = str(rng.choice(["alloc", "buffer", "into", "into_padded"]))
    n = int(rng.integers(8000, 40000))

    pcm = gen_wave(kind, n, ch, width, 0, seed=seed * 100003 + i)
    blob = _encode(pcm, ch, width, rate, mode)
    header, _ = decode_header(blob)
    _, oracle = Decoder().decode_whole(blob)

    wf = header.wave_format
    sd = StreamingDecoder(
        StreamingDecoderConfig(
            core=DecoderConfig(), decode_interval_hz=tick_hz,
            max_bit_per_sample=wf.bit_per_sample,
        )
    )
    sd.set_wave_format(wf)
    sd.set_encode_parameter(header.encode_param)

    C, N = wf.num_channels, header.num_samples
    if consume == "into_padded":
        # strided rows: whole-stream array with trailing column padding
        store = np.zeros((C, N + int(rng.integers(1, 300))), dtype=np.int32)
    else:
        store = np.zeros((C, N), dtype=np.int32)
    spd = sd.output_samples_per_decode()
    tick_buf = np.zeros((C, spd), dtype=np.int32)

    # block data follows the 29-byte stream header (the reference CLI seeks
    # past the header before its feed loop, main.c:316-333)
    pos = SLA_HEADER_SIZE
    done = 0
    stall = 0
    collected = []  # every packet must come back, in feed order (main.c:400)
    # generous bound: every productive tick decodes >= 1 sample and every
    # stalled tick feeds >= 1 byte, so this can only trip on a real hang
    for _ in range(4 * (N + len(blob)) + 64):
        if done >= N:
            break
        need = sd.estimate_minimum_necessary_data_size()
        if pos < len(blob) and (
            sd.remaining_data_size() < need or rng.random() < 0.15
        ):
            take = _next_fragment(rng, policy, need, len(blob) - pos)
            try:
                sd.append_data_fragment(blob[pos : pos + take])
                pos += take
            except SLAError as e:
                # over-eager feeding tripped the 8-packet queue cap: a
                # legitimate backpressure signal (the reference's queue is
                # the same fixed size) — decode below drains it
                if e.result != ApiResult.EXCEED_HANDLE_CAPACITY:
                    raise
        cap = None if rng.random() < 0.7 else int(rng.integers(1, spd + 1))
        if consume in ("into", "into_padded"):
            # decode_into's contract: out capacity >= offset + goal, so the
            # final short tick must clamp goal to the samples actually left
            # (the one-shot CLI loop does the same, streaming.py decode_into)
            cap = min(cap if cap is not None else spd, N - done)
        if consume == "alloc":
            chunk = sd.decode(max_samples=cap)
            got = chunk.shape[1]
            if got:
                store[:, done : done + got] = chunk
        elif consume == "buffer":
            chunk = sd.decode(max_samples=cap, out=tick_buf)
            got = chunk.shape[1]
            if got:
                store[:, done : done + got] = chunk[:, :got]
        else:  # 'into' / 'into_padded': zero-copy strided landing
            got = sd.decode_into(store, done, max_samples=cap)
        done += got
        # reclaim consumed packets — the 8-slot queue holds every appended
        # fragment until the caller collects it, so a feeder that never
        # collects deadlocks by design (reference tick loop: main.c:400)
        if rng.random() < 0.9:
            collected.extend(sd.collect_data_fragments())
        if got == 0:
            stall += 1
            if pos >= len(blob) and sd.remaining_data_size() == 0 and stall > 4:
                break  # stream exhausted
        else:
            stall = 0
    else:
        raise AssertionError("feed loop did not terminate")

    assert done == N, f"decoded {done} of {N} samples"
    assert np.array_equal(store[:, :N], oracle), "streamed PCM != bulk decode"
    # packet round-trip contract: every fed fragment is handed back whole,
    # in feed order (the reference returns the caller's own pointers so it
    # can free them — ours returns the bytes)
    collected.extend(sd.collect_data_fragments())
    assert b"".join(collected) == bytes(blob[SLA_HEADER_SIZE:pos]), (
        "collected fragments != fed bytes"
    )


def _seek_targets(rng, starts, total):
    """Seek-target generator biased toward the interesting boundaries:
    block starts, block starts +/- 1, 0, the stream end, past-the-end."""
    kind = rng.random()
    if kind < 0.35:  # uniform interior
        return int(rng.integers(0, total))
    if kind < 0.65:  # a block boundary or its neighbors
        b = int(starts[int(rng.integers(0, len(starts)))])
        return max(0, min(b + int(rng.integers(-1, 2)), total))
    if kind < 0.8:
        return 0
    if kind < 0.9:
        return total - 1
    return total + int(rng.integers(0, 5000))  # at/past the end


def run_seek_case(rng, i, seed):
    """StreamingDecoder.seek fuzz (VERDICT r4 #4): random seek hops x
    fragment policies x in-memory/sidecar indexes x underrun-then-resume,
    each hop's playback checked sample-exact against Decoder.decode_range
    over the same window. Contract pinned: seek returns a BLOCK-START byte
    offset + skip count (reset-at-block-start resumability,
    SLADecoder.c:637-639, 1031-1049), repeated seeks on one decoder
    instance are independent, and a seek at/past the end returns
    (stream_size, 0)."""
    ch = int(rng.choice([1, 2, 2, 4, 6]))
    width = int(rng.choice([8, 16, 24]))
    mode = int(rng.integers(0, 5))
    kind = str(rng.choice(["sine", "noise", "chirp", "gauss"]))
    policy = str(rng.choice(["dribble", "odd", "burst", "exact", "jitter"]))
    n = int(rng.integers(9000, 50000))

    pcm = gen_wave(kind, n, ch, width, 0, seed=seed * 99991 + i)
    blob = _encode(pcm, ch, width, 44100, mode)
    dec = Decoder()
    idx_mem = dec.build_index(blob)
    # half the cases exercise the sidecar round trip (lazy window parsing)
    if rng.random() < 0.5:
        index = sla.StreamIndex.from_bytes(idx_mem.to_bytes(), blob)
    else:
        index = idx_mem
    starts = idx_mem.sample_starts
    total = int(starts[-1])

    sd = StreamingDecoder(
        StreamingDecoderConfig(
            core=DecoderConfig(),
            decode_interval_hz=float(rng.choice([30.0, 60.0, 120.0, 240.0])),
            max_bit_per_sample=width,
        )
    )

    hops = int(rng.integers(1, 5))
    for _ in range(hops):
        target = _seek_targets(rng, starts, total)
        give_data = rng.random() < 0.3
        off, skip = sd.seek(index, target,
                            data=blob if give_data else None)
        eff = max(0, min(target, total))
        if eff >= total:
            assert (off, skip) == (len(blob), 0), "past-end seek contract"
            continue
        assert skip >= 0
        assert int(starts[np.searchsorted(starts, eff, side="right") - 1]) \
            == eff - skip, "offset is not the covering block's start"
        # play a window from the hop; sometimes stop early (next hop then
        # abandons a mid-block decode — the repeated-seek reset contract)
        want = int(rng.integers(1, min(total - eff, 3 * 12288) + 1))
        _, oracle = dec.decode_range(blob, eff, want, index=idx_mem)
        got = np.zeros((ch, skip + want), dtype=np.int32)
        done = 0
        pos = off
        underruns = 0
        for _ in range(4 * (skip + want + len(blob)) + 64):
            if done >= skip + want:
                break
            need = sd.estimate_minimum_necessary_data_size()
            if pos < len(blob) and (
                sd.remaining_data_size() < need or rng.random() < 0.2
            ):
                take = _next_fragment(rng, policy, need, len(blob) - pos)
                try:
                    sd.append_data_fragment(blob[pos : pos + take])
                    pos += take
                except SLAError as e:
                    if e.result != ApiResult.EXCEED_HANDLE_CAPACITY:
                        raise
            chunk = sd.decode()
            got_n = min(chunk.shape[1], skip + want - done)
            if got_n:
                got[:, done : done + got_n] = chunk[:, :got_n]
                done += got_n
            else:
                underruns += 1
                if pos >= len(blob) and sd.remaining_data_size() == 0 \
                        and underruns > 4:
                    break
            if rng.random() < 0.9:
                sd.collect_data_fragments()
        else:
            raise AssertionError("seek playback loop did not terminate")
        assert done == skip + want, f"played {done} of {skip + want}"
        assert np.array_equal(got[:, skip:], oracle), (
            f"seek({target}) playback != decode_range window"
        )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    seek_mode = "--seek" in sys.argv
    count = int(args[0]) if len(args) > 0 else 100
    seed = int(args[1]) if len(args) > 1 else 0
    rng = np.random.default_rng(seed)
    case = run_seek_case if seek_mode else run_case
    fails = 0
    for i in range(count):
        try:
            case(rng, i, seed)
        except Exception as e:  # noqa: BLE001 — fuzzer: record and continue
            fails += 1
            print(f"[{i}] FAIL: {type(e).__name__}: {e}")
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{count} cases, {fails} failures", flush=True)
    print(f"done: {count} {'seek ' if seek_mode else ''}cases, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
