"""Decoder robustness: corrupted, truncated, and garbage streams must raise
SLAError (never crash, hang, or return silently wrong data with CRC on).

The reference's failure-detection story (SURVEY §5): header+block CRC16,
sync codes, 15 distinct error codes. This fuzz matrix exercises ours."""

import numpy as np
import pytest

import sla_tpu as sla
from sla_tpu.errors import ApiResult, SLAError

from .test_encode_decode import gen_wave


@pytest.fixture(scope="module")
def stream():
    pcm = gen_wave("chirp", 20000, 2, 16, 0, seed=77)
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(2, 16, 44100))
    enc.set_encode_parameter(sla.PRESETS[1])
    return enc.encode_whole(pcm), pcm


def decode(blob, crc=True):
    dec = sla.Decoder(sla.DecoderConfig(enable_crc_check=crc))
    return dec.decode_whole(blob)


def test_header_byte_flips(stream):
    blob, _ = stream
    for pos in [0, 1, 3, 8, 12, 20, 30, 42]:
        bad = bytearray(blob)
        bad[pos] ^= 0xFF
        with pytest.raises(SLAError):
            decode(bytes(bad))


def test_block_byte_flips_detected(stream):
    blob, _ = stream
    rng = np.random.default_rng(1)
    for _ in range(20):
        pos = int(rng.integers(43, len(blob)))
        bad = bytearray(blob)
        bad[pos] ^= 1 << int(rng.integers(0, 8))
        with pytest.raises(SLAError):
            decode(bytes(bad))


def test_truncations(stream):
    blob, _ = stream
    for frac in [0.1, 0.5, 0.9, 0.999]:
        cut = blob[: int(len(blob) * frac)]
        with pytest.raises(SLAError):
            decode(cut)


def test_empty_and_garbage():
    with pytest.raises(SLAError):
        decode(b"")
    with pytest.raises(SLAError):
        decode(b"\x00" * 100)
    rng = np.random.default_rng(2)
    for _ in range(5):
        junk = bytes(rng.integers(0, 256, 500, dtype=np.uint8))
        with pytest.raises(SLAError):
            decode(junk)


def test_header_ok_but_garbage_blocks(stream):
    blob, _ = stream
    rng = np.random.default_rng(3)
    bad = blob[:43] + bytes(rng.integers(0, 256, len(blob) - 43, dtype=np.uint8))
    with pytest.raises(SLAError):
        decode(bad)


def test_crc_off_decodes_or_raises(stream):
    """With CRC off, a payload flip may produce wrong PCM but must still
    terminate with either output or a structured error."""
    blob, _ = stream
    bad = bytearray(blob)
    bad[len(blob) // 2] ^= 0xFF
    try:
        decode(bytes(bad), crc=False)
    except SLAError:
        pass


def test_streaming_garbage_fragments():
    from sla_tpu.decoder import DecoderConfig
    from sla_tpu.streaming import StreamingDecoder, StreamingDecoderConfig

    sd = StreamingDecoder(StreamingDecoderConfig(core=DecoderConfig()))
    sd.set_wave_format(sla.WaveFormat(2, 16, 44100))
    sd.set_encode_parameter(sla.PRESETS[1])
    sd.append_data_fragment(b"\xde\xad\xbe\xef" * 64)
    with pytest.raises(SLAError) as e:
        sd.decode()
    assert e.value.result in (
        ApiResult.FAILED_TO_FIND_SYNC_CODE,
        ApiResult.DETECT_DATA_CORRUPTION,
    )


def test_truncation_detected_with_crc_off(stream):
    """Truncated streams must be loud even with CRC checks disabled — the
    native bit reader zero-fills past the end, so payload decode verifies
    the end bit position (INSUFFICIENT_DATA_SIZE, never silent garbage)."""
    blob, _ = stream
    for cut_bytes in [1, 7, 64, 500]:
        with pytest.raises(SLAError):
            decode(blob[: len(blob) - cut_bytes], crc=False)


def test_native_payload_overread_raises():
    """native.get_data_array surfaces an over-read as INSUFFICIENT_DATA_SIZE
    instead of returning zero-filled garbage."""
    from sla_tpu import native

    if not native.available():
        pytest.skip("native build unavailable")
    data = np.arange(-400, 400, dtype=np.int32).reshape(2, 400)
    init = [9, 9]
    payload = native.put_data_array(data, init)
    with pytest.raises(SLAError) as e:
        native.get_data_array(payload[: len(payload) // 2], 0, 2, 400, init)
    assert e.value.result == ApiResult.INSUFFICIENT_DATA_SIZE


def test_oversized_block_sample_counts_bounded(stream):
    """A stream whose block sample counts overrun the header total must
    fail with a structured error — never write past the PCM buffer (the
    fused native assembly writes at block offsets)."""
    blob, pcm = stream
    bad = bytearray(blob)
    # shrink the header's num_samples field (bytes 17..20, big-endian u32)
    true_n = int.from_bytes(bad[17:21], "big")
    bad[17:21] = (true_n // 2).to_bytes(4, "big")
    # re-stamp the header CRC so only the block/total inconsistency trips
    from sla_tpu.crc16 import crc16

    bad[8:10] = crc16(bytes(bad[10:43])).to_bytes(2, "big")
    with pytest.raises(SLAError):
        decode(bytes(bad), crc=False)


def test_oversized_offset_lshift_rejected(stream):
    """UBSan-found (round 3): a corrupt header with offset_lshift >=
    bit_per_sample (CRC re-stamped so parsing proceeds) must raise a
    structured error — the reference only debug-asserts this
    (SLADecoder.c:549-550) before shifting by 32-bps+lshift, which is UB
    for out-of-range values."""
    from sla_tpu.crc16 import crc16

    blob, _ = stream
    for lshift in (16, 173, 255):  # byte 24; bit_per_sample (byte 23) is 16
        bad = bytearray(blob)
        bad[24] = lshift
        bad[8:10] = crc16(bytes(bad[10:43])).to_bytes(2, "big")
        for crc in (True, False):
            with pytest.raises(SLAError):
                decode(bytes(bad), crc=crc)
        # streaming decoder takes the same header fields via set_wave_format
        from sla_tpu.format import decode_header
        from sla_tpu.streaming import StreamingDecoder, StreamingDecoderConfig

        header, _ = decode_header(bytes(bad))
        sd = StreamingDecoder(StreamingDecoderConfig())
        with pytest.raises(SLAError):
            sd.set_wave_format(header.wave_format)


def test_corruption_fuzzer_smoke():
    """A committed slice of tools/fuzz_corruption.py: random mutants must
    never crash the native parsers (full sweeps run per round)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "fuzz_corruption.py"), "25", "77"],
        capture_output=True, text=True, timeout=240,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]


def test_truncation_structured_error_without_native(stream, monkeypatch):
    """The pure-Python scan path must surface truncation as a structured
    SLAError, never an IndexError from the bit reader — covering cuts at
    block boundaries and inside block headers."""
    blob, _ = stream
    monkeypatch.setattr("sla_tpu.decoder.native.available", lambda: False)
    for cut in (43, 44, 50, 53, 54, len(blob) // 2, len(blob) - 1):
        with pytest.raises(SLAError):
            decode(blob[:cut], crc=False)


def test_corrupt_payload_structured_error_without_native(stream, monkeypatch):
    """A corrupt payload that drives the pure-Python Rice reader past the
    buffer must raise SLAError, not IndexError (the native reader
    zero-fills and reports the over-read; the fallback must match)."""
    blob, _ = stream
    monkeypatch.setattr("sla_tpu.decoder.native.available", lambda: False)
    bad = bytearray(blob)
    # stomp the tail of the payload so the adaptive decode overruns
    bad[-40:] = bytes(40)
    try:
        decode(bytes(bad), crc=False)
    except SLAError:
        pass  # structured is the contract; lossy output is also acceptable


def test_invalid_block_type_structured_error(stream):
    """The 2-bit block-type field only defines values 0..2; a crafted
    type 3 (CRC re-stamped so it reaches the parser) must raise
    DETECT_DATA_CORRUPTION in batch and streaming decode — it previously
    fell through to the entropy-cursor path as an AttributeError."""
    from sla_tpu.crc16 import crc16 as _crc16

    blob, _ = stream
    bad = bytearray(blob)
    # first block header: type bits are the top 2 bits of byte 43+10
    bsize = int.from_bytes(bad[45:49], "big") + 6
    bad[53] |= 0xC0  # set both type bits -> 3
    bad[49:51] = _crc16(memoryview(bad)[43 + 8 : 43 + bsize]).to_bytes(2, "big")
    with pytest.raises(SLAError) as e:
        decode(bytes(bad), crc=True)
    assert e.value.result == ApiResult.DETECT_DATA_CORRUPTION


def test_zero_sample_block_rejected(stream):
    """A crafted block claiming zero samples (CRC re-stamped) must raise
    DETECT_DATA_CORRUPTION — it previously divided by zero in the
    streaming estimator."""
    from sla_tpu.crc16 import crc16 as _crc16

    blob, _ = stream
    bad = bytearray(blob)
    bsize = int.from_bytes(bad[45:49], "big") + 6
    bad[51:53] = (0).to_bytes(2, "big")  # num_samples field of block 1
    bad[49:51] = _crc16(memoryview(bad)[43 + 8 : 43 + bsize]).to_bytes(2, "big")
    with pytest.raises(SLAError):
        decode(bytes(bad), crc=True)


def test_oversized_block_counts_bounded_without_native(stream, monkeypatch):
    """The pure-Python block path must enforce the same sample-count bound
    as the native path — silent oversized output is a divergence."""
    blob, _ = stream
    monkeypatch.setattr("sla_tpu.decoder.native.available", lambda: False)
    bad = bytearray(blob)
    true_n = int.from_bytes(bad[17:21], "big")
    bad[17:21] = (true_n // 2).to_bytes(4, "big")
    from sla_tpu.crc16 import crc16

    bad[8:10] = crc16(bytes(bad[10:43])).to_bytes(2, "big")
    with pytest.raises(SLAError):
        decode(bytes(bad), crc=False)


@pytest.mark.parametrize("no_native", [False, True])
def test_zero_sample_stream_decodes_empty(no_native, monkeypatch):
    """A header-only stream (num_samples=0, no blocks) returns (C, 0) on
    both backends instead of crashing in concatenate."""
    from sla_tpu.format import HeaderInfo, encode_header

    if no_native:
        monkeypatch.setattr("sla_tpu.decoder.native.available", lambda: False)
    hdr = HeaderInfo(
        wave_format=sla.WaveFormat(2, 16, 44100),
        encode_param=sla.PRESETS[2],
        num_samples=0,
    )
    blob = encode_header(hdr)
    _, out = decode(blob, crc=True)
    assert out.shape == (2, 0)
    assert out.dtype == np.int32


def test_zero_channel_header_rejected():
    """num_channels=0 in a crafted (CRC-restamped) header must raise a
    structured error, not ZeroDivisionError in group sizing."""
    from sla_tpu.crc16 import crc16
    from sla_tpu.format import HeaderInfo, encode_header

    hdr = HeaderInfo(
        wave_format=sla.WaveFormat(1, 16, 44100),
        encode_param=sla.PRESETS[2],
        num_samples=100,
    )
    from sla_tpu.format import decode_header as dh

    blob = bytearray(encode_header(hdr))
    # locate the (1-byte) channel-count field by probing: zero one byte at
    # a time, re-stamp the CRC, and keep the probe whose parsed header
    # reports num_channels == 0 with everything else intact
    crafted = None
    for off in range(10, 43):
        probe = bytearray(blob)
        probe[off] = 0
        probe[8:10] = crc16(bytes(probe[10:43])).to_bytes(2, "big")
        try:
            h, _ = dh(bytes(probe))
        except SLAError:
            continue
        if (h.wave_format.num_channels == 0
                and h.wave_format.bit_per_sample == 16
                and h.num_samples == 100):
            crafted = bytes(probe)
            break
    assert crafted is not None, "could not locate the channel field"
    with pytest.raises(SLAError):
        decode(crafted, crc=True)


@pytest.mark.parametrize("pitch,taps", [(1023, 1), (300, 3), (1, 3)])
def test_py_synth_chunk_degenerate_pitch_matches_native(pitch, taps):
    """Degenerate long-term parameters from hostile streams (max_delay past
    the history window, or taps past max_delay) must synthesize the exact
    same samples on the pure-Python twin as on the native ring (which reads
    deterministic zeros) — no IndexError, no aliased history reads."""
    from sla_tpu import native
    from sla_tpu.hostref import py_synth_chunk

    if not native.available():
        pytest.skip("needs native for the cross-check")
    rng = np.random.default_rng(5)
    n, p, M, L = 200, 8, 8, 258
    residual = rng.integers(-1000, 1000, n, dtype=np.int32)
    coef = rng.integers(-20000, 20000, p, dtype=np.int32)
    ltm = (rng.integers(-30000, 30000, max(taps, 1), dtype=np.int32) << 16)

    def run(fn):
        lat = np.zeros(p + 1, dtype=np.int32)
        hist = rng.integers(-99, 99, L).astype(np.int32)  # nonzero history
        ltp = np.zeros(1, dtype=np.int32)
        lms = np.zeros(4 * M, dtype=np.int32)
        lmsp = np.zeros(1, dtype=np.int32)
        de = np.zeros(1, dtype=np.int32)
        out = fn(residual.copy(), coef.copy(), lat, pitch, ltm.copy(),
                 taps, hist, ltp, M, lms, lmsp, de)
        return out, lat, hist, lms, de

    rng = np.random.default_rng(5)
    n_out = run(py_synth_chunk)
    rng = np.random.default_rng(5)
    v_out = run(native.synth_chunk)
    for a, b in zip(n_out, v_out):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_span_cost_error_bound_guards():
    """The derived bound must escalate (inf) across both discontinuities —
    the FLT_EPSILON Levinson dead-row clamp straddle — while pricing exact
    digital silence as zero-sensitivity on BOTH ingredient paths."""
    from sla_tpu.analysis.partition import span_cost_error_bound

    p = 4
    # span straddling the dead-row clamp: R0 ~ FLT_EPSILON
    eps = float(np.finfo(np.float32).eps)
    R = np.zeros((1, 1, p + 1))
    R[0, 0, 0] = eps
    R[0, 0, 1] = eps * 0.5
    b = span_cost_error_bound(R, np.array([4096]), p, 16)
    assert not np.isfinite(b[0])
    # silent channel + loud channel: finite on the fallback path...
    R2 = np.zeros((1, 2, p + 1))
    R2[0, 0, 0] = 1.0
    R2[0, 0, 1] = 0.3
    b_fb = span_cost_error_bound(R2, np.array([4096]), p, 16)
    assert np.isfinite(b_fb[0])
    # ...and on the native-sens ingredient path (e_p exported as 0 for the
    # silent channel used to blow the bound to inf via near_floor)
    sens = np.array([[1.0, 1e30]])  # silent channel's 1/e_p blowup
    e_p = np.array([[0.5, 0.0]])
    b_ns = span_cost_error_bound(R2, np.array([4096]), p, 16,
                                 sens=sens, e_p=e_p)
    assert np.isfinite(b_ns[0])


def test_init_rice_overflow_rejected_structurally():
    """Reference defect class: a block residual whose mean zigzag magnitude
    does not fit the bit_per_sample-wide initial-Rice-parameter field makes
    the reference write TRUNCATED bits (assert compiled out, SLACoder.c:402)
    and silently corrupt its own round trip. Our encoder must refuse with a
    structured error; our decoder reports the reference's defective stream
    as a structured over-read (found by the extended-parameter identity
    fuzz, case seed 20260819622)."""
    pcm = gen_wave("nyquist", 22480, 1, 8, 0, seed=20260819622)
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(1, 8, 192000))
    enc.set_encode_parameter(sla.EncodeParameter(
        48, 5, 16, sla.ChannelProcessMethod.NONE,
        sla.WindowFunctionType.BLACKMAN, 4096,
    ))
    with pytest.raises(SLAError) as e:
        enc.encode_whole(pcm)
    assert "initial Rice" in str(e.value)
    # caller-driven single-block flow hits the same gate
    enc2 = sla.Encoder()
    enc2.set_wave_format(sla.WaveFormat(1, 8, 192000))
    enc2.set_encode_parameter(sla.EncodeParameter(
        48, 5, 16, sla.ChannelProcessMethod.NONE,
        sla.WindowFunctionType.BLACKMAN, 4096,
    ))
    with pytest.raises(SLAError):
        enc2.encode_block(pcm[:, 20480:22480])


def _restamp_block_crc(blob: bytearray, off: int, size: int) -> None:
    from sla_tpu.crc16 import crc16 as _crc
    c = _crc(bytes(blob[off + 8 : off + size]))
    blob[off + 6 : off + 8] = c.to_bytes(2, "big")


def test_decode_block_inflated_size_rejected(stream):
    """The next-offset field is NOT CRC-covered: inflating it must raise,
    not skip CRC verification and return consumed bytes past the buffer."""
    blob, pcm = stream
    from sla_tpu.decoder import Decoder
    from sla_tpu.format import decode_header

    header, _ = decode_header(blob)
    dec = Decoder()
    dec.set_wave_format(header.wave_format)
    dec.set_encode_parameter(header.encode_param)
    first = dec.parse_block_header(blob, 43)
    bad = bytearray(blob)
    huge = len(blob)  # declared size reaching past the buffer end
    bad[43 + 2 : 43 + 6] = (huge - 6).to_bytes(4, "big")
    with pytest.raises(SLAError) as ei:
        dec.decode_block(bytes(bad), 43)
    assert ei.value.result == ApiResult.INSUFFICIENT_DATA_SIZE
    # the intact stream still block-decodes fine
    out, consumed = dec.decode_block(blob, 43)
    assert consumed == first.block_size


def test_oversized_num_samples_rejected(stream):
    """num_samples > max_num_block_samples with a re-stamped CRC must be a
    structured corruption verdict on every decode path (it would otherwise
    overrun the (C, max_block)-sized batches with a bare ValueError)."""
    blob, pcm = stream
    from sla_tpu.decoder import Decoder
    from sla_tpu.format import decode_header

    header, _ = decode_header(blob)
    dec = Decoder()
    dec.set_wave_format(header.wave_format)
    dec.set_encode_parameter(header.encode_param)
    first = dec.parse_block_header(blob, 43)
    bad = bytearray(blob)
    n_big = header.encode_param.max_num_block_samples + 1000
    bad[43 + 8 : 43 + 10] = n_big.to_bytes(2, "big")
    _restamp_block_crc(bad, 43, first.block_size)
    bad = bytes(bad)
    with pytest.raises(SLAError):
        dec.decode_block(bad, 43)
    with pytest.raises(SLAError):
        sla.Decoder().decode_whole(bad)
    # salvage must recover the intact tail, not crash with ValueError
    hdr, segs = sla.Decoder().decode_salvage(bad)
    assert sum(s.pcm.shape[1] for s in segs) > 0


def test_many_tiny_blocks_stream_decodes():
    """A crafted-but-valid stream of many sub-2048-sample SILENT blocks
    must decode on the native scan path exactly like the pure-Python twin
    (the slot bound grows on demand instead of reporting truncation)."""
    from sla_tpu import native
    from sla_tpu.crc16 import crc16 as _crc
    from sla_tpu.format import HeaderInfo, encode_header

    wf = sla.WaveFormat(1, 16, 48000)
    ep = sla.PRESETS[0]
    n_blocks, n_per = 40, 100
    header = HeaderInfo(wf, ep, num_samples=n_blocks * n_per,
                        num_blocks=n_blocks, max_block_size=64,
                        max_bit_per_second=1)
    out = bytearray(encode_header(header))
    for _ in range(n_blocks):
        blk = bytearray()
        blk += b"\xff\xff"                      # sync
        body = bytearray()
        body += n_per.to_bytes(2, "big")        # num_samples
        body.append(0b01000000)                 # type=SILENT (2 bits) + pad
        size = 2 + 4 + 2 + len(body)            # sync + offset + crc + body
        blk += (size - 6).to_bytes(4, "big")    # next-block offset
        crc = _crc(bytes(body))
        blk += crc.to_bytes(2, "big")
        blk += body
        out += blk
    blob = bytes(out)
    hdr, pcm = sla.Decoder().decode_whole(blob)
    assert pcm.shape == (1, n_blocks * n_per)
    assert not pcm.any()


def test_init_rice_overflow_rejected_on_segmented_path(monkeypatch):
    """The segmented long-stream encode must enforce the same initial-Rice
    overflow gate as the one-shot path (it used to silently emit a stream
    that desyncs at decode)."""
    monkeypatch.setenv("SLA_TPU_SEGMENT_SAMPLES", "8192")
    pcm = gen_wave("nyquist", 22480, 1, 8, 0, seed=20260819622)
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(1, 8, 192000))
    enc.set_encode_parameter(sla.EncodeParameter(
        48, 5, 16, sla.ChannelProcessMethod.NONE,
        sla.WindowFunctionType.BLACKMAN, 4096,
    ))
    with pytest.raises(SLAError) as e:
        enc.encode_whole(pcm)
    assert "initial Rice" in str(e.value)


def test_encode_block_rejects_empty():
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(1, 16, 44100))
    enc.set_encode_parameter(sla.PRESETS[0])
    with pytest.raises(SLAError):
        enc.encode_block(np.zeros((1, 0), dtype=np.int32))


def test_corrupt_ch_method_reports_corruption(stream):
    """A flipped ch_process_method byte (CRC already mismatching) must be
    diagnosed as DATA CORRUPTION, not 'invalid header format'."""
    from sla_tpu.format import decode_header

    blob, _ = stream
    bad = bytearray(blob)
    bad[28] = 0x77  # invalid enum value; header CRC now mismatches
    with pytest.raises(SLAError) as ei:
        decode_header(bytes(bad))
    assert ei.value.result == ApiResult.DETECT_DATA_CORRUPTION
