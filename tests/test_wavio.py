"""WAV I/O: canonical conversion, chunk handling, format rejection
(reference: test_wav.c:24-118)."""

import struct

import numpy as np
import pytest

from sla_tpu import wavio
from sla_tpu.errors import ApiResult, SLAError


@pytest.mark.parametrize("bps", [8, 16, 24, 32])
def test_depth_roundtrip(bps):
    rng = np.random.default_rng(bps)
    amp = 1 << (bps - 1)
    pcm = (rng.integers(-amp, amp, (2, 777)) << (32 - bps)).astype(np.int32)
    blob = wavio.serialize_wav(wavio.WavFile(2, 48000, bps, pcm))
    out = wavio.parse_wav(blob)
    assert out.bits_per_sample == bps and out.sampling_rate == 48000
    assert np.array_equal(out.data, pcm)


def test_8bit_offset_binary():
    """8-bit PCM is offset-binary: byte 0 -> -128<<24 (wav.c:391-400)."""
    blob = wavio.serialize_wav(
        wavio.WavFile(1, 8000, 8, np.array([[-128 << 24, 0, 127 << 24]], np.int32))
    )
    body = blob[44:47]  # data chunk payload (an odd chunk adds a pad byte)
    assert body == bytes([0, 128, 255])


def test_odd_data_chunk_padded():
    """RIFF chunks are word-aligned: an odd data chunk carries a pad byte
    (excluded from the chunk size, included in the RIFF size)."""
    import struct

    blob = wavio.serialize_wav(
        wavio.WavFile(1, 8000, 8, np.array([[0, 0, 0]], np.int32))
    )
    assert len(blob) % 2 == 0
    riff_size = struct.unpack("<I", blob[4:8])[0]
    assert riff_size == len(blob) - 8
    data_size = struct.unpack("<I", blob[40:44])[0]
    assert data_size == 3 and blob[-1] == 0
    # round-trip through our own parser still works
    wav = wavio.parse_wav(blob)
    assert wav.data.shape == (1, 3)


def test_unknown_chunks_skipped():
    pcm = np.array([[1 << 16, 2 << 16]], dtype=np.int32)
    blob = wavio.serialize_wav(wavio.WavFile(1, 44100, 16, pcm))
    # splice a junk chunk between fmt and data
    head, data_part = blob[:36], blob[36:]
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
    spliced = head + junk + data_part
    # fix RIFF size
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out = wavio.parse_wav(spliced)
    assert np.array_equal(out.data, pcm)


def test_reject_non_riff():
    with pytest.raises(SLAError) as e:
        wavio.parse_wav(b"OggS" + b"\x00" * 64)
    assert e.value.result == ApiResult.INVALID_HEADER_FORMAT


def test_reject_non_pcm():
    pcm = np.array([[0]], dtype=np.int32)
    blob = bytearray(wavio.serialize_wav(wavio.WavFile(1, 44100, 16, pcm)))
    blob[20:22] = struct.pack("<H", 3)  # IEEE float format tag
    with pytest.raises(SLAError):
        wavio.parse_wav(bytes(blob))


def test_reject_missing_data_chunk():
    blob = wavio.serialize_wav(wavio.WavFile(1, 44100, 16, np.zeros((1, 4), np.int32)))
    with pytest.raises(SLAError):
        wavio.parse_wav(blob[:36])  # truncate before the data chunk


def test_malformed_fmt_values_structured_errors():
    """Crafted fmt fields (0 channels, odd bit depths) must raise SLAError,
    never ZeroDivisionError."""
    import struct

    def wav_with_fmt(ch, bps):
        fmt = struct.pack("<HHIIHH", 1, ch, 44100, 44100 * 2, 2, bps)
        data = b"\x00" * 8
        return (b"RIFF" + (4 + 8 + len(fmt) + 8 + len(data)).to_bytes(4, "little")
                + b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
                + b"data" + len(data).to_bytes(4, "little") + data)

    for ch, bps in [(0, 16), (2, 0), (2, 12), (0, 0)]:
        with pytest.raises(SLAError):
            wavio.parse_wav(wav_with_fmt(ch, bps))


def test_truncated_data_chunk_clamps():
    """A data chunk whose declared size exceeds the file (truncation, or
    the 0xFFFFFFFF streaming placeholder) reads the frames present."""
    pcm = np.arange(-50, 50, dtype=np.int32).reshape(1, 100) << 16
    blob = bytearray(wavio.serialize_wav(wavio.WavFile(1, 44100, 16, pcm)))
    # find the data chunk size field and inflate it
    i = blob.index(b"data")
    blob[i + 4 : i + 8] = (0xFFFFFFFF).to_bytes(4, "little")
    out = wavio.parse_wav(bytes(blob))
    assert np.array_equal(out.data, pcm)
    # hard truncation mid-data: whole frames only
    cut = bytes(blob[: i + 8 + 41])  # 20 complete frames + 1 byte
    out2 = wavio.parse_wav(cut)
    assert np.array_equal(out2.data, pcm[:, :20])
