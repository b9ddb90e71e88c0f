"""Random-access decode: decode_range must equal the decode_whole slice.

Blocks are independent (filter/entropy state resets at block starts,
SLADecoder.c:569-581), which is what makes a seek-window decode exact."""

import numpy as np
import pytest

import sla_tpu as sla
from sla_tpu.decoder import Decoder
from sla_tpu.errors import SLAError

from .test_encode_decode import gen_wave


def _encode(pcm, width=16, preset=2, rate=44100):
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(pcm.shape[0], width, rate))
    enc.set_encode_parameter(sla.PRESETS[preset])
    return enc.encode_whole(pcm)


@pytest.fixture(scope="module")
def stream():
    pcm = gen_wave("chirp", 50000, 2, 16, 0, seed=21)
    # mix in a silent span so the selection crosses SILENT blocks too
    pcm[:, 20000:24500] = 0
    return pcm, _encode(pcm)


@pytest.mark.parametrize("start,count", [
    (0, 1000),            # head
    (4096, 4096),         # exactly one block
    (5000, 9000),         # crosses block boundaries
    (19500, 6000),        # spans the silent run
    (49000, 5000),        # clamped tail
    (0, 50000),           # full stream
    (50000, 10),          # past the end -> empty
    (1, 0),               # empty request
])
def test_range_equals_whole_slice(stream, start, count):
    pcm, blob = stream
    dec = Decoder()
    hdr, whole = dec.decode_whole(blob)
    hdr2, win = Decoder().decode_range(blob, start, count)
    assert hdr2.num_samples == hdr.num_samples
    lo = min(start, pcm.shape[1])
    hi = min(start + count, pcm.shape[1])
    assert np.array_equal(win, whole[:, lo:hi])


@pytest.mark.parametrize("seed", range(6))
def test_range_fuzz(stream, seed):
    pcm, blob = stream
    rng = np.random.default_rng(seed)
    dec = Decoder()
    for _ in range(8):
        start = int(rng.integers(0, pcm.shape[1]))
        count = int(rng.integers(1, 20000))
        _, win = dec.decode_range(blob, start, count)
        hi = min(start + count, pcm.shape[1])
        assert np.array_equal(win, pcm[:, start:hi])


def test_range_rejects_negative(stream):
    _, blob = stream
    with pytest.raises(SLAError):
        Decoder().decode_range(blob, -1, 10)
    with pytest.raises(SLAError):
        Decoder().decode_range(blob, 0, -5)


def test_range_with_index_equals_unindexed(stream):
    pcm, blob = stream
    dec = Decoder()
    idx = dec.build_index(blob)
    assert idx.header.num_samples == pcm.shape[1]
    assert int(idx.sample_starts[-1]) == pcm.shape[1]
    for start, count in [(0, 1000), (4096, 4096), (5000, 9000),
                         (19500, 6000), (49000, 5000), (0, 50000),
                         (50000, 10), (1, 0)]:
        _, a = dec.decode_range(blob, start, count, index=idx)
        _, b = Decoder().decode_range(blob, start, count)
        assert np.array_equal(a, b)
        hi = min(start + count, pcm.shape[1])
        lo = min(start, pcm.shape[1])
        assert np.array_equal(a, pcm[:, lo:hi])


def test_index_rejects_mismatched_stream(stream):
    pcm, blob = stream
    idx = Decoder().build_index(blob)
    # different length
    with pytest.raises(SLAError):
        Decoder().decode_range(blob + b"\x00", 0, 10, index=idx)
    # same length, different header bytes
    bad = bytearray(blob)
    bad[10] ^= 0xFF
    with pytest.raises(SLAError):
        Decoder().decode_range(bytes(bad), 0, 10, index=idx)


def test_index_reverifies_window_crcs(stream):
    """An index must not bypass CRC checking: in-body payload corruption
    (same length, same stream header) raises on the indexed path when the
    window touches the damaged block, and decodes cleanly when it doesn't."""
    pcm, blob = stream
    dec = Decoder()
    idx = dec.build_index(blob)
    blocks = idx.blocks
    assert len(blocks) >= 3
    victim = blocks[1]
    bad = bytearray(blob)
    bad[victim.data_offset + victim.block_size - 3] ^= 0x11  # payload byte
    bad = bytes(bad)
    n0 = int(idx.sample_starts[1])
    n1 = int(idx.sample_starts[2])
    # window overlapping the damaged block -> corruption detected
    with pytest.raises(SLAError):
        dec.decode_range(bad, n0, 100, index=idx)
    # window entirely inside block 0 -> decodes, matches the original
    _, win = dec.decode_range(bad, 0, n0, index=idx)
    assert np.array_equal(win, pcm[:, :n0])
    # window after the damage -> also fine (block independence)
    _, win = dec.decode_range(bad, n1, 500, index=idx)
    assert np.array_equal(win, pcm[:, n1 : n1 + 500])
    # a CRC-off decoder skips the re-check (same contract as decode_whole)
    from sla_tpu.decoder import DecoderConfig
    dec_off = Decoder(DecoderConfig(enable_crc_check=False))
    _, win = dec_off.decode_range(bad, n0, 100, index=idx)
    assert win.shape == (pcm.shape[0], 100)


def test_range_no_native(stream, monkeypatch):
    from sla_tpu import native
    pcm, blob = stream
    monkeypatch.setattr(native, "available", lambda: False)
    _, win = Decoder().decode_range(blob, 7000, 3000)
    assert np.array_equal(win, pcm[:, 7000:10000])


def test_index_serialization_roundtrip(stream):
    """to_bytes()/from_bytes(): a persisted sidecar index drives
    decode_range to the exact same windows, parsing only the window's
    block headers (blocks=None on the loaded index)."""
    pcm, blob = stream
    dec = Decoder()
    idx = dec.build_index(blob)
    side = idx.to_bytes()
    # a lazily-built index round-trips to identical bytes too
    loaded = sla.StreamIndex.from_bytes(side, blob)
    assert loaded.blocks is None
    assert loaded.to_bytes() == side
    assert np.array_equal(loaded.sample_starts, idx.sample_starts)
    for start, count in ((0, 1000), (5000, 9000), (19500, 6000), (0, 50000)):
        _, want = dec.decode_range(blob, start, count, index=idx)
        _, got = Decoder().decode_range(blob, start, count, index=loaded)
        assert np.array_equal(got, want)


def test_index_from_bytes_rejections(stream):
    pcm, blob = stream
    side = Decoder().build_index(blob).to_bytes()
    with pytest.raises(SLAError):  # sidecar corruption: CRC mismatch
        bad = bytearray(side); bad[20] ^= 0x40
        sla.StreamIndex.from_bytes(bytes(bad), blob)
    with pytest.raises(SLAError):  # truncated sidecar
        sla.StreamIndex.from_bytes(side[:-3], blob)
    with pytest.raises(SLAError):  # not an index at all
        sla.StreamIndex.from_bytes(b"RIFF" + side[4:], blob)
    with pytest.raises(SLAError):  # different stream
        other = _encode(gen_wave("noise", 50000, 2, 16, 0, seed=5))
        sla.StreamIndex.from_bytes(side, other)


def test_loaded_index_detects_stream_corruption(stream):
    """A block corrupted after the sidecar was built must raise when the
    window touches it (parse_block_header CRC under the default config)."""
    pcm, blob = stream
    side = Decoder().build_index(blob).to_bytes()
    loaded = sla.StreamIndex.from_bytes(side, blob)
    b = bytearray(blob)
    b[len(b) // 2] ^= 0xFF  # mid-stream payload/header byte
    # same length + intact stream header: from_bytes' cheap identity check
    # passes, the per-window parse must catch it
    corrupt = bytes(b)
    loaded2 = sla.StreamIndex.from_bytes(side, corrupt)
    with pytest.raises(SLAError):
        Decoder().decode_range(corrupt, 20000, 15000, index=loaded2)


def test_index_sidecar_corruption_sweep(stream):
    """Randomized single-byte corruptions of the sidecar: every mutant
    must either raise a structured SLAError (CRC/extent/identity checks)
    or still decode the exact window. (The CRC frame is the accidental-
    corruption defense; see StreamIndex.from_bytes' trust-model note for
    what a deliberately forged sidecar could and could not do.)"""
    pcm, blob = stream
    dec = Decoder()
    side = dec.build_index(blob).to_bytes()
    _, want = dec.decode_range(blob, 19500, 6000)
    rng = np.random.default_rng(11)
    for _ in range(60):
        bad = bytearray(side)
        j = int(rng.integers(0, len(bad)))
        bad[j] ^= 1 << int(rng.integers(0, 8))
        try:
            idx = sla.StreamIndex.from_bytes(bytes(bad), blob)
            _, got = Decoder().decode_range(blob, 19500, 6000, index=idx)
        except SLAError:
            continue
        assert np.array_equal(got, want)


def test_index_from_bytes_rejects_crafted_sidecars(stream):
    """CRC-valid but semantically wrong sidecars must be rejected: a
    zero-block index for a non-empty stream (would IndexError later), and
    an index that omits a block (gap in the extents — could silently
    shift windows)."""
    from sla_tpu.constants import SLA_HEADER_SIZE
    from sla_tpu.crc16 import crc16

    pcm, blob = stream
    side = Decoder().build_index(blob).to_bytes()
    h = SLA_HEADER_SIZE

    def reseal(body: bytes) -> bytes:
        return body + crc16(body).to_bytes(2, "big")

    # zero-block sidecar: header + n=0, CRC re-stamped
    empty = reseal(side[: 13 + h] + (0).to_bytes(4, "big"))
    with pytest.raises(SLAError):
        sla.StreamIndex.from_bytes(empty, blob)

    # omit the first block but keep the sample-count sum: extents now
    # start past the stream header (gap) -> rejected
    n = int.from_bytes(side[13 + h : 17 + h], "big")
    assert n >= 2
    p = 17 + h
    offs = np.frombuffer(side, dtype=">u8", count=n, offset=p)
    sizes = np.frombuffer(side, dtype=">u4", count=n, offset=p + 8 * n)
    ns = np.frombuffer(side, dtype=">u4", count=n, offset=p + 12 * n).copy()
    ns[1] += ns[0]  # preserve the total
    body = (side[:13 + h] + (n - 1).to_bytes(4, "big")
            + offs[1:].tobytes() + sizes[1:].tobytes() + ns[1:].tobytes())
    with pytest.raises(SLAError):
        sla.StreamIndex.from_bytes(reseal(body), blob)
