"""decode_salvage: recover every intact block after stream damage.

The reference decoder aborts at the first corrupt block
(SLADecoder.c:660-732); salvage resyncs on the next validated block
header and keeps the recovered PCM bit-exact."""

import numpy as np
import pytest

import sla_tpu as sla
from sla_tpu.decoder import Decoder
from sla_tpu.errors import SLAError

from .test_encode_decode import gen_wave


def _encode(pcm, width=16):
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(pcm.shape[0], width, 44100))
    enc.set_encode_parameter(sla.PRESETS[2])
    return enc.encode_whole(pcm)


@pytest.fixture(scope="module")
def stream():
    pcm = gen_wave("chirp", 40000, 2, 16, 0, seed=31)
    return pcm, _encode(pcm)


def _blocks(blob):
    dec = Decoder()
    from sla_tpu.format import decode_header
    header, _ = decode_header(blob)
    dec.set_wave_format(header.wave_format)
    dec.set_encode_parameter(header.encode_param)
    return header, dec.scan_blocks(blob, header.num_samples)


def test_salvage_intact_equals_whole(stream):
    pcm, blob = stream
    hdr, segs = Decoder().decode_salvage(blob)
    assert len(segs) == 1
    assert segs[0].sample_offset == 0
    assert segs[0].gap_before_bytes == 0
    assert np.array_equal(segs[0].pcm, pcm)


def test_salvage_recovers_after_midstream_damage(stream):
    pcm, blob = stream
    header, blocks = _blocks(blob)
    victim = blocks[2]  # corrupt the 3rd block's payload
    b = bytearray(blob)
    b[victim.data_offset + 40] ^= 0xFF
    hdr, segs = Decoder().decode_salvage(bytes(b))
    assert len(segs) == 2
    pre = sum(x.num_samples for x in blocks[:2])
    assert segs[0].sample_offset == 0
    assert np.array_equal(segs[0].pcm, pcm[:, :pre])
    lost = victim.num_samples
    assert segs[1].sample_offset is None
    assert segs[1].gap_before_bytes == victim.block_size
    assert np.array_equal(segs[1].pcm, pcm[:, pre + lost :])
    # single-gap tail anchoring recovers everything
    anchor = header.num_samples - segs[1].pcm.shape[1]
    assert anchor == pre + lost


def test_salvage_two_gaps(stream):
    pcm, blob = stream
    header, blocks = _blocks(blob)
    b = bytearray(blob)
    for victim in (blocks[1], blocks[4]):
        b[victim.data_offset + 25] ^= 0x55
    hdr, segs = Decoder().decode_salvage(bytes(b))
    assert len(segs) == 3
    n0 = blocks[0].num_samples
    assert np.array_equal(segs[0].pcm, pcm[:, :n0])
    mid_lo = n0 + blocks[1].num_samples
    mid_hi = mid_lo + blocks[2].num_samples + blocks[3].num_samples
    assert np.array_equal(segs[1].pcm, pcm[:, mid_lo:mid_hi])
    tail_lo = mid_hi + blocks[4].num_samples
    assert np.array_equal(segs[2].pcm, pcm[:, tail_lo:])


def test_salvage_truncated_tail(stream):
    pcm, blob = stream
    header, blocks = _blocks(blob)
    cut = blocks[-1].data_offset + 10  # mid final block
    hdr, segs = Decoder().decode_salvage(blob[:cut])
    assert len(segs) == 1
    covered = sum(b.num_samples for b in blocks[:-1])
    assert np.array_equal(segs[0].pcm, pcm[:, :covered])


def test_salvage_corrupt_stream_header(stream):
    _, blob = stream
    b = bytearray(blob)
    b[12] ^= 0x01  # inside the CRC-protected stream header
    with pytest.raises(SLAError):
        Decoder().decode_salvage(bytes(b))


def test_salvage_with_raw_blocks():
    """Damage in a stream whose middle blocks fell back to RAWDATA
    (incompressible noise) — resync must recover across them too."""
    rng = np.random.default_rng(77)
    pcm = gen_wave("sine", 30000, 2, 16, 0, seed=41)
    pcm[:, 8192:16384] = (rng.integers(-32768, 32768, (2, 8192), dtype=np.int64)
                          .astype(np.int32) << 16)
    blob = _encode(pcm)
    hdr, segs = Decoder().decode_salvage(blob)
    assert len(segs) == 1 and np.array_equal(segs[0].pcm, pcm)
    # now corrupt the first block and salvage the rest
    from sla_tpu.format import decode_header
    dec = Decoder()
    header, _ = decode_header(blob)
    dec.set_wave_format(header.wave_format)
    dec.set_encode_parameter(header.encode_param)
    blocks = dec.scan_blocks(blob, header.num_samples)
    b = bytearray(blob)
    b[blocks[0].data_offset + 30] ^= 0x0F
    hdr, segs = Decoder().decode_salvage(bytes(b))
    assert segs, "nothing recovered"
    tail = sum(s.pcm.shape[1] for s in segs)
    assert np.array_equal(segs[-1].pcm, pcm[:, header.num_samples - segs[-1].pcm.shape[1]:])
    assert tail == header.num_samples - blocks[0].num_samples


def test_salvage_poisoned_run_keeps_intact_blocks(stream, monkeypatch):
    """If a resync run's grouped decode raises (false-sync anchor), the
    per-block fallback must still deliver every individually intact block."""
    pcm, blob = stream
    header, blocks = _blocks(blob)
    dec = Decoder()
    orig = Decoder._decode_blocks
    calls = {"n": 0}

    def poisoned(self, data, blks, total):
        # fail the first grouped (multi-block) decode once
        if len(blks) > 1 and calls["n"] == 0:
            calls["n"] = 1
            raise SLAError(ApiResult.INSUFFICIENT_DATA_SIZE, "poisoned")
        return orig(self, data, blks, total)

    from sla_tpu.errors import ApiResult
    monkeypatch.setattr(Decoder, "_decode_blocks", poisoned)
    hdr, segs = dec.decode_salvage(blob)
    got = np.concatenate([s.pcm for s in segs], axis=1)
    assert np.array_equal(got, pcm)  # every block recovered block-by-block


def test_salvage_cli_tail_anchors_head_gap(stream, tmp_path):
    """Damage the FIRST block: salvage yields one segment with a head gap
    whose position is still certain (total - n). The -r CLI must place the
    recovered audio there, not at sample 0."""
    from sla_tpu import wavio
    from sla_tpu.cli import main

    pcm, blob = stream
    header, blocks = _blocks(blob)
    victim = blocks[0]
    b = bytearray(blob)
    b[victim.data_offset + 40] ^= 0xFF
    bad = tmp_path / "head_gap.sla"
    bad.write_bytes(bytes(b))
    out_wav = tmp_path / "rec.wav"
    assert main(["sla", "-d", "-r", "-q", str(bad), str(out_wav)]) == 0
    got = wavio.read_wav(str(out_wav)).data
    n_rec = header.num_samples - victim.num_samples
    # the recovered run sits tail-anchored; the lost head is silence
    assert np.array_equal(got[:, victim.num_samples:], pcm[:, victim.num_samples:])
    assert np.count_nonzero(got[:, :victim.num_samples]) == 0
    assert n_rec == got.shape[1] - victim.num_samples
