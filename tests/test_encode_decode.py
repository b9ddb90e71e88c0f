"""Whole-pipeline round-trip matrix: synthetic waveforms x formats must
reconstruct sample-exactly (mirrors test_SLAEncodeDecode.c:558-1173)."""

import numpy as np
import pytest

import sla_tpu as sla

I32 = np.int32


def gen_wave(kind: str, n: int, ch: int, width: int, lshift: int, seed: int = 0) -> np.ndarray:
    """Canonical left-justified int32 test signal (C, n)."""
    rng = np.random.default_rng(seed)
    amp = (1 << (width - 1 - lshift)) - 1
    t = np.arange(n)
    out = np.zeros((ch, n), dtype=np.int64)
    for c in range(ch):
        if kind == "silence":
            w = np.zeros(n)
        elif kind == "constant":
            w = np.full(n, amp // 2)
        elif kind == "sine":
            w = amp * 0.6 * np.sin(2 * np.pi * t / (80 + 13 * c))
        elif kind == "noise":
            w = rng.integers(-amp // 2, amp // 2 + 1, n)
        elif kind == "chirp":
            w = amp * 0.5 * np.sin(2 * np.pi * t * t / (6 * n))
        elif kind == "nyquist":
            w = (amp // 3) * ((-1.0) ** t)
        elif kind == "gauss":
            w = np.clip(amp * 0.25 * rng.standard_normal(n), -amp, amp)
        else:
            raise ValueError(kind)
        out[c] = w.astype(np.int64)
    return ((out << (32 - width + lshift))).astype(I32)


SMALL_PARAM = sla.EncodeParameter(
    8, 1, 4, sla.ChannelProcessMethod.NONE, sla.WindowFunctionType.SIN, 4096
)
SMALL_MS = sla.EncodeParameter(
    8, 1, 4, sla.ChannelProcessMethod.STEREO_MS, sla.WindowFunctionType.SIN, 4096
)


def roundtrip(pcm: np.ndarray, width: int, ep: sla.EncodeParameter, rate: int = 44100) -> bytes:
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(pcm.shape[0], width, rate))
    enc.set_encode_parameter(ep)
    blob = enc.encode_whole(pcm)
    dec = sla.Decoder()
    hdr, out = dec.decode_whole(blob)
    assert hdr.num_samples == pcm.shape[1]
    assert np.array_equal(out, pcm), f"mismatch {np.sum(out != pcm)} samples"
    return blob


WAVES = ["silence", "constant", "sine", "noise", "chirp", "nyquist", "gauss"]


@pytest.mark.parametrize("kind", WAVES)
def test_mono_16bit(kind):
    pcm = gen_wave(kind, 5000, 1, 16, 0, seed=1)
    roundtrip(pcm, 16, SMALL_PARAM)


@pytest.mark.parametrize("kind", ["sine", "noise", "silence"])
def test_stereo_ms_16bit(kind):
    pcm = gen_wave(kind, 5000, 2, 16, 0, seed=2)
    roundtrip(pcm, 16, SMALL_MS)


@pytest.mark.parametrize("kind", ["sine", "noise"])
def test_stereo_no_ms(kind):
    pcm = gen_wave(kind, 5000, 2, 16, 0, seed=3)
    roundtrip(pcm, 16, SMALL_PARAM)


@pytest.mark.parametrize("width", [8, 24])
def test_bit_depths(width):
    pcm = gen_wave("sine", 5000, 1, width, 0, seed=4)
    roundtrip(pcm, width, SMALL_PARAM)


@pytest.mark.parametrize("lshift", [2, 8])
def test_offset_lshift(lshift):
    pcm = gen_wave("sine", 5000, 1, 16, lshift, seed=5)
    blob = roundtrip(pcm, 16, SMALL_PARAM)
    hdr, _ = sla.decode_header(blob)
    assert hdr.wave_format.offset_lshift == lshift


def test_multichannel_8ch():
    pcm = gen_wave("sine", 4200, 8, 16, 0, seed=6)
    roundtrip(pcm, 16, SMALL_PARAM)


def test_default_preset_stereo():
    pcm = gen_wave("chirp", 30000, 2, 16, 0, seed=7)
    roundtrip(pcm, 16, sla.PRESETS[2])


def test_high_order_preset():
    pcm = gen_wave("sine", 20000, 2, 24, 0, seed=8)
    roundtrip(pcm, 24, sla.PRESETS[4])


def test_mixed_silence_and_signal():
    pcm = gen_wave("sine", 9000, 1, 16, 0, seed=9)
    pcm[:, :3000] = 0  # leading silence triggers the silent-block fast path
    blob = roundtrip(pcm, 16, SMALL_PARAM)
    hdr, _ = sla.decode_header(blob)
    assert hdr.num_blocks >= 2


def test_raw_fallback_on_incompressible_noise():
    # full-range white noise at width 16: estimated ratio >= 0.95 -> RAWDATA
    rng = np.random.default_rng(10)
    pcm = (rng.integers(-(1 << 15), 1 << 15, (1, 5000)) << 16).astype(I32)
    roundtrip(pcm, 16, SMALL_PARAM)


# -- full format cross product (mirrors the reference's ~130-case table,
# test_SLAEncodeDecode.c:558-1173): every waveform x channel layout x bit
# depth x offset left-shift, MS and non-MS for stereo ---------------------
_FORMATS = [
    # (channels, width, lshift, ms)
    (1, 8, 0, False),
    (1, 16, 0, False),
    (1, 16, 8, False),
    (1, 24, 0, False),
    (1, 24, 8, False),
    (2, 16, 0, True),
    (2, 16, 8, True),
    (2, 24, 0, True),
    (2, 16, 0, False),
    (8, 16, 0, False),
    (8, 8, 0, False),
]


@pytest.mark.parametrize("kind", WAVES)
@pytest.mark.parametrize("ch,width,lshift,ms", _FORMATS)
def test_format_matrix(kind, ch, width, lshift, ms):
    pcm = gen_wave(kind, 4700, ch, width, lshift, seed=ch * 100 + width + lshift)
    ep = SMALL_MS if ms else SMALL_PARAM
    blob = roundtrip(pcm, width, ep)
    hdr, _ = sla.decode_header(blob)
    if kind != "silence":  # all-zero data has no detectable left shift
        assert hdr.wave_format.offset_lshift >= lshift


@pytest.mark.parametrize("rate", [8000, 48000, 96000, 192000])
def test_sampling_rates(rate):
    pcm = gen_wave("sine", 6000, 2, 16, 0, seed=11)
    roundtrip(pcm, 16, SMALL_MS, rate=rate)


def test_reject_overdeep_samples():
    """Samples with more significant bits than the declared depth must be
    rejected (a lossy stream would otherwise be emitted silently)."""
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(1, 16, 44100))
    enc.set_encode_parameter(SMALL_PARAM)
    bad = np.full((1, 5000), 1 << 8, dtype=np.int32)  # 24 significant bits
    with pytest.raises(sla.SLAError):
        enc.encode_whole(bad)


def test_error_paths():
    enc = sla.Encoder()
    with pytest.raises(sla.SLAError):
        enc.encode_whole(np.zeros((1, 100), I32))  # parameters not set
    with pytest.raises(sla.SLAError):
        enc.set_wave_format(sla.WaveFormat(99, 16, 44100))  # too many channels
    enc.set_wave_format(sla.WaveFormat(1, 16, 44100))
    with pytest.raises(sla.SLAError):
        enc.set_encode_parameter(
            sla.EncodeParameter(99, 1, 4, sla.ChannelProcessMethod.NONE)
        )  # parcor order beyond capacity
    with pytest.raises(sla.SLAError):
        # MS with mono is contradictory
        enc.set_encode_parameter(
            sla.EncodeParameter(8, 1, 4, sla.ChannelProcessMethod.STEREO_MS)
        )


def test_block_level_api_stream(ref_binary, tmp_path):
    """The caller-driven flow — encode_header (provisional) + encode_block
    per block + final header rewrite — mirrors SLAEncoder_EncodeHeader/
    EncodeBlock (SLAEncoder.h:42-49) and must produce a stream the
    reference binary decodes losslessly."""
    import subprocess

    from sla_tpu import wavio
    from sla_tpu.format import HeaderInfo

    pcm = gen_wave("chirp", 30000, 2, 16, 0, seed=99)
    enc = sla.Encoder()
    wf = sla.WaveFormat(2, 16, 44100)
    wf.offset_lshift = sla.Encoder.calculate_left_shift_offset(pcm, 16)
    enc.set_wave_format(wf)
    enc.set_encode_parameter(sla.PRESETS[2])

    block_len = sla.PRESETS[2].max_num_block_samples
    blobs = []
    for off in range(0, pcm.shape[1], block_len):
        blobs.append(enc.encode_block(pcm[:, off : off + block_len]))
    header = HeaderInfo(
        wave_format=enc._wave_format,
        encode_param=enc._encode_param,
        num_samples=pcm.shape[1],
        num_blocks=len(blobs),
        max_block_size=max(len(b) for b in blobs),
        max_bit_per_second=max(
            ((8 * len(b) * 44100) & 0xFFFFFFFF) // n
            for b, n in zip(blobs, [min(block_len, pcm.shape[1] - o)
                                    for o in range(0, pcm.shape[1], block_len)])
        ),
    )
    stream = enc.encode_header(header) + b"".join(blobs)

    # our decoder round-trips it
    dec = sla.Decoder()
    _, out = dec.decode_whole(stream)
    assert np.array_equal(out, pcm)
    # and the reference binary decodes it losslessly
    sla_path = tmp_path / "blocks.sla"
    sla_path.write_bytes(stream)
    wav_path = tmp_path / "blocks.wav"
    subprocess.run([str(ref_binary), "-d", "-q", str(sla_path), str(wav_path)],
                   check=True, capture_output=True)
    assert np.array_equal(wavio.read_wav(str(wav_path)).data, pcm)


def test_decode_block_level_api():
    """Caller-driven block decode — decode_header + decode_block per block
    (SLADecoder_DecodeBlock, SLADecoder.c:584-657) — reconstructs the PCM
    block by block."""
    from sla_tpu.format import decode_header

    pcm = gen_wave("sine", 25000, 2, 16, 0, seed=5)
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(2, 16, 44100))
    enc.set_encode_parameter(sla.PRESETS[1])
    stream = enc.encode_whole(pcm)

    header, _ = decode_header(stream)
    dec = sla.Decoder()
    dec.set_wave_format(header.wave_format)
    dec.set_encode_parameter(header.encode_param)
    from sla_tpu.constants import SLA_HEADER_SIZE

    offset = SLA_HEADER_SIZE  # first block starts right after the 43-byte header
    parts = []
    for _ in range(header.num_blocks):
        pcm_block, consumed = dec.decode_block(stream, offset)
        parts.append(pcm_block)
        offset += consumed
    out = np.concatenate(parts, axis=1)
    assert np.array_equal(out, pcm)


@pytest.mark.parametrize(
    "wtype",
    [
        sla.WindowFunctionType.HANN,
        sla.WindowFunctionType.BLACKMAN,
        sla.WindowFunctionType.VORBIS,
    ],
)
def test_nonpreset_windows_roundtrip_and_cross_decode(ref_binary, tmp_path, wtype):
    """The analysis windows outside the preset table (SLA.h:52-58) must
    round-trip losslessly and produce streams the reference binary decodes
    (window choice shapes coefficients only — the stream stays decodable
    by any conforming decoder)."""
    import subprocess

    from sla_tpu import wavio

    pcm = gen_wave("chirp", 20000, 2, 16, 0, seed=int(wtype))
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(2, 16, 44100))
    base = sla.PRESETS[2]
    enc.set_encode_parameter(
        sla.EncodeParameter(
            base.parcor_order, base.longterm_order, base.lms_order_per_filter,
            base.ch_process_method, wtype, base.max_num_block_samples,
        )
    )
    blob = enc.encode_whole(pcm)
    dec = sla.Decoder()
    _, out = dec.decode_whole(blob)
    assert np.array_equal(out, pcm)
    sla_path = tmp_path / f"w{int(wtype)}.sla"
    sla_path.write_bytes(blob)
    wav_path = tmp_path / f"w{int(wtype)}.wav"
    subprocess.run(
        [str(ref_binary), "-d", "-q", str(sla_path), str(wav_path)],
        check=True, capture_output=True,
    )
    assert np.array_equal(wavio.read_wav(str(wav_path)).data, pcm)


def test_segmented_encode_byte_identical(monkeypatch):
    """Long streams encode in rolling window segments; the bytes must be
    identical to the one-shot path even when silent runs cross segment
    boundaries (planning carries partial windows into the next segment)."""
    rng = np.random.default_rng(31)
    n = 60000
    pcm = gen_wave("chirp", n, 2, 16, 0, seed=31)
    # silent spans engineered to straddle the forced segment boundaries
    pcm[:, 7000:12000] = 0
    pcm[:, 29000:34000] = 0
    ep = sla.EncodeParameter(
        8, 1, 4, sla.ChannelProcessMethod.STEREO_MS, sla.WindowFunctionType.SIN, 4096
    )

    def encode():
        enc = sla.Encoder()
        enc.set_wave_format(sla.WaveFormat(2, 16, 44100))
        enc.set_encode_parameter(ep)
        return enc.encode_whole(pcm)

    whole = encode()
    monkeypatch.setenv("SLA_TPU_SEGMENT_SAMPLES", "16384")  # 4-window segments
    segmented = encode()
    assert segmented == whole
    dec = sla.Decoder()
    _, out = dec.decode_whole(segmented)
    assert np.array_equal(out, pcm)


def test_full_32bit_dynamic_range_rejected():
    """Full 32-bit dynamic range cannot encode losslessly (4-bit rshift
    field, MS mid-channel headroom); the reference corrupts silently —
    we raise a structured error instead (documented deviation)."""
    pcm = np.empty((2, 8000), dtype=np.int32)
    rng = np.random.default_rng(8)
    pcm[:] = rng.integers(-(1 << 31), (1 << 31) - 1, (2, 8000), dtype=np.int64)
    pcm[0, 0] = np.int32(-(1 << 31))
    pcm[1, 1] = np.int32((1 << 31) - 1)  # odd value -> 32 used bits
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(2, 32, 44100))
    enc.set_encode_parameter(sla.PRESETS[2])
    with pytest.raises(sla.SLAError):
        enc.encode_whole(pcm)
    # 24 effective bits in a 32-bit container stay fine (the covered case)
    pcm24 = gen_wave("sine", 8000, 2, 24, 0, seed=8).astype(np.int32)
    enc2 = sla.Encoder()
    enc2.set_wave_format(sla.WaveFormat(2, 32, 44100))
    enc2.set_encode_parameter(sla.PRESETS[2])
    blob = enc2.encode_whole(pcm24)
    dec = sla.Decoder()
    _, out = dec.decode_whole(blob)
    assert np.array_equal(out, pcm24)


def test_invalid_longterm_order_rejected():
    """Tap counts must be odd and <= 5 (SLAPredictor.c:808-810, main.c
    caps): even or oversized orders raise instead of smashing native
    scratch."""
    enc = sla.Encoder(sla.EncoderConfig(max_longterm_order=9))
    enc.set_wave_format(sla.WaveFormat(1, 16, 44100))
    for bad in (2, 4, 7, 9):
        with pytest.raises(sla.SLAError):
            enc.set_encode_parameter(
                sla.EncodeParameter(8, bad, 4, sla.ChannelProcessMethod.NONE)
            )
    enc.set_encode_parameter(
        sla.EncodeParameter(8, 5, 4, sla.ChannelProcessMethod.NONE)
    )  # odd and in range: accepted


def test_pure_python_decode_matches_native(monkeypatch):
    """The toolchain-free decode path (pure-Python entropy + scan filters
    on CPU) must reconstruct native-encoded streams exactly — fallbacks
    are correctness twins, not approximations."""
    pcm = gen_wave("chirp", 25000, 2, 16, 0, seed=44)
    pcm[:, 6000:9000] = 0
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(2, 16, 44100))
    enc.set_encode_parameter(sla.PRESETS[2])
    blob = enc.encode_whole(pcm)

    import sla_tpu.decoder as dmod

    monkeypatch.setattr(dmod.native, "available", lambda: False)
    dec = sla.Decoder()
    _, out = dec.decode_whole(blob)
    assert np.array_equal(out, pcm)


def test_decode_whole_into_preallocated(monkeypatch):
    """decode_whole(out=...) lands the PCM in the caller's buffer (the
    bulk twin of StreamingDecoder.decode_into): native and pure-Python
    paths, exactness, identity of the returned array, and argument
    validation."""
    pcm = gen_wave("chirp", 30000, 2, 16, 0, seed=45)
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(2, 16, 44100))
    enc.set_encode_parameter(sla.PRESETS[2])
    blob = enc.encode_whole(pcm)
    dec = sla.Decoder()

    buf = np.zeros_like(pcm)
    _, out = dec.decode_whole(blob, out=buf)
    assert out is buf and np.array_equal(buf, pcm)

    # pure-Python branch writes through the same buffer
    import sla_tpu.decoder as dmod

    buf2 = np.zeros_like(pcm)
    monkeypatch.setattr(dmod.native, "available", lambda: False)
    _, out2 = dec.decode_whole(blob, out=buf2)
    monkeypatch.undo()
    assert out2 is buf2 and np.array_equal(buf2, pcm)

    from sla_tpu.errors import SLAError

    for bad in (
        np.zeros((2, 29999), dtype=np.int32),  # wrong shape
        np.zeros(pcm.shape, dtype=np.int64),  # wrong dtype
        np.zeros((30000, 2), dtype=np.int32).T,  # not C-contiguous
    ):
        with pytest.raises(SLAError):
            dec.decode_whole(blob, out=bad)
    ro = np.zeros_like(pcm)
    ro.flags.writeable = False
    with pytest.raises(SLAError):
        dec.decode_whole(blob, out=ro)


def test_decode_whole_accepts_mmap_and_memoryview(tmp_path):
    """Streams opened as mmap/memoryview decode exactly (servers mapping
    large files avoid loading them up front); streaming/range paths take
    bytes-like objects the same way."""
    import mmap

    pcm = gen_wave("chirp", 30000, 2, 16, 0, seed=46)
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(2, 16, 44100))
    enc.set_encode_parameter(sla.PRESETS[2])
    blob = enc.encode_whole(pcm)
    p = tmp_path / "m.sla"
    p.write_bytes(blob)
    with open(p, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        _, out = sla.Decoder().decode_whole(mm)
        assert np.array_equal(out, pcm)
        _, win = sla.Decoder().decode_range(memoryview(mm), 5000, 2000)
        assert np.array_equal(win, pcm[:, 5000:7000])
