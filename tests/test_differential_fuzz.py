"""Randomized differential fuzz: byte-identity with the reference encoder
across random parameter/format/length combinations, both directions."""

import subprocess

import numpy as np
import pytest

import sla_tpu as sla
from sla_tpu import wavio

from .test_encode_decode import gen_wave

_RNG = np.random.default_rng(20260816)

CASES = []
for i in range(30):
    kind = str(_RNG.choice(["sine", "noise", "chirp", "gauss", "nyquist", "constant"]))
    ch = int(_RNG.choice([1, 2, 2, 4, 8]))
    width = int(_RNG.choice([8, 16, 16, 24]))
    mode = int(_RNG.integers(0, 5))
    # lengths around block/window boundaries are the interesting ones
    n = int(_RNG.choice([2048, 2049, 4095, 4096, 4097, 8192, 12288, 12289,
                         16384, 20000, 24576, 31111]))
    rate = int(_RNG.choice([8000, 44100, 48000, 96000]))
    lshift = int(_RNG.choice([0, 0, 0, 4])) if width >= 16 else 0
    CASES.append((i, kind, ch, width, mode, n, rate, lshift))


def test_exact_partition_mode_identity(ref_binary, tmp_path, monkeypatch):
    """SLA_TPU_EXACT_PARTITION prices spans with the reference's own
    analysis arithmetic; both modes must match the reference stream."""
    pcm = gen_wave("chirp", 30000, 2, 16, 0, seed=4242)
    wav_path = tmp_path / "in.wav"
    wavio.write_wav(str(wav_path), wavio.WavFile(2, 44100, 16, pcm))
    subprocess.run(
        [str(ref_binary), "-e", "-q", "-m", "2", str(wav_path), str(tmp_path / "r.sla")],
        check=True, capture_output=True,
    )
    ref_blob = (tmp_path / "r.sla").read_bytes()

    def encode():
        enc = sla.Encoder()
        enc.set_wave_format(sla.WaveFormat(2, 16, 44100))
        enc.set_encode_parameter(sla.PRESETS[2])
        return enc.encode_whole(pcm)

    assert encode() == ref_blob
    monkeypatch.setenv("SLA_TPU_EXACT_PARTITION", "1")
    assert encode() == ref_blob


@pytest.mark.parametrize("i,kind,ch,width,mode,n,rate,lshift", CASES)
def test_fuzz_byte_identity(i, kind, ch, width, mode, n, rate, lshift,
                            ref_binary, tmp_path):
    pcm = gen_wave(kind, n, ch, width, lshift, seed=1000 + i)
    wav_path = tmp_path / "in.wav"
    wavio.write_wav(str(wav_path), wavio.WavFile(ch, rate, width, pcm))
    r = subprocess.run(
        [str(ref_binary), "-e", "-q", "-m", str(mode), str(wav_path),
         str(tmp_path / "ref.sla")],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    ref_blob = (tmp_path / "ref.sla").read_bytes()

    preset = sla.PRESETS[mode]
    ch_method = preset.ch_process_method if ch == 2 else sla.ChannelProcessMethod.NONE
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(ch, width, rate))
    enc.set_encode_parameter(
        sla.EncodeParameter(preset.parcor_order, preset.longterm_order,
                            preset.lms_order_per_filter, ch_method,
                            preset.window_function_type,
                            preset.max_num_block_samples)
    )
    blob = enc.encode_whole(pcm)
    assert blob == ref_blob, f"stream mismatch case {i}"
    # and our decoder reproduces the PCM from the reference stream
    dec = sla.Decoder()
    _, out = dec.decode_whole(ref_blob)
    assert np.array_equal(out, pcm)
