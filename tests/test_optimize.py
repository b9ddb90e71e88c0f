"""Ratio-optimizing encode mode (sla_tpu/optimize.py).

The searched space is the reference LIBRARY's parameter space (SLA.h:69-76;
the reference CLI exposes only five preset points, src/main.c:63-76); every
winner must therefore remain an ordinary reference-decodable stream, never
larger than the seed preset's.
"""

import dataclasses
import subprocess

import numpy as np
import pytest

import sla_tpu as sla
from sla_tpu import wavio
from sla_tpu.cli import main as cli_main
from sla_tpu.optimize import _SAMPLE_CHUNK_LEN, _SAMPLE_CHUNKS, optimize_encode

from .test_encode_decode import gen_wave


def _preset_blob(pcm, wf, preset=2):
    enc = sla.Encoder()
    enc.set_wave_format(wf)
    enc.set_encode_parameter(sla.preset_parameter(preset, wf.num_channels))
    return enc.encode_whole(pcm)


@pytest.mark.parametrize("kind,ch,width", [("chirp", 2, 16), ("sine", 1, 24)])
def test_not_worse_than_seed_and_lossless(kind, ch, width):
    pcm = gen_wave(kind, 50000, ch, width, 0, seed=11)
    wf = sla.WaveFormat(ch, width, 44100)
    blob, param = optimize_encode(pcm, wf, effort=2)
    assert len(blob) <= len(_preset_blob(pcm, wf))
    header, out = sla.Decoder().decode_whole(blob)
    assert np.array_equal(out, pcm)
    # the winner's stream advertises the winner's parameters
    assert header.encode_param.parcor_order == param.parcor_order
    assert header.encode_param.max_num_block_samples == param.max_num_block_samples


def test_sampled_search_long_file_never_worse():
    # long enough that effort 1 really searches on a slice (> chunk budget)
    n = _SAMPLE_CHUNKS * _SAMPLE_CHUNK_LEN + 120000
    pcm = gen_wave("chirp", n, 2, 16, 0, seed=5)
    wf = sla.WaveFormat(2, 16, 44100)
    blob, _ = optimize_encode(
        pcm, wf, effort=1, encoder_config=sla.EncoderConfig(verify=True)
    )
    assert len(blob) <= len(_preset_blob(pcm, wf))
    _, out = sla.Decoder().decode_whole(blob)
    assert np.array_equal(out, pcm)


def test_seed_guarantee_with_custom_start():
    # a deliberately bad seed: the search must do strictly better or equal
    pcm = gen_wave("gauss", 30000, 2, 16, 0, seed=3)
    wf = sla.WaveFormat(2, 16, 44100)
    seed = sla.EncodeParameter(
        48, 5, 32, sla.ChannelProcessMethod.NONE,
        sla.WindowFunctionType.RECTANGULAR, 4096,
    )
    blob, param = optimize_encode(pcm, wf, start=seed, effort=2)
    enc = sla.Encoder()
    enc.set_wave_format(wf)
    enc.set_encode_parameter(seed)
    assert len(blob) <= len(enc.encode_whole(pcm))
    _, out = sla.Decoder().decode_whole(blob)
    assert np.array_equal(out, pcm)


def _fake_trial(n, seed_param, real_trial, full_file_behavior):
    """Slice trials are fabricated so the search deterministically picks
    replace(seed, window=RECTANGULAR) as the winner; full-file finalist
    calls (recognized by width n) follow `full_file_behavior(param)`."""

    def fake(d, w, p, c):
        if d.shape[1] == n:
            return full_file_behavior(d, w, p, c)
        if p == seed_param:
            return b"\0" * 100
        if p.window_function_type == sla.WindowFunctionType.RECTANGULAR:
            return b"\0" * 50
        return b"\0" * 200

    return fake


def _real_encode(pcm, wf, param):
    enc = sla.Encoder()
    enc.set_wave_format(wf)
    enc.set_encode_parameter(param)
    return enc.encode_whole(pcm)


def test_winner_rejected_on_full_file_falls_back_to_seed(monkeypatch):
    """A slice-winning parameter the full file rejects must fall back to the
    seed's full-file stream — not raise (the seed encodes fine)."""
    from sla_tpu import optimize as opt

    n = _SAMPLE_CHUNKS * _SAMPLE_CHUNK_LEN + 50000
    pcm = gen_wave("chirp", n, 1, 16, 0, seed=7)
    wf = sla.WaveFormat(1, 16, 44100)
    seed = sla.preset_parameter(2, 1)
    real_trial = opt._trial

    def full(d, w, p, c):
        return real_trial(d, w, p, c) if p == seed else None

    monkeypatch.setattr(opt, "_trial", _fake_trial(n, seed, real_trial, full))
    blob, param = optimize_encode(pcm, wf, start=seed, effort=1)
    assert param == seed
    assert blob == _real_encode(pcm, wf, seed)


def test_seed_rejected_on_full_file_keeps_winner(monkeypatch):
    """When only the winner's parameters survive the full file, return the
    winner's stream instead of raising (the size guarantee is vacuous)."""
    from sla_tpu import optimize as opt

    n = _SAMPLE_CHUNKS * _SAMPLE_CHUNK_LEN + 50000
    pcm = gen_wave("chirp", n, 1, 16, 0, seed=7)
    wf = sla.WaveFormat(1, 16, 44100)
    seed = sla.preset_parameter(2, 1)
    real_trial = opt._trial

    def full(d, w, p, c):
        return None if p == seed else real_trial(d, w, p, c)

    monkeypatch.setattr(opt, "_trial", _fake_trial(n, seed, real_trial, full))
    blob, param = optimize_encode(pcm, wf, start=seed, effort=1)
    expect = dataclasses.replace(
        seed, window_function_type=sla.WindowFunctionType.RECTANGULAR
    )
    assert param == expect
    assert blob == _real_encode(pcm, wf, expect)


def test_both_finalists_rejected_raises(monkeypatch):
    from sla_tpu import optimize as opt

    n = _SAMPLE_CHUNKS * _SAMPLE_CHUNK_LEN + 50000
    pcm = gen_wave("chirp", n, 1, 16, 0, seed=7)
    wf = sla.WaveFormat(1, 16, 44100)
    seed = sla.preset_parameter(2, 1)

    def full(d, w, p, c):
        return None

    monkeypatch.setattr(opt, "_trial", _fake_trial(n, seed, opt._trial, full))
    with pytest.raises(sla.SLAError):
        optimize_encode(pcm, wf, start=seed, effort=1)


def test_no_duplicate_trials(monkeypatch):
    """Sweep 2 must not re-encode parameter sets sweep 1 already rejected."""
    from sla_tpu import optimize as opt

    calls = []
    real = opt._trial

    def counting(d, w, p, c):
        calls.append(dataclasses.astuple(p))
        return real(d, w, p, c)

    monkeypatch.setattr(opt, "_trial", counting)
    pcm = gen_wave("gauss", 20000, 1, 16, 0, seed=4)
    optimize_encode(pcm, sla.WaveFormat(1, 16, 44100), effort=2)
    assert len(calls) == len(set(calls))


def test_grid_avoids_reference_decoder_crash_values():
    """The reference decoder masks LMS ring buffers with (num_coef - 1) and
    its >=4 / power-of-2 guards are asserts compiled out under NDEBUG
    (SLAPredictor.c:1210,1223-1224): an lms=0 stream segfaults the
    reference binary. Every searched LMS order must stay a power of two
    >= 4 so winners keep the reference-decodable contract."""
    from sla_tpu.optimize import _KNOBS

    lms_values = dict(_KNOBS)["lms_order_per_filter"]
    assert all(v >= 4 and (v & (v - 1)) == 0 for v in lms_values)


def test_lms0_stream_ours_only(ref_binary, tmp_path):
    """lms=0 is a valid point of OUR parameter space (round-trips here) but
    crashes the reference decoder — pin both facts so a future grid change
    that reintroduces it fails loudly."""
    import subprocess as sp

    pcm = gen_wave("chirp", 30000, 2, 16, 0, seed=13)
    wf = sla.WaveFormat(2, 16, 44100)
    param = sla.EncodeParameter(
        24, 1, 0, sla.ChannelProcessMethod.STEREO_MS,
        sla.WindowFunctionType.SIN, 12288,
    )
    blob = _real_encode(pcm, wf, param)
    _, out = sla.Decoder().decode_whole(blob)
    assert np.array_equal(out, pcm)
    p = tmp_path / "lms0.sla"
    p.write_bytes(blob)
    r = sp.run([str(ref_binary), "-d", "-q", str(p), str(tmp_path / "d.wav")],
               capture_output=True)
    # reference defect: OOB ring-buffer access — observed as a segfault;
    # assert the weaker stable fact (it never round-trips losslessly)
    ref_lossless = r.returncode == 0 and np.array_equal(
        wavio.read_wav(str(tmp_path / "d.wav")).data, pcm)
    assert not ref_lossless


def test_invalid_effort_rejected():
    pcm = gen_wave("sine", 8000, 1, 16, 0, seed=1)
    with pytest.raises(sla.SLAError):
        optimize_encode(pcm, sla.WaveFormat(1, 16, 44100), effort=0)


def test_optimized_stream_reference_decodable(ref_binary, tmp_path):
    """The winner uses API-only parameters (windows/orders the reference CLI
    cannot express) — the reference BINARY must still decode it losslessly."""
    pcm = gen_wave("chirp", 48000, 2, 16, 0, seed=9)
    wf = sla.WaveFormat(2, 16, 44100)
    blob, _ = optimize_encode(pcm, wf, effort=2)
    sla_path = tmp_path / "opt.sla"
    sla_path.write_bytes(blob)
    dec_path = tmp_path / "ref_dec.wav"
    subprocess.run(
        [str(ref_binary), "-d", "-q", str(sla_path), str(dec_path)],
        check=True, capture_output=True,
    )
    back = wavio.read_wav(str(dec_path))
    assert back.num_channels == 2 and back.bits_per_sample == 16
    assert np.array_equal(back.data, pcm)


def test_cli_optimize(tmp_path):
    pcm = gen_wave("chirp", 40000, 2, 16, 0, seed=21)
    in_wav = tmp_path / "in.wav"
    wavio.write_wav(str(in_wav), wavio.WavFile(2, 44100, 16, pcm))
    out_opt = tmp_path / "opt.sla"
    out_std = tmp_path / "std.sla"
    assert cli_main(["sla", "-e", "-q", "-O", "1", str(in_wav), str(out_opt)]) == 0
    assert cli_main(["sla", "-e", "-q", str(in_wav), str(out_std)]) == 0
    assert out_opt.stat().st_size <= out_std.stat().st_size
    dec_wav = tmp_path / "dec.wav"
    assert cli_main(["sla", "-d", "-q", str(out_opt), str(dec_wav)]) == 0
    assert np.array_equal(wavio.read_wav(str(dec_wav)).data, pcm)


def test_cli_optimize_bad_effort(tmp_path, capsys):
    in_wav = tmp_path / "in.wav"
    wavio.write_wav(
        str(in_wav), wavio.WavFile(1, 44100, 16, gen_wave("sine", 4000, 1, 16, 0, seed=2))
    )
    assert cli_main(["sla", "-e", "-q", "-O", "3", str(in_wav),
                     str(tmp_path / "o.sla")]) == 1
    assert "optimize effort" in capsys.readouterr().err


def test_cli_optimize_rejected_in_corpus_mode(tmp_path, capsys):
    in_dir = tmp_path / "corpus"
    in_dir.mkdir()
    wavio.write_wav(
        str(in_dir / "a.wav"),
        wavio.WavFile(1, 44100, 16, gen_wave("sine", 4000, 1, 16, 0, seed=2)),
    )
    assert cli_main(["sla", "-e", "-q", "-b", "-O", "1", str(in_dir),
                     str(tmp_path / "out")]) == 1
    assert "corpus" in capsys.readouterr().err
