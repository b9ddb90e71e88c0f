"""Device entropy path: scan-coded symbol parts + host pack must be
byte-identical to the host recursive-Rice coder."""

import numpy as np
import pytest

import sla_tpu as sla
from sla_tpu import native, rice
from sla_tpu.rice_device import encode_block_payload_device

from .test_encode_decode import gen_wave

pytestmark = pytest.mark.skipif(not native.available(), reason="native build unavailable")


@pytest.mark.parametrize("scale", [20, 5000, 1 << 20, 1 << 30])
@pytest.mark.parametrize("channels", [1, 2, 8])
def test_device_payload_matches_host(scale, channels):
    rng = np.random.default_rng(scale % 97 + channels)
    N = int(rng.integers(500, 2500))
    data = rng.integers(-scale, scale, (channels, N)).astype(np.int32)
    init = rice.calculate_initial_params(list(data))
    assert encode_block_payload_device(data, init) == native.put_data_array(data, init)


def test_device_payload_golomb_branch_falls_back():
    """Tiny residuals select the static-Golomb branch (host path either way)."""
    rng = np.random.default_rng(0)
    data = rng.integers(-2, 3, (2, 1200)).astype(np.int32)
    init = rice.calculate_initial_params(list(data))
    assert encode_block_payload_device(data, init) == native.put_data_array(data, init)


def test_device_payload_extreme_values():
    data = np.array([[2**31 - 1, -(2**31), 0, 1, -1] * 300], dtype=np.int32)
    init = rice.calculate_initial_params(list(data))
    assert encode_block_payload_device(data, init) == native.put_data_array(data, init)


def test_encoder_with_device_entropy_env(monkeypatch):
    """Full encode with SLA_TPU_DEVICE_ENTROPY=1 stays byte-identical."""
    pcm = gen_wave("chirp", 15000, 2, 16, 0, seed=8)

    def encode():
        enc = sla.Encoder()
        enc.set_wave_format(sla.WaveFormat(2, 16, 44100))
        enc.set_encode_parameter(sla.PRESETS[1])
        return enc.encode_whole(pcm)

    base = encode()
    monkeypatch.setenv("SLA_TPU_DEVICE_ENTROPY", "1")
    assert encode() == base


def test_device_entropy_default_on_mesh_backend():
    """VERDICT r2 #7: with the mesh filter backend the entropy symbols are
    coded on-device BY DEFAULT (one batched pass attached at filter time),
    and the stream stays byte-identical to the pure-host encode."""
    pcm = gen_wave("chirp", 30000, 2, 16, 0, seed=11)

    def encode(cfg):
        enc = sla.Encoder(cfg)
        enc.set_wave_format(sla.WaveFormat(2, 16, 44100))
        enc.set_encode_parameter(sla.PRESETS[2])
        blob = enc.encode_whole(pcm)
        return enc, blob

    _, host_blob = encode(sla.EncoderConfig(backend="host"))
    enc_mesh, mesh_blob = encode(sla.EncoderConfig(backend="mesh"))
    assert mesh_blob == host_blob
    assert getattr(enc_mesh, "_device_entropy_active", False), (
        "mesh backend should have attached device entropy parts by default")
    enc_off, off_blob = encode(
        sla.EncoderConfig(backend="mesh", device_entropy="off"))
    assert off_blob == host_blob
    assert not getattr(enc_off, "_device_entropy_active", False)
