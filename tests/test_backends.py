"""Backend equivalence: 'host' (C++), 'device' (JAX pipeline), and 'auto'
must produce byte-identical streams and identical PCM."""

import numpy as np
import pytest

import sla_tpu as sla
from sla_tpu import native
from sla_tpu.pipeline import fetch_int32

from .test_encode_decode import gen_wave


@pytest.mark.parametrize("kind", ["chirp", "gauss"])
def test_encoder_backends_byte_identical(kind):
    pcm = gen_wave(kind, 20000, 2, 16, 0, seed=31)
    blobs = {}
    for backend in ["host", "device", "auto"]:
        if backend == "host" and not native.available():
            continue
        enc = sla.Encoder(sla.EncoderConfig(backend=backend))
        enc.set_wave_format(sla.WaveFormat(2, 16, 44100))
        enc.set_encode_parameter(sla.PRESETS[1])
        blobs[backend] = enc.encode_whole(pcm)
    vals = list(blobs.values())
    assert all(b == vals[0] for b in vals)


def test_decoder_backends_identical():
    import jax

    pcm = gen_wave("chirp", 20000, 2, 16, 0, seed=32)
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(2, 16, 44100))
    enc.set_encode_parameter(sla.PRESETS[1])
    blob = enc.encode_whole(pcm)
    backends = ["host", "device", "auto"]
    if len(jax.devices()) >= 8:
        backends.append("mesh")
    for backend in backends:
        if backend == "host" and not native.available():
            continue
        dec = sla.Decoder(sla.DecoderConfig(backend=backend))
        _, out = dec.decode_whole(blob)
        assert np.array_equal(out, pcm), backend


def test_mesh_backend_byte_identical():
    """backend='mesh': end-to-end encode with rows sharded across the
    8-device virtual mesh produces the same stream as the host backend."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    pcm = gen_wave("chirp", 30000, 2, 16, 0, seed=33)

    def encode(backend):
        enc = sla.Encoder(sla.EncoderConfig(backend=backend))
        enc.set_wave_format(sla.WaveFormat(2, 16, 44100))
        enc.set_encode_parameter(sla.PRESETS[2])
        return enc.encode_whole(pcm)

    assert encode("mesh") == encode("host")


def test_fetch_int32_packing():
    import jax.numpy as jnp

    small = jnp.asarray(np.array([[-32768, 32767, 0, 5]], dtype=np.int32))
    out = fetch_int32(small)
    assert out.dtype == np.int32
    assert np.array_equal(out, np.asarray(small))
    big = jnp.asarray(np.array([[1 << 20, -(1 << 20)]], dtype=np.int32))
    out2 = fetch_int32(big)
    assert np.array_equal(out2, np.asarray(big))
