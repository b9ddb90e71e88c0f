"""Mesh-sharded encode/decode steps on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sla_tpu  # noqa: F401
from sla_tpu.parallel import (
    make_mesh,
    shard_batch,
    sharded_decode_step,
    sharded_encode_step,
)
from sla_tpu.pipeline import encode_filters, decode_stage


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _inputs(NB, NC, L, p, T, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.integers(-(1 << 10), 1 << 10, (NB, NC, L), dtype=np.int32)
    coef = rng.integers(-(1 << 14), 1 << 14, (NB, NC, p), dtype=np.int32)
    pitch = rng.integers(0, 64, (NB, NC), dtype=np.int32)
    ltm = (rng.integers(-(1 << 14), 1 << 14, (NB, NC, T), dtype=np.int64) << 16).astype(
        np.int32
    )
    return data, coef, pitch, ltm


@needs_8
@pytest.mark.parametrize("channel_parallel", [1, 2])
def test_sharded_encode_matches_unsharded(channel_parallel):
    mesh = make_mesh(jax.devices()[:8], channel_parallel=channel_parallel)
    p, T, M = 8, 1, 4
    NB, NC, L = 2 * mesh.shape["blocks"], mesh.shape["channels"], 256
    data, coef, pitch, ltm = _inputs(NB, NC, L, p, T)
    d = shard_batch(mesh, data, coef, ltm)
    d_pitch = shard_batch(mesh, pitch[..., None])[0][..., 0]
    res, abs_sum, gmax = sharded_encode_step(d[0], d[1], d_pitch, d[2], p, T, M, mesh)
    ref = np.asarray(
        encode_filters(
            jnp.asarray(data.reshape(NB * NC, L)),
            jnp.asarray(coef.reshape(NB * NC, p)),
            jnp.asarray(pitch.reshape(NB * NC)),
            jnp.asarray(ltm.reshape(NB * NC, T)),
            p, T, M,
        )
    )
    assert np.array_equal(np.asarray(res).reshape(NB * NC, L), ref)
    assert np.isfinite(float(np.asarray(gmax)))


@needs_8
def test_sharded_decode_roundtrip():
    mesh = make_mesh(jax.devices()[:8], channel_parallel=2)
    p, T, M = 8, 1, 4
    NB, NC, L = 2 * mesh.shape["blocks"], mesh.shape["channels"], 256
    data, coef, pitch, ltm = _inputs(NB, NC, L, p, T, seed=5)
    d = shard_batch(mesh, data, coef, ltm)
    d_pitch = shard_batch(mesh, pitch[..., None])[0][..., 0]
    res, _, _ = sharded_encode_step(d[0], d[1], d_pitch, d[2], p, T, M, mesh)
    pcm = sharded_decode_step(res, d[1], d_pitch, d[2], p, T, M, mesh)
    # sharded encode -> sharded decode reproduces the input exactly
    assert np.array_equal(np.asarray(pcm), data)
    # and matches the unsharded decode of the same residual
    ref = np.asarray(
        decode_stage(
            jnp.asarray(np.asarray(res).reshape(NB * NC, L)),
            jnp.asarray(coef.reshape(NB * NC, p)),
            jnp.asarray(pitch.reshape(NB * NC)),
            jnp.asarray(ltm.reshape(NB * NC, T)),
            p, T, M,
        )
    )
    assert np.array_equal(np.asarray(pcm).reshape(NB * NC, L), ref)
