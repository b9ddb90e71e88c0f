"""Filter-kernel tests: predict -> synthesize must reconstruct bit-exactly
(the reference's core oracle, test_SLAPredictor.c:441-538), plus slow NumPy
re-implementations of the C per-sample loops as semantic cross-checks."""

import numpy as np
import pytest

import jax.numpy as jnp

from sla_tpu.kernels.emphasis import de_emphasis, pre_emphasis
from sla_tpu.kernels.lattice import lattice_init_state, lattice_predict, lattice_synthesize
from sla_tpu.kernels.lms import lms_init_state, lms_predict, lms_synthesize
from sla_tpu.kernels.longterm import longterm_init_state, longterm_predict, longterm_synthesize

I32 = np.int32


def waveforms(n, width, seed=0):
    rng = np.random.default_rng(seed)
    amp = (1 << (width - 1)) - 1
    t = np.arange(n)
    return {
        "silence": np.zeros(n, I32),
        "constant": np.full(n, amp // 2, I32),
        "sine": (amp * 0.7 * np.sin(2 * np.pi * t / 128)).astype(I32),
        "noise": rng.integers(-amp // 2, amp // 2, n).astype(I32),
        "nyquist": (amp // 3 * ((-1) ** t)).astype(I32),
        "chirp": (amp * 0.5 * np.sin(2 * np.pi * t * t / (4 * n))).astype(I32),
    }


# --- slow per-sample references reproducing the C semantics -----------------


def lattice_predict_ref(data, coef, order):
    fwd = np.zeros(order + 1, I32)
    bwd = np.zeros(order + 1, I32)
    half = I32(1 << 14)
    res = np.empty_like(data)
    with np.errstate(over="ignore"):
        for n in range(len(data)):
            fwd[0] = data[n]
            for k in range(1, order + 1):
                mul = I32(I32(coef[k] * bwd[k - 1]) + half) >> 15
                fwd[k] = fwd[k - 1] - mul
            for k in range(order, 0, -1):
                mul = I32(I32(coef[k] * fwd[k - 1]) + half) >> 15
                bwd[k] = bwd[k - 1] - mul
            bwd[0] = data[n]
            res[n] = fwd[order]
    return res


def lattice_synth_ref(residual, coef, order):
    bwd = np.zeros(order + 1, I32)
    half = I32(1 << 14)
    out = np.empty_like(residual)
    with np.errstate(over="ignore"):
        for n in range(len(residual)):
            f = residual[n]
            for k in range(order, 0, -1):
                f = f + (I32(I32(coef[k] * bwd[k - 1]) + half) >> 15)
                bwd[k] = bwd[k - 1] - (I32(I32(coef[k] * f) + half) >> 15)
            out[n] = f
            bwd[0] = f
    return out


def lms_predict_ref(data, m):
    fc = np.zeros(m, I32)
    ic = np.zeros(m, I32)
    xb = np.zeros(m, I32)
    pb = np.zeros(m, I32)
    res = np.empty_like(data)
    with np.errstate(over="ignore"):
        for n in range(len(data)):
            if n < m:
                res[n] = data[n]
                xb = np.roll(xb, 1)
                pb = np.roll(pb, 1)
                xb[0] = data[n]
                pb[0] = data[n]
                continue
            pred = I32(512)
            for i in range(m):
                pred = I32(pred + I32(fc[i] * xb[i]) + I32(ic[i] * pb[i]))
            pred = pred >> 10
            res[n] = data[n] - pred
            mag = int(abs(int(res[n]))).bit_length() >> 1
            s = np.sign(res[n])
            fc = (fc + s * mag * np.sign(xb)).astype(I32)
            ic = (ic + s * mag * np.sign(pb)).astype(I32)
            xb = np.roll(xb, 1)
            pb = np.roll(pb, 1)
            xb[0] = data[n]
            pb[0] = pred
    return res


def longterm_predict_ref(data, pitch, q15, taps):
    max_delay = pitch + taps // 2
    out = data.copy()
    for n in range(max_delay, len(data)):
        s = 0
        for j in range(taps):
            s += int(q15[j]) * int(data[n - max_delay + j])
        out[n] = data[n] - I32((s + (1 << 14)) >> 15)
    return out


# --- tests -------------------------------------------------------------------


@pytest.mark.parametrize("order,width", [(4, 16), (16, 16), (16, 24), (48, 24)])
def test_lattice_roundtrip(order, width):
    n = 600
    coefs = np.zeros((1, order), I32)
    rng = np.random.default_rng(order + width)
    coefs[0] = rng.integers(-(1 << 14), 1 << 14, order)
    for name, wave in waveforms(n, width, seed=order).items():
        data = jnp.asarray(wave[None, :])
        res, _ = lattice_predict(data, jnp.asarray(coefs), lattice_init_state(1, order))
        out, _ = lattice_synthesize(res, jnp.asarray(coefs), lattice_init_state(1, order))
        assert np.array_equal(np.asarray(out)[0], wave), name


@pytest.mark.parametrize("order", [16])
def test_lattice_matches_c_semantics(order):
    n = 400
    rng = np.random.default_rng(order)
    coef = np.zeros(order + 1, I32)
    coef[1:] = rng.integers(-(1 << 14), 1 << 14, order)
    wave = waveforms(n, 17, seed=1)["noise"]
    res_ref = lattice_predict_ref(wave, coef, order)
    res, _ = lattice_predict(
        jnp.asarray(wave[None, :]), jnp.asarray(coef[None, 1:]), lattice_init_state(1, order)
    )
    assert np.array_equal(np.asarray(res)[0], res_ref)
    out_ref = lattice_synth_ref(res_ref, coef, order)
    out, _ = lattice_synthesize(
        jnp.asarray(res_ref[None, :]), jnp.asarray(coef[None, 1:]), lattice_init_state(1, order)
    )
    assert np.array_equal(np.asarray(out)[0], out_ref)


@pytest.mark.parametrize("m", [4, 8, 32])
def test_lms_roundtrip(m):
    n = 500
    for name, wave in waveforms(n, 17, seed=m).items():
        res, _ = lms_predict(jnp.asarray(wave[None, :]), lms_init_state(1, m), m)
        out, _ = lms_synthesize(res, lms_init_state(1, m), m)
        assert np.array_equal(np.asarray(out)[0], wave), name


def test_lms_matches_c_semantics():
    m = 8
    wave = waveforms(500, 17, seed=2)["noise"]
    res_ref = lms_predict_ref(wave, m)
    res, _ = lms_predict(jnp.asarray(wave[None, :]), lms_init_state(1, m), m)
    assert np.array_equal(np.asarray(res)[0], res_ref)


@pytest.mark.parametrize("pitch,taps", [(3, 1), (40, 3), (255, 5)])
def test_longterm_roundtrip(pitch, taps):
    n = 900
    rng = np.random.default_rng(pitch)
    q15 = rng.integers(-8000, 8000, taps).astype(I32)
    coef = (q15.astype(np.int64) << 16).astype(I32)[None, :]
    wave = waveforms(n, 17, seed=taps)["sine"]
    p = np.array([pitch], I32)
    res, _ = longterm_predict(
        jnp.asarray(wave[None, :]), jnp.asarray(p), jnp.asarray(coef), taps,
        jnp.zeros((1,), jnp.int32),
    )
    # cross-check against the per-sample C semantics
    res_ref = longterm_predict_ref(wave, pitch, q15, taps)
    assert np.array_equal(np.asarray(res)[0], res_ref)
    out, _ = longterm_synthesize(
        jnp.asarray(res), jnp.asarray(p), jnp.asarray(coef), taps, longterm_init_state(1)
    )
    assert np.array_equal(np.asarray(out)[0], wave)


def test_longterm_pitch_zero_passthrough():
    wave = waveforms(300, 16, seed=3)["noise"]
    coef = np.zeros((1, 3), I32)
    res, _ = longterm_predict(
        jnp.asarray(wave[None, :]), jnp.asarray(np.array([0], I32)), jnp.asarray(coef), 3,
        jnp.zeros((1,), jnp.int32),
    )
    assert np.array_equal(np.asarray(res)[0], wave)


def test_emphasis_roundtrip():
    for name, wave in waveforms(700, 24, seed=4).items():
        pre, _ = pre_emphasis(jnp.asarray(wave[None, :]), jnp.zeros((1,), jnp.int32))
        out, _ = de_emphasis(pre, jnp.zeros((1,), jnp.int32))
        assert np.array_equal(np.asarray(out)[0], wave), name


def test_emphasis_matches_c_semantics():
    wave = waveforms(300, 20, seed=5)["noise"]
    prev = 0
    expect = np.empty_like(wave)
    for n in range(len(wave)):
        expect[n] = wave[n] - ((prev * 31) >> 5)
        prev = wave[n]
    pre, _ = pre_emphasis(jnp.asarray(wave[None, :]), jnp.zeros((1,), jnp.int32))
    assert np.array_equal(np.asarray(pre)[0], expect)


def test_state_carry_across_calls():
    """Splitting a block across two kernel calls must equal one call —
    the invariant the streaming decoder relies on."""
    m = 8
    wave = waveforms(600, 17, seed=6)["chirp"]
    full, _ = lms_predict(jnp.asarray(wave[None, :]), lms_init_state(1, m), m)
    st = lms_init_state(1, m)
    a, st = lms_predict(jnp.asarray(wave[None, :250]), st, m)
    b, st = lms_predict(jnp.asarray(wave[None, 250:]), st, m)
    assert np.array_equal(np.concatenate([np.asarray(a), np.asarray(b)], axis=1), np.asarray(full))


def test_longterm_synthesize_chunked_matches_scan():
    """The chunked synthesis scan (device decode fast path) must equal the
    per-sample scan bit for bit whenever the chunk respects the batch's
    minimum active feedback lag, including warmup crossings, mixed
    pitch-0 rows, and carried streaming state."""
    from sla_tpu.pipeline import _longterm_chunk

    rng = np.random.default_rng(42)
    B, n, taps = 6, 512, 3
    res = rng.integers(-(1 << 20), 1 << 20, (B, n)).astype(I32)
    pitch = np.array([0, 40, 67, 130, 255, 34], I32)
    coef = (rng.integers(-9000, 9000, (B, taps)).astype(np.int64) << 16).astype(I32)
    chunk = _longterm_chunk(pitch, taps, n)
    assert chunk > 1  # min active lag = 34 + 1 - 2 = 33 -> chunk 32
    ref, ref_state = longterm_synthesize(
        jnp.asarray(res), jnp.asarray(pitch), jnp.asarray(coef), taps,
        longterm_init_state(B),
    )
    out, out_state = longterm_synthesize(
        jnp.asarray(res), jnp.asarray(pitch), jnp.asarray(coef), taps,
        longterm_init_state(B), chunk=chunk,
    )
    assert np.array_equal(np.asarray(out), np.asarray(ref))
    assert np.array_equal(np.asarray(out_state[0]), np.asarray(ref_state[0]))
    # resume from carried state (streaming-style second call)
    res2 = rng.integers(-(1 << 20), 1 << 20, (B, 256)).astype(I32)
    ref2, _ = longterm_synthesize(
        jnp.asarray(res2), jnp.asarray(pitch), jnp.asarray(coef), taps, ref_state
    )
    out2, _ = longterm_synthesize(
        jnp.asarray(res2), jnp.asarray(pitch), jnp.asarray(coef), taps,
        out_state, chunk=chunk,
    )
    assert np.array_equal(np.asarray(out2), np.asarray(ref2))


def test_longterm_synthesize_single_tap_paths_agree():
    """The single-tap int32 select path (the T==1 scan specialization)
    must match a scalar reference implementing the C semantics bit for
    bit, including warmup, pitch-0 passthrough, and streaming resume."""
    rng = np.random.default_rng(9)
    B, n = 4, 700
    res = rng.integers(-(1 << 24), 1 << 24, (B, n)).astype(I32)
    pitch = np.array([0, 3, 129, 255], I32)
    coef = (rng.integers(-30000, 30000, (B, 1)).astype(np.int64) << 16).astype(I32)
    out, state = longterm_synthesize(
        jnp.asarray(res), jnp.asarray(pitch), jnp.asarray(coef), 1,
        longterm_init_state(B),
    )
    out = np.asarray(out)
    # reference: plain per-sample loop with the C semantics
    for b in range(B):
        q = int(coef[b, 0]) >> 16
        y = res[b].astype(np.int64).copy()
        if pitch[b] > 0:
            P = int(pitch[b])
            for s in range(P, n):
                pred = (q * int(y[s - P]) + (1 << 14)) >> 15
                y[s] = np.int32(res[b, s] + np.int32(pred))
        assert np.array_equal(out[b], y.astype(np.int32)), b
    # and resuming from carried state matches a fresh full-length run
    out2, _ = longterm_synthesize(
        jnp.asarray(res[:, : n // 2]), jnp.asarray(pitch), jnp.asarray(coef), 1,
        longterm_init_state(B),
    )
    out3, _ = longterm_synthesize(
        jnp.asarray(res[:, n // 2 :]), jnp.asarray(pitch), jnp.asarray(coef), 1,
        longterm_synthesize(
            jnp.asarray(res[:, : n // 2]), jnp.asarray(pitch), jnp.asarray(coef),
            1, longterm_init_state(B),
        )[1],
    )
    assert np.array_equal(
        np.concatenate([np.asarray(out2), np.asarray(out3)], axis=1), out
    )


def test_lattice_order0_passthrough():
    """Order-0 lattice kernels (valid stream parameter): passthrough with
    the state slot tracking the last sample, like the reference's zero-trip
    stage loops."""
    import numpy as np

    from sla_tpu.kernels.lattice import (
        lattice_init_state,
        lattice_predict,
        lattice_synthesize,
    )

    rng = np.random.default_rng(3)
    data = rng.integers(-1000, 1000, (2, 64), dtype=np.int32)
    coef = np.zeros((2, 0), dtype=np.int32)
    st = lattice_init_state(2, 0)
    res, st1 = lattice_predict(data, coef, st)
    assert np.array_equal(np.asarray(res), data)
    assert np.array_equal(np.asarray(st1)[:, 0], data[:, -1])
    out, st2 = lattice_synthesize(res, coef, st)
    assert np.array_equal(np.asarray(out), data)
    assert np.array_equal(np.asarray(st2)[:, 0], data[:, -1])


def test_lms_order_zero_passthrough():
    """LMS order 0 is a valid stream parameter of this framework
    (PARITY.md): the scan kernel must pass through, not crash lax.scan
    with a zero-width carry."""
    import numpy as np

    from sla_tpu.kernels.lms import lms_init_state, lms_predict, lms_synthesize

    data = jnp.asarray(np.arange(-16, 16, dtype=np.int32).reshape(2, 16))
    st = lms_init_state(2, 0)
    out, _ = lms_predict(data, st, 0)
    assert np.array_equal(np.asarray(out), np.asarray(data))
    out, _ = lms_synthesize(data, st, 0)
    assert np.array_equal(np.asarray(out), np.asarray(data))


def test_scan_backend_decodes_order0_streams(monkeypatch):
    """A stream with parcor 0 / lms 0 (ours-only parameter points) must
    decode through the JAX scan backend, not just the native cascade."""
    import numpy as np

    import sla_tpu as sla
    from .test_encode_decode import gen_wave

    pcm = gen_wave("chirp", 9000, 2, 16, 0, seed=3)
    wf = sla.WaveFormat(2, 16, 44100)
    param = sla.EncodeParameter(
        0, 1, 0, sla.ChannelProcessMethod.STEREO_MS,
        sla.WindowFunctionType.SIN, 4096,
    )
    enc = sla.Encoder()
    enc.set_wave_format(wf)
    enc.set_encode_parameter(param)
    blob = enc.encode_whole(pcm)
    from sla_tpu import native
    monkeypatch.setattr(native, "available", lambda: False)
    _, out = sla.Decoder().decode_whole(blob)
    assert np.array_equal(out, pcm)
