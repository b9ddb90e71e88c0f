"""Pallas kernel equivalence in interpreter mode (CPU-runnable CI guard;
the compiled TPU path is exercised on hardware and produces bit-identical
streams — see BASELINE.md kernel throughput notes)."""

import numpy as np
import pytest

import jax.numpy as jnp

import sla_tpu  # noqa: F401
from sla_tpu.kernels.lattice import lattice_init_state, lattice_predict, lattice_synthesize
from sla_tpu.kernels.lms import lms_init_state, lms_predict, lms_synthesize
from sla_tpu.kernels.emphasis import de_emphasis, pre_emphasis
from sla_tpu.kernels.pallas_filters import TILE_B, TILE_L, lattice_filter_tl, lms_filter_tl

B, L = TILE_B, TILE_L


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    data = rng.integers(-30000, 30000, (B, L), dtype=np.int32)
    coef = rng.integers(-25000, 25000, (B, 16), dtype=np.int32)
    return data, coef


def test_lattice_predict_interpret(batch):
    data, coef = batch
    emph, _ = pre_emphasis(jnp.asarray(data), jnp.zeros((B,), jnp.int32))
    ref, _ = lattice_predict(emph, jnp.asarray(coef), lattice_init_state(B, 16))
    out = np.asarray(
        lattice_filter_tl(jnp.asarray(data.T), jnp.asarray(coef.T), 16, interpret=True)
    ).T
    assert np.array_equal(out, np.asarray(ref))


def test_lattice_synthesize_interpret(batch):
    data, coef = batch
    ref, _ = lattice_synthesize(jnp.asarray(data), jnp.asarray(coef), lattice_init_state(B, 16))
    ref, _ = de_emphasis(ref, jnp.zeros((B,), jnp.int32))
    out = np.asarray(
        lattice_filter_tl(
            jnp.asarray(data.T), jnp.asarray(coef.T), 16, synthesize=True, interpret=True
        )
    ).T
    assert np.array_equal(out, np.asarray(ref))


@pytest.mark.parametrize("synthesize", [False, True])
def test_lms_interpret(batch, synthesize):
    data, _ = batch
    fn = lms_synthesize if synthesize else lms_predict
    ref, _ = fn(jnp.asarray(data), lms_init_state(B, 8), 8)
    out = np.asarray(
        lms_filter_tl(jnp.asarray(data.T), 8, synthesize=synthesize, interpret=True)
    ).T
    assert np.array_equal(out, np.asarray(ref))


@pytest.mark.parametrize("num_taps", [1, 3, 5])
def test_longterm_synth_interpret(num_taps):
    """Pallas ring-select long-term synthesis vs the XLA scan reference,
    mixed active/inactive rows, multi-tile L (state persists across l)."""
    from sla_tpu.kernels.longterm import longterm_init_state, longterm_synthesize
    from sla_tpu.kernels.pallas_filters import longterm_synth_tl

    rng = np.random.default_rng(7)
    L2 = 2 * TILE_L
    data = rng.integers(-(1 << 23), 1 << 23, (B, L2), dtype=np.int32)
    pitch = rng.integers(0, 256, (B,), dtype=np.int32)
    pitch[::3] = 0  # inactive rows pass through
    pitch[(pitch > 0) & (pitch < num_taps)] += num_taps  # valid short lags
    coef = (rng.integers(-32768, 32768, (B, num_taps), dtype=np.int32) << 16)

    ref, _ = longterm_synthesize(
        jnp.asarray(data), jnp.asarray(pitch), jnp.asarray(coef), num_taps,
        longterm_init_state(B),
    )
    ref = np.where((pitch > 0)[:, None], np.asarray(ref), data)
    md = np.where(pitch > 0, pitch + num_taps // 2, 0).astype(np.int32)
    prm = np.concatenate([md[:, None], coef >> 16], axis=1).astype(np.int32)
    out = np.asarray(
        longterm_synth_tl(jnp.asarray(data.T), jnp.asarray(prm.T), num_taps,
                          interpret=True)
    ).T
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("hist_d,max_pitch", [(72, 64), (136, 128)])
def test_longterm_synth_small_rings(hist_d, max_pitch):
    """Size-dispatched VMEM rings (per-step work is linear in ring depth)
    must stay bit-identical to the scan for lags under their capacity."""
    from sla_tpu.kernels.longterm import longterm_init_state, longterm_synthesize
    from sla_tpu.kernels.pallas_filters import longterm_ring_depth, longterm_synth_tl

    assert longterm_ring_depth(max_pitch + 1) == hist_d
    rng = np.random.default_rng(17)
    data = rng.integers(-(1 << 23), 1 << 23, (B, TILE_L), dtype=np.int32)
    pitch = rng.integers(0, max_pitch + 1, (B,), dtype=np.int32)
    pitch[(pitch > 0) & (pitch < 3)] = 3
    coef = rng.integers(-32768, 32768, (B, 3), dtype=np.int32) << 16

    ref, _ = longterm_synthesize(
        jnp.asarray(data), jnp.asarray(pitch), jnp.asarray(coef), 3,
        longterm_init_state(B),
    )
    ref = np.where((pitch > 0)[:, None], np.asarray(ref), data)
    md = np.where(pitch > 0, pitch + 1, 0).astype(np.int32)
    prm = np.concatenate([md[:, None], coef >> 16], axis=1).astype(np.int32)
    out = np.asarray(
        longterm_synth_tl(jnp.asarray(data.T), jnp.asarray(prm.T), 3,
                          interpret=True, hist_d=hist_d)
    ).T
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("num_taps", [0, 1, 3])
def test_fused_synth_interpret(num_taps):
    """The single-kernel fused decode cascade (LMS -> long-term -> lattice
    + de-emphasis, one HBM round trip) must match the three-stage scan
    chain bit for bit."""
    from sla_tpu.kernels.lattice import lattice_init_state, lattice_synthesize
    from sla_tpu.kernels.lms import lms_init_state, lms_synthesize
    from sla_tpu.kernels.longterm import longterm_init_state, longterm_synthesize
    from sla_tpu.kernels.emphasis import de_emphasis
    from sla_tpu.kernels.pallas_filters import fused_synth_tl

    rng = np.random.default_rng(23)
    p, M = 16, 8
    L2 = 2 * TILE_L
    res = rng.integers(-(1 << 20), 1 << 20, (B, L2), dtype=np.int32)
    coef = rng.integers(-25000, 25000, (B, p), dtype=np.int32)
    pitch = rng.integers(0, 256, (B,), dtype=np.int32)
    pitch[::3] = 0
    if num_taps:
        pitch[(pitch > 0) & (pitch < num_taps)] += num_taps
    ltc = rng.integers(-32768, 32768, (B, max(num_taps, 1)), dtype=np.int32) << 16

    ref, _ = lms_synthesize(jnp.asarray(res), lms_init_state(B, M), M)
    if num_taps:
        lt, _ = longterm_synthesize(
            ref, jnp.asarray(pitch), jnp.asarray(ltc), num_taps,
            longterm_init_state(B),
        )
        ref = jnp.where((pitch > 0)[:, None], lt, ref)
    ref, _ = lattice_synthesize(ref, jnp.asarray(coef), lattice_init_state(B, p))
    ref, _ = de_emphasis(ref, jnp.zeros((B,), jnp.int32))
    ref = np.asarray(ref)

    md = np.where(pitch > 0, pitch + num_taps // 2, 0).astype(np.int32)
    prm = np.concatenate([md[:, None], ltc >> 16], axis=1).astype(np.int32)
    out = np.asarray(
        fused_synth_tl(jnp.asarray(res.T), jnp.asarray(coef.T),
                       jnp.asarray(prm.T), p, num_taps, M, interpret=True)
    ).T
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("num_taps", [1, 3, 5])
def test_fused_synth_windowed_interpret(num_taps):
    """The merged windowed long-term form (lt_win > 0: one sample loop,
    doubled ring, per-tile scalar base) must match the one-hot fused kernel
    bit for bit — including multi-tile batches whose tiles carry different
    hi8 bases, inactive rows, and warmup."""
    from sla_tpu.kernels.pallas_filters import fused_synth_tl

    rng = np.random.default_rng(31)
    p, M = 16, 8
    BB = 2 * TILE_B  # two tiles with different lag bands
    res = rng.integers(-(1 << 20), 1 << 20, (BB, TILE_L), dtype=np.int32)
    coef = rng.integers(-25000, 25000, (BB, p), dtype=np.int32)
    # lag-sorted rows (the pipeline sorts): tile 0 high lags, tile 1 low
    pitch = np.sort(
        rng.integers(16, 250, (BB,), dtype=np.int32)
    )[::-1].copy()
    pitch[5::37] = 0  # sprinkle inactive rows
    ltc = rng.integers(-32768, 32768, (BB, num_taps), dtype=np.int32) << 16
    md = np.where(pitch > 0, pitch + num_taps // 2, 0).astype(np.int32)
    prm = np.concatenate([md[:, None], ltc >> 16], axis=1).astype(np.int32)

    ref = np.asarray(
        fused_synth_tl(jnp.asarray(res.T), jnp.asarray(coef.T),
                       jnp.asarray(prm.T), p, num_taps, M, interpret=True)
    ).T

    tiles = md.reshape(-1, TILE_B).astype(np.int64)
    hi8 = ((tiles.max(1) + 7) // 8 * 8).astype(np.int32)
    lo = np.where(tiles > 0, tiles, 1 << 30).min(1)
    lo = np.where(tiles.max(1) > 0, lo, 0)
    win = int(-(-max(int((hi8 - lo + num_taps).max()), 8) // 8) * 8)
    assert (md[md > 0] - (num_taps - 1)).min() >= 8  # kernel precondition
    out = np.asarray(
        fused_synth_tl(jnp.asarray(res.T), jnp.asarray(coef.T),
                       jnp.asarray(prm.T), p, num_taps, M,
                       lt_win=win, hi8s=jnp.asarray(hi8), interpret=True)
    ).T
    assert np.array_equal(out, ref)


def test_decode_stage_pallas_sorts_and_windows(monkeypatch):
    """The window plan (_longterm_window_plan) + _decode_stage_pallas with
    unsorted pitches must engage the windowed path (sort rows, per-tile
    hi8, unsort the output) and still match the scan twin exactly."""
    from sla_tpu.pipeline import (
        _decode_stage_pallas,
        _decode_stage_scan,
        _longterm_window_plan,
    )

    rng = np.random.default_rng(41)
    p, T, M = 16, 3, 8
    # enough rows that the lag sort packs tiles into narrow bands (a small
    # batch whose single tile spans the whole pitch range correctly falls
    # back to the one-hot path — _longterm_window_plan returns 0);
    # non-multiple rows exercise padding after the sort
    BB = 4 * TILE_B + 24
    res = rng.integers(-(1 << 18), 1 << 18, (BB, TILE_L), dtype=np.int32)
    coef = rng.integers(-25000, 25000, (BB, p), dtype=np.int32)
    pitch = rng.integers(16, 250, (BB,), dtype=np.int32)
    pitch[::6] = 0
    ltc = rng.integers(-32768, 32768, (BB, T), dtype=np.int32) << 16

    lt_win, hi8s, order = _longterm_window_plan(pitch, T, BB)
    assert lt_win > 0 and order is not None, "windowed plan did not engage"

    # interpret-mode kernels so the windowed kernel runs on CPU
    import sla_tpu.kernels.pallas_filters as pf
    orig = pf.fused_synth_tl

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pf, "fused_synth_tl", interp)
    out = np.asarray(
        _decode_stage_pallas(
            jnp.asarray(res), jnp.asarray(coef), jnp.asarray(pitch),
            jnp.asarray(ltc), p, T, M, lt_win=lt_win,
            hi8s=jnp.asarray(hi8s), order=jnp.asarray(order),
        )
    )
    ref = np.asarray(
        _decode_stage_scan(
            jnp.asarray(res), jnp.asarray(coef), jnp.asarray(pitch),
            jnp.asarray(ltc), p, T, M,
        )
    )
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("num_taps", [1, 3, 5])
def test_fused_stage2_windowed_interpret(num_taps):
    """The merged encode stage 2 (windowed long-term FIR + LMS predict in
    one kernel) must match the gated-FIR + LMS scan chain bit for bit."""
    from sla_tpu.pipeline import _encode_stage2_scan
    from sla_tpu.kernels.pallas_filters import (
        fused_stage2_tl, longterm_ring_depth,
    )

    rng = np.random.default_rng(53)
    M = 8
    BB = 2 * TILE_B
    res = rng.integers(-(1 << 20), 1 << 20, (BB, TILE_L), dtype=np.int32)
    pitch = np.sort(rng.integers(16, 250, (BB,), dtype=np.int32))[::-1].copy()
    pitch[5::31] = 0
    ltc = rng.integers(-32768, 32768, (BB, num_taps), dtype=np.int32) << 16

    ref = np.asarray(
        _encode_stage2_scan(
            jnp.asarray(res), jnp.asarray(pitch), jnp.asarray(ltc),
            num_taps, M,
        )
    )
    md = np.where(pitch > 0, pitch + num_taps // 2, 0).astype(np.int64)
    tiles = md.reshape(-1, TILE_B)
    hi8s = ((tiles.max(1) + 7) // 8 * 8).astype(np.int32)
    lo = np.where(tiles > 0, tiles, 1 << 30).min(1)
    lo = np.where(tiles.max(1) > 0, lo, 0)
    lt_win = int(-(-max(int((hi8s - lo + num_taps).max()), 8) // 8) * 8)
    assert (md[md > 0] - (num_taps - 1)).min() >= 8  # kernel precondition
    prm = np.concatenate(
        [md[:, None].astype(np.int32), ltc >> 16], axis=1
    ).astype(np.int32)
    ring = longterm_ring_depth(int(md.max()))
    out = np.asarray(
        fused_stage2_tl(jnp.asarray(res.T), jnp.asarray(prm.T), num_taps, M,
                        hist_d=ring, lt_win=lt_win,
                        hi8s=jnp.asarray(hi8s), interpret=True)
    ).T
    assert np.array_equal(out, ref)


def test_encode_stage2_dispatches_windowed(monkeypatch):
    """encode_stage2 with concrete pitches on the Pallas path must engage
    the merged windowed kernel and match the scan twin exactly."""
    import sla_tpu.pipeline as pipeline
    from sla_tpu.pipeline import encode_stage2, _encode_stage2_scan

    rng = np.random.default_rng(59)
    T, M = 3, 8
    BB = 4 * TILE_B
    res = rng.integers(-(1 << 18), 1 << 18, (BB, TILE_L), dtype=np.int32)
    pitch = rng.integers(16, 250, (BB,), dtype=np.int32)
    pitch[::5] = 0
    ltc = rng.integers(-32768, 32768, (BB, T), dtype=np.int32) << 16

    monkeypatch.setattr(pipeline, "_use_pallas", lambda: True)
    import sla_tpu.kernels.pallas_filters as pf
    orig = pf.fused_stage2_tl
    hits = {}

    def interp(*a, **k):
        k["interpret"] = True
        hits["win"] = k.get("lt_win", 0)
        return orig(*a, **k)

    monkeypatch.setattr(pf, "fused_stage2_tl", interp)
    out = np.asarray(
        encode_stage2(jnp.asarray(res), np.asarray(pitch), jnp.asarray(ltc), T, M)
    )
    assert hits.get("win", 0) > 0, "merged stage-2 kernel did not engage"
    ref = np.asarray(
        _encode_stage2_scan(
            jnp.asarray(res), jnp.asarray(pitch), jnp.asarray(ltc), T, M
        )
    )
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("num_taps", [1, 3, 5])
def test_fused_encode_windowed_interpret(num_taps):
    """The fully-merged encode cascade (pre-emphasis -> lattice predict ->
    windowed long-term FIR -> LMS predict, ONE kernel) must match
    encode_filters (the scan chain) bit for bit."""
    from sla_tpu.pipeline import encode_filters
    from sla_tpu.kernels.pallas_filters import (
        fused_encode_tl, longterm_ring_depth,
    )

    rng = np.random.default_rng(61)
    p, M = 16, 8
    BB = 2 * TILE_B
    data = rng.integers(-30000, 30000, (BB, TILE_L), dtype=np.int32)
    coef = rng.integers(-25000, 25000, (BB, p), dtype=np.int32)
    pitch = np.sort(rng.integers(16, 250, (BB,), dtype=np.int32))[::-1].copy()
    pitch[5::31] = 0
    ltc = rng.integers(-32768, 32768, (BB, num_taps), dtype=np.int32) << 16

    ref = np.asarray(
        encode_filters(
            jnp.asarray(data), jnp.asarray(coef), jnp.asarray(pitch),
            jnp.asarray(ltc), p, num_taps, M,
        )
    )
    md = np.where(pitch > 0, pitch + num_taps // 2, 0).astype(np.int64)
    tiles = md.reshape(-1, TILE_B)
    hi8s = ((tiles.max(1) + 7) // 8 * 8).astype(np.int32)
    lo = np.where(tiles > 0, tiles, 1 << 30).min(1)
    lo = np.where(tiles.max(1) > 0, lo, 0)
    lt_win = int(-(-max(int((hi8s - lo + num_taps).max()), 8) // 8) * 8)
    assert (md[md > 0] - (num_taps - 1)).min() >= 8  # kernel precondition
    prm = np.concatenate(
        [md[:, None].astype(np.int32), ltc >> 16], axis=1
    ).astype(np.int32)
    ring = longterm_ring_depth(int(md.max()))
    out = np.asarray(
        fused_encode_tl(jnp.asarray(data.T), jnp.asarray(coef.T),
                        jnp.asarray(prm.T), p, num_taps, M,
                        hist_d=ring, lt_win=lt_win,
                        hi8s=jnp.asarray(hi8s), interpret=True)
    ).T
    assert np.array_equal(out, ref)


def test_encode_filters_fused_dispatches_and_sorts(monkeypatch):
    """encode_filters_fused with concrete UNSORTED pitches must engage the
    fully-merged kernel (lag sort/unsort around it) and match the scan
    chain exactly; rows not a multiple of TILE_B exercise the padding."""
    import sla_tpu.pipeline as pipeline
    from sla_tpu.pipeline import encode_filters, encode_filters_fused

    rng = np.random.default_rng(67)
    p, T, M = 8, 3, 8
    BB = 3 * TILE_B + TILE_B // 2  # 448 rows: pad to 4 tiles
    data = rng.integers(-30000, 30000, (BB, TILE_L), dtype=np.int32)
    coef = rng.integers(-25000, 25000, (BB, p), dtype=np.int32)
    pitch = rng.integers(16, 250, (BB,), dtype=np.int32)
    pitch[::5] = 0
    ltc = rng.integers(-32768, 32768, (BB, T), dtype=np.int32) << 16

    monkeypatch.setattr(pipeline, "_use_pallas", lambda: True)
    import sla_tpu.kernels.pallas_filters as pf
    orig = pf.fused_encode_tl
    hits = {}

    def interp(*a, **k):
        k["interpret"] = True
        hits["win"] = k.get("lt_win", 0)
        return orig(*a, **k)

    monkeypatch.setattr(pf, "fused_encode_tl", interp)
    out = np.asarray(
        encode_filters_fused(
            jnp.asarray(data), jnp.asarray(coef), np.asarray(pitch),
            jnp.asarray(ltc), p, T, M,
        )
    )
    assert hits.get("win", 0) > 0, "merged encode kernel did not engage"
    ref = np.asarray(
        encode_filters(
            jnp.asarray(data), jnp.asarray(coef), jnp.asarray(pitch),
            jnp.asarray(ltc), p, T, M,
        )
    )
    assert np.array_equal(out, ref)


def test_encode_filters_fused_fallback_no_pitch():
    """All-zero pitches (no long-term rows anywhere) must fall back to the
    stage1+stage2 path and still match encode_filters."""
    from sla_tpu.pipeline import encode_filters, encode_filters_fused

    rng = np.random.default_rng(71)
    p, T, M = 8, 1, 4
    BB = 16
    data = rng.integers(-30000, 30000, (BB, 2048), dtype=np.int32)
    coef = rng.integers(-25000, 25000, (BB, p), dtype=np.int32)
    pitch = np.zeros(BB, dtype=np.int32)
    ltc = np.zeros((BB, T), dtype=np.int32)
    out = np.asarray(
        encode_filters_fused(
            jnp.asarray(data), jnp.asarray(coef), pitch,
            jnp.asarray(ltc), p, T, M,
        )
    )
    ref = np.asarray(
        encode_filters(
            jnp.asarray(data), jnp.asarray(coef), jnp.asarray(pitch),
            jnp.asarray(ltc), p, T, M,
        )
    )
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("num_taps", [1, 3])
def test_fused_wide_interpret(num_taps):
    """The WIDE (sublane-batched) fused cascades — 8 independent row-groups
    packed onto the sublane axis — must match the scan chains bit for bit:
    encode (pre-emphasis -> lattice predict -> windowed long-term ->
    LMS predict) and decode (LMS synth -> long-term -> lattice synth),
    over two 1024-row groups with different lag bands, inactive rows, and
    warmup."""
    from sla_tpu.pipeline import _decode_stage_scan, encode_filters
    from sla_tpu.kernels.pallas_filters import (
        _WG, fused_encode_wide_tl, fused_synth_wide_tl, longterm_ring_depth,
    )

    rng = np.random.default_rng(83)
    p, M = 16, 8
    BB = 2 * _WG * TILE_B  # two wide groups
    LL = 512
    data = rng.integers(-30000, 30000, (BB, LL), dtype=np.int32)
    coef = rng.integers(-25000, 25000, (BB, p), dtype=np.int32)
    pitch = np.sort(rng.integers(150, 250, (BB,), dtype=np.int32))[::-1].copy()
    pitch[5::31] = 0
    ltc = rng.integers(-32768, 32768, (BB, num_taps), dtype=np.int32) << 16

    md = np.where(pitch > 0, pitch + num_taps // 2, 0).astype(np.int64)
    groups = md.reshape(-1, _WG * TILE_B)
    hi8s = ((groups.max(1) + 7) // 8 * 8).astype(np.int32)
    lo = np.where(groups > 0, groups, 1 << 30).min(1)
    lo = np.where(groups.max(1) > 0, lo, 0)
    lt_win = int(-(-max(int((hi8s - lo + num_taps).max()), 8) // 8) * 8)
    assert (md[md > 0] - (num_taps - 1)).min() >= 8
    assert lt_win <= 160
    prm = np.concatenate(
        [md[:, None].astype(np.int32), ltc >> 16], axis=1
    ).astype(np.int32)
    ring = longterm_ring_depth(int(md.max()))

    ref = np.asarray(
        encode_filters(
            jnp.asarray(data), jnp.asarray(coef), jnp.asarray(pitch),
            jnp.asarray(ltc), p, num_taps, M,
        )
    )
    out = np.asarray(
        fused_encode_wide_tl(
            jnp.asarray(data.T), jnp.asarray(coef.T), jnp.asarray(prm.T),
            p, num_taps, M, hist_d=ring, lt_win=lt_win,
            hi8s=jnp.asarray(hi8s), interpret=True,
        )
    ).T
    assert np.array_equal(out, ref)

    res = rng.integers(-(1 << 20), 1 << 20, (BB, LL), dtype=np.int32)
    refd = np.asarray(
        _decode_stage_scan(
            jnp.asarray(res), jnp.asarray(coef), jnp.asarray(pitch),
            jnp.asarray(ltc), p, num_taps, M,
        )
    )
    outd = np.asarray(
        fused_synth_wide_tl(
            jnp.asarray(res.T), jnp.asarray(coef.T), jnp.asarray(prm.T),
            p, num_taps, M, hist_d=ring, lt_win=lt_win,
            hi8s=jnp.asarray(hi8s), interpret=True,
        )
    ).T
    assert np.array_equal(outd, refd)


def test_window_plan_auto_prefers_wide():
    """_window_plan_auto must return the wide plan (1024-row groups) when
    B % 1024 == 0 and L % 512 == 0, the narrow plan otherwise, and the
    wide hi8s must be per-group."""
    from sla_tpu.kernels.pallas_filters import _WG
    from sla_tpu.pipeline import _window_plan_auto

    rng = np.random.default_rng(89)
    BB = 2 * _WG * TILE_B
    pitch = np.sort(rng.integers(150, 250, (BB,), dtype=np.int32))[::-1].copy()

    wide, lt_win, hi8s, order = _window_plan_auto(pitch, 1, BB, 2048)
    assert wide and lt_win > 0 and hi8s.shape == (2,)

    # non-multiple row count within the <=2x padding rule: still wide,
    # hi8s covers the padded groups
    wide, lt_win, hi8s, order = _window_plan_auto(pitch[:-128], 1, BB - 128, 2048)
    assert wide and lt_win > 0 and hi8s.shape == (2,)

    # small batch (256 -> pad 1024 is 4x waste): narrow plan, per-TILE_B hi8s
    wide, lt_win, hi8s, order = _window_plan_auto(pitch[:256], 1, 256, 2048)
    assert not wide and lt_win > 0 and hi8s.shape == (2,)

    # L not a multiple of the wide L-tile: narrow plan
    wide, lt_win, hi8s, order = _window_plan_auto(pitch, 1, BB, 2048 + 256)
    assert not wide


def test_decode_stage_dispatches_wide(monkeypatch):
    """decode_stage over a 1024-row batch must dispatch the WIDE fused
    kernel (asserted via monkeypatch) and match the scan twin exactly."""
    import sla_tpu.kernels.pallas_filters as pf
    from sla_tpu.pipeline import _decode_stage_scan, decode_stage

    rng = np.random.default_rng(97)
    p, T, M = 16, 3, 8
    BB = pf._WG * TILE_B
    res = rng.integers(-(1 << 18), 1 << 18, (BB, TILE_L), dtype=np.int32)
    coef = rng.integers(-25000, 25000, (BB, p), dtype=np.int32)
    pitch = rng.integers(150, 250, (BB,), dtype=np.int32)
    pitch[::6] = 0
    ltc = rng.integers(-32768, 32768, (BB, T), dtype=np.int32) << 16

    calls = []
    orig = pf.fused_synth_wide_tl

    def interp(*a, **k):
        calls.append(1)
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pf, "fused_synth_wide_tl", interp)
    monkeypatch.setattr("sla_tpu.pipeline._use_pallas", lambda: True)
    out = np.asarray(
        decode_stage(
            jnp.asarray(res), jnp.asarray(coef), jnp.asarray(pitch),
            jnp.asarray(ltc), p, T, M,
        )
    )
    assert calls, "wide kernel did not dispatch"
    ref = np.asarray(
        _decode_stage_scan(
            jnp.asarray(res), jnp.asarray(coef), jnp.asarray(pitch),
            jnp.asarray(ltc), p, T, M,
        )
    )
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("num_taps", [1, 3])
def test_fused_stage2_wide_interpret(num_taps):
    """The wide merged stage 2 (windowed long-term FIR + LMS predict over
    sublane-batched row-groups) must match the gated-FIR + LMS scan chain
    bit for bit."""
    from sla_tpu.kernels.lms import lms_init_state, lms_predict
    from sla_tpu.kernels.longterm import longterm_predict
    from sla_tpu.kernels.pallas_filters import (
        _WG, fused_stage2_wide_tl, longterm_ring_depth,
    )

    rng = np.random.default_rng(101)
    M = 8
    BB = 2 * _WG * TILE_B
    LL = 512
    res = rng.integers(-(1 << 18), 1 << 18, (BB, LL), dtype=np.int32)
    pitch = np.sort(rng.integers(150, 250, (BB,), dtype=np.int32))[::-1].copy()
    pitch[5::31] = 0
    ltc = rng.integers(-32768, 32768, (BB, num_taps), dtype=np.int32) << 16

    md = np.where(pitch > 0, pitch + num_taps // 2, 0).astype(np.int64)
    groups = md.reshape(-1, _WG * TILE_B)
    hi8s = ((groups.max(1) + 7) // 8 * 8).astype(np.int32)
    lo = np.where(groups > 0, groups, 1 << 30).min(1)
    lo = np.where(groups.max(1) > 0, lo, 0)
    lt_win = int(-(-max(int((hi8s - lo + num_taps).max()), 8) // 8) * 8)
    assert lt_win <= 160
    prm = np.concatenate(
        [md[:, None].astype(np.int32), ltc >> 16], axis=1
    ).astype(np.int32)
    ring = longterm_ring_depth(int(md.max()))

    lt_res, _ = longterm_predict(
        jnp.asarray(res), jnp.asarray(pitch), jnp.asarray(ltc), num_taps,
        jnp.zeros((BB,), jnp.int32),
    )
    gated = jnp.where((pitch > 0)[:, None], lt_res, jnp.asarray(res))
    ref, _ = lms_predict(gated, lms_init_state(BB, M), M)
    ref = np.asarray(ref)

    out = np.asarray(
        fused_stage2_wide_tl(
            jnp.asarray(res.T), jnp.asarray(prm.T), num_taps, M,
            hist_d=ring, lt_win=lt_win, hi8s=jnp.asarray(hi8s),
            interpret=True,
        )
    ).T
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("synthesize", [False, True])
def test_lattice_wide_interpret(synthesize):
    """The wide lattice kernel (both directions, with pre/de-emphasis)
    must match the scan twins bit for bit."""
    from sla_tpu.kernels.pallas_filters import _WG, lattice_filter_wide_tl

    rng = np.random.default_rng(103)
    p = 16
    BB = _WG * TILE_B
    LL = 512
    data = rng.integers(-30000, 30000, (BB, LL), dtype=np.int32)
    coef = rng.integers(-25000, 25000, (BB, p), dtype=np.int32)
    if synthesize:
        ref, _ = lattice_synthesize(
            jnp.asarray(data), jnp.asarray(coef),
            lattice_init_state(BB, p),
        )
        ref, _ = de_emphasis(ref, jnp.zeros((BB,), jnp.int32))
    else:
        emp, _ = pre_emphasis(jnp.asarray(data), jnp.zeros((BB,), jnp.int32))
        ref, _ = lattice_predict(
            emp, jnp.asarray(coef), lattice_init_state(BB, p)
        )
    ref = np.asarray(ref)
    out = np.asarray(
        lattice_filter_wide_tl(
            jnp.asarray(data.T), jnp.asarray(coef.T), p,
            synthesize=synthesize, interpret=True,
        )
    ).T
    assert np.array_equal(out, ref)


def test_decode_stage_dispatches_wide_padded(monkeypatch):
    """A 640-row batch (not a 1024 multiple, but within the <=2x padding
    rule) must still dispatch the wide kernel — rows padded to 1024 with
    an inactive tail — and match the scan twin exactly."""
    import sla_tpu.kernels.pallas_filters as pf
    from sla_tpu.pipeline import _decode_stage_scan, decode_stage

    rng = np.random.default_rng(107)
    p, T, M = 16, 1, 8
    BB = 5 * TILE_B  # 640 -> padded to 1024
    res = rng.integers(-(1 << 18), 1 << 18, (BB, TILE_L), dtype=np.int32)
    coef = rng.integers(-25000, 25000, (BB, p), dtype=np.int32)
    pitch = rng.integers(150, 250, (BB,), dtype=np.int32)
    pitch[::7] = 0
    ltc = rng.integers(-32768, 32768, (BB, T), dtype=np.int32) << 16

    calls = []
    orig = pf.fused_synth_wide_tl

    def interp(*a, **k):
        calls.append(1)
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pf, "fused_synth_wide_tl", interp)
    monkeypatch.setattr("sla_tpu.pipeline._use_pallas", lambda: True)
    out = np.asarray(
        decode_stage(
            jnp.asarray(res), jnp.asarray(coef), jnp.asarray(pitch),
            jnp.asarray(ltc), p, T, M,
        )
    )
    assert calls, "padded wide kernel did not dispatch"
    ref = np.asarray(
        _decode_stage_scan(
            jnp.asarray(res), jnp.asarray(coef), jnp.asarray(pitch),
            jnp.asarray(ltc), p, T, M,
        )
    )
    assert np.array_equal(out, ref)
