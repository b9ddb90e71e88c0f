"""Analysis-layer property tests (reference: test_SLAPredictor.c:717-830,
test_SLAUtility.c LU-solver cases)."""

import numpy as np
import pytest

from sla_tpu import native
from sla_tpu.analysis.partition import dijkstra_partition, _BIGWEIGHT
from sla_tpu.analysis.pitch import longterm_coef_rows


@pytest.mark.parametrize("period", [4, 7, 16, 50, 101, 200, 250])
def test_pitch_detector_finds_synthesized_period(period):
    """A sinusoid with period P must be detected at exactly P (the
    reference's own property, test_SLAPredictor.c:717-768; its search needs
    an oscillating autocorrelation, so pure pulse trains at tiny periods
    are legitimately undetectable)."""
    n = 4096
    t = np.arange(n)
    sig = (np.sin(2 * np.pi * t / period) * (1 << 20)).astype(np.int32)
    res = longterm_coef_rows(sig[None, :], n, 1, 16384)[0]
    assert res.pitch_period == period
    assert 0.0 < res.coef[0] < 1.0


def test_pitch_detector_silence_and_noise():
    n = 4096
    silent = np.zeros((1, n), dtype=np.int32)
    assert longterm_coef_rows(silent, n, 1, 16384)[0].pitch_period == 0
    rng = np.random.default_rng(0)
    noise = rng.integers(-1000, 1000, (1, n)).astype(np.int32)
    res = longterm_coef_rows(noise, n, 1, 16384)[0]
    # white noise has no dominant pitch; whatever is returned must be a
    # valid value (0 = disabled, or within the legal lag range)
    assert 0 <= res.pitch_period < 256


@pytest.mark.skipif(not native.available(), reason="native build unavailable")
class TestLESolver:
    def test_known_solution(self):
        A = np.array([[2.0, 1.0], [1.0, 3.0]])
        b = np.array([5.0, 10.0])
        x = b.copy()
        assert native.lesolve(A, x, 2) == 0
        assert np.allclose(A @ x, b, rtol=1e-14)

    def test_matches_numpy_on_random_systems(self):
        rng = np.random.default_rng(1)
        for dim in [1, 2, 3, 5, 8]:
            A = rng.standard_normal((dim, dim)) + np.eye(dim) * dim
            b = rng.standard_normal(dim)
            x = b.copy()
            assert native.lesolve(A, x, 2) == 0
            assert np.allclose(x, np.linalg.solve(A, b), rtol=1e-10)

    def test_singular_matrix_rejected(self):
        A = np.array([[1.0, 2.0], [2.0, 4.0]])
        b = np.array([1.0, 2.0])
        x = b.copy()
        assert native.lesolve(A, x, 2) == -1

    def test_iterative_refinement_improves(self):
        """Hilbert-like ill-conditioned system: refined solve must be at
        least as accurate as unrefined."""
        n = 6
        A = 1.0 / (np.arange(n)[:, None] + np.arange(n)[None, :] + 1.0)
        x_true = np.ones(n)
        b = A @ x_true
        x0, x2 = b.copy(), b.copy()
        assert native.lesolve(A, x0, 0) == 0
        assert native.lesolve(A, x2, 2) == 0
        assert np.abs(x2 - x_true).max() <= np.abs(x0 - x_true).max() + 1e-12


class TestDijkstra:
    def test_hand_built_graph(self):
        """Reference-style adjacency test (test_SLAPredictor.c:807+)."""
        V = 4
        adj = np.full((V, V), _BIGWEIGHT)
        adj[0, 1] = 1.0
        adj[1, 2] = 1.0
        adj[2, 3] = 1.0
        adj[0, 3] = 10.0
        assert dijkstra_partition(adj, V) == [1, 1, 1]

    def test_direct_edge_wins(self):
        V = 3
        adj = np.full((V, V), _BIGWEIGHT)
        adj[0, 1] = 5.0
        adj[1, 2] = 5.0
        adj[0, 2] = 6.0
        assert dijkstra_partition(adj, V) == [2]

    def test_long_path_through_cheap_edges(self):
        V = 5
        adj = np.full((V, V), _BIGWEIGHT)
        for i in range(V - 1):
            adj[i, i + 1] = 1.0
        adj[0, 4] = 100.0
        adj[0, 2] = 1.5
        adj[2, 4] = 1.5
        assert dijkstra_partition(adj, V) == [2, 2]


def test_fft_matches_numpy_on_real_signal():
    """The exact NR FFT must agree with numpy's rfft up to float64 noise."""
    if not native.available():
        pytest.skip("native build unavailable")
    rng = np.random.default_rng(3)
    n = 1024
    x = rng.standard_normal(n)
    buf = x.copy()
    native.fft(buf, 1)
    ref = np.fft.rfft(x)
    # realft packing: buf[0]=Re[0], buf[1]=Re[n/2], then (Re, Im) pairs
    # with the imaginary parts NEGATED relative to numpy's convention
    assert np.isclose(buf[0], ref[0].real)
    assert np.isclose(buf[1], ref[n // 2].real)
    re = buf[2::2]
    im = buf[3::2]
    assert np.allclose(re, ref.real[1 : n // 2], atol=1e-9)
    assert np.allclose(np.abs(im), np.abs(ref.imag[1 : n // 2]), atol=1e-9)

class TestNearTieGuard:
    """The partition near-tie guard: exact alternative-path ties (slack 0)
    and near-ties below PARTITION_TIE_EPS must trigger an exact re-price;
    clear margins must not (the guard is on the hot path)."""

    def _tie_adj(self):
        from sla_tpu.analysis.partition import _BIGWEIGHT

        V = 4
        adj = np.full((V, V), _BIGWEIGHT)
        # two equal-cost paths 0->1->3 and 0->2->3, plus a costlier direct edge
        adj[0, 1] = 100.0
        adj[1, 3] = 100.0
        adj[0, 2] = 50.0
        adj[2, 3] = 150.0
        adj[0, 3] = 500.0
        return adj, V

    def test_exact_tie_has_zero_slack(self):
        from sla_tpu.analysis.partition import dijkstra_partition, min_offpath_slack

        adj, V = self._tie_adj()
        hops = dijkstra_partition(adj, V)
        assert min_offpath_slack(adj, V, hops) == 0.0

    def test_clear_margin_reported(self):
        from sla_tpu.analysis.partition import (
            _BIGWEIGHT,
            dijkstra_partition,
            min_offpath_slack,
        )

        V = 4
        adj = np.full((V, V), _BIGWEIGHT)
        adj[0, 1] = 10.0
        adj[1, 3] = 10.0
        adj[0, 3] = 27.0
        adj[0, 2] = 20.0
        adj[2, 3] = 20.0
        hops = dijkstra_partition(adj, V)
        assert hops == [1, 2]
        # off-path alternatives: direct 27 (slack 7) and via node 2 (slack 20)
        assert abs(min_offpath_slack(adj, V, hops) - 7.0) < 1e-12

    def test_near_tie_triggers_exact_reprice(self, monkeypatch):
        """When the off-path slack falls below the tie margin, the search
        must re-price the window with the reference-exact cost model and
        still produce a valid (losslessly decodable) stream. Real signals
        rarely tie (the 350-byte long-path penalty separates hop counts), so
        the guard condition is forced here; tools/fuzz_identity.py
        --near-ties covers the organic byte-identity side (1000/1000)."""
        import sla_tpu as sla
        from sla_tpu import native
        from sla_tpu.analysis import partition

        if not native.available():
            pytest.skip("exact pricing needs the native library")
        calls = []
        orig = partition.exact_span_costs

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(partition, "exact_span_costs", spy)
        # force the near-tie flag through the batched native guard
        orig_solve = native.partition_solve

        def forced(*a, **k):
            hops, needs = orig_solve(*a, **k)
            needs[:] = 1
            return hops, needs

        monkeypatch.setattr(native, "partition_solve", forced)
        monkeypatch.setattr(partition, "min_offpath_slack", lambda *a: 0.0)
        pcm = (
            np.sin(2 * np.pi * np.arange(24576) * 440 / 44100) * 12000
        ).astype(np.int32)[None, :] << 16
        enc = sla.Encoder()
        enc.set_wave_format(sla.WaveFormat(1, 16, 44100))
        enc.set_encode_parameter(
            sla.EncodeParameter(8, 1, 4, sla.ChannelProcessMethod.NONE,
                                sla.PRESETS[0].window_function_type, 12288)
        )
        blob = enc.encode_whole(pcm)
        assert calls, "zero slack did not trigger the exact re-price"
        dec = sla.Decoder()
        _, out = dec.decode_whole(blob)
        assert np.array_equal(out, pcm)


def test_span_cost_error_bound_vs_finite_differences():
    """VERDICT r2 #5: the derived envelope-theorem gradient bound must
    dominate brute-force finite differences of the actual pricing function
    for every perturbation direction, on random spans spanning stable and
    near-unstable (k -> 1) lattices."""
    import numpy as np

    from sla_tpu.analysis.partition import (
        _fast_span_cost,
        span_cost_error_bound,
    )

    rng = np.random.default_rng(3)
    order, bits = 16, 16
    S, C = 40, 2
    n = np.full(S, 12288.0)
    # autocorrelations of AR-ish rows: R_k = R0 * rho^k with mixed decay
    # (rho close to 1 = near-unstable lattice, large conditioning)
    rho = rng.uniform(0.05, 0.999, (S, C, 1))
    R0 = 10.0 ** rng.uniform(-6, 0, (S, C, 1))
    R = R0 * rho ** np.arange(order + 1)[None, None, :]
    R += rng.normal(0, 1e-6, R.shape) * R0  # roughen so k_j vary
    bound = span_cost_error_bound(R, n, order, bits)
    u = 2.0 ** -53
    dR = 4.0 * n[:, None] * u * np.abs(R[..., 0])
    base = _fast_span_cost(R, n, order, bits)
    h = np.abs(R[..., 0]) * 2.0 ** -20
    worst = np.zeros(S)
    for c in range(C):
        for k in range(order + 1):
            Rp = R.copy()
            Rp[:, c, k] += h[:, c]
            g = np.abs(_fast_span_cost(Rp, n, order, bits) - base) / h[:, c]
            worst += g * dR[:, c]
    # the analytic bound must dominate the measured first-order error
    # (allow 1% slack for FD truncation); infinities dominate trivially
    ok = (bound >= worst * 0.99) | np.isinf(bound)
    assert ok.all(), (bound[~ok], worst[~ok])
    # and it must be meaningfully small for well-conditioned spans
    stable = (np.abs(R[..., 1] / R[..., 0]) < 0.9).all(axis=1)
    finite = np.isfinite(bound)
    assert np.all(bound[stable & finite] < 0.25), bound[stable & finite].max()


def test_exact_span_costs_order0():
    """The exact re-price path must route order 0 to the pure-Python twin
    (native scratch kernels require order >= 1) — found by identity fuzz:
    an order-0 encode whose partition hit a near-tie crashed here."""
    import numpy as np

    from sla_tpu.analysis.partition import exact_span_costs

    rng = np.random.default_rng(8)
    data = rng.normal(0, 0.1, (2, 8192))
    positions = np.array([0, 2048, 4096])
    spans = np.array([[0, 1], [0, 2], [1, 2]])
    span_len = np.array([2048, 4096, 2048])
    cost = exact_span_costs(data, positions, spans, span_len, 8192, 0, 16)
    assert np.all(np.isfinite(cost)) and np.all(cost > 0)


def test_quantize_parcor_degenerate_levinson_values():
    """The reference casts rounded doubles to int32 BEFORE clipping
    (SLAEncoder.c:578-583): on x86 cvttsd2si sends NaN, +/-inf and any
    out-of-int32-range value to INT32_MIN, which the clip then pins at the
    NEGATIVE end of the code range (even for +inf). Reachable when the
    Levinson recursion degenerates (e_vec -> 0, SLAPredictor.c:301) — only
    |auto_corr[0]| < FLT_EPSILON is guarded. Pin our quantizer to those
    exact semantics (found as a NaN-cast RuntimeWarning in the
    optimize-mode fuzz)."""
    from sla_tpu.dsp.quantize import quantize_longterm, quantize_parcor

    parcor = np.array(
        [[0.0, np.nan, np.inf, -np.inf, 1e12, -1e12, 0.5, -0.5]]
    )
    code, coef = quantize_parcor(parcor, 7, np.array([0]))
    # orders 1-3: qbits 16 (clip at +/-2^15); orders >=4: qbits 8
    assert code[0, 1] == -32768  # NaN
    assert code[0, 2] == -32768  # +inf clips NEGATIVE via cvttsd2si
    assert code[0, 3] == -32768  # -inf
    assert code[0, 4] == -128    # 1e12 overflows int32 -> INT32_MIN
    assert code[0, 5] == -128
    assert code[0, 6] == 64      # 0.5 * 2^7
    assert code[0, 7] == -64
    # longterm: same cast, no clip; INT32_MIN << 16 wraps to 0 like the C
    q = quantize_longterm(np.array([np.nan, np.inf, 0.5]))
    assert q[0] == 0 and q[1] == 0 and q[2] == (16384 << 16)


def test_ref_log2_c_semantics_on_degenerate_inputs():
    """C's log() never raises: log(0) = -inf, log(<0) = log(NaN) = NaN.
    The pure-Python exact twin must match (math.log raises ValueError
    instead) — found by the no-native degenerate-Levinson fuzz, where a
    zero mean residual power reaches SLAUtility_Log2 before the
    |x| <= FLT_MIN guard (SLAPredictor.c:439)."""
    import math

    from sla_tpu.exact import _ref_log2

    assert _ref_log2(0.0) == float("-inf")
    assert _ref_log2(-0.0) == float("-inf")
    assert math.isnan(_ref_log2(-1.0))
    assert math.isnan(_ref_log2(float("nan")))
    assert _ref_log2(float("inf")) == float("inf")
    assert _ref_log2(0.75) == math.log(0.75) * 1.4426950408889634


def test_c_div_ieee_semantics():
    """Python float `/` raises ZeroDivisionError where C gives ±inf/NaN;
    the Levinson twin divides by -e[delay] which reaches exactly 0 on
    perfectly predictable content (SLAPredictor.c:301 keeps going)."""
    import math

    from sla_tpu.exact import _c_div

    inf = float("inf")
    assert _c_div(1.0, 0.0) == inf
    assert _c_div(-1.0, 0.0) == -inf
    assert _c_div(1.0, -0.0) == -inf
    assert _c_div(-1.0, -0.0) == inf
    assert math.isnan(_c_div(0.0, 0.0))
    assert math.isnan(_c_div(float("nan"), 0.0))
    assert _c_div(1.0, 4.0) == 0.25


class TestLongDoubleGuard:
    """VERDICT r3 #8: exact.py's refinement assumes np.longdouble is x86
    80-bit extended; the runtime probe must warn (once) where it is not."""

    def _fresh(self, monkeypatch):
        from sla_tpu import exact

        monkeypatch.setattr(exact, "_longdouble_checked", False)
        return exact

    def test_probe_matches_on_x86(self):
        import platform

        from sla_tpu import exact

        if platform.machine() not in ("x86_64", "i686", "AMD64"):
            pytest.skip("probe outcome is platform-defined off x86")
        assert exact._longdouble_matches_reference()

    def test_no_warning_when_extended(self, monkeypatch):
        import warnings as _w

        exact = self._fresh(monkeypatch)
        monkeypatch.setattr(exact, "_longdouble_matches_reference", lambda: True)
        A = np.array([[4.0, 1.0], [1.0, 3.0]])
        with _w.catch_warnings():
            _w.simplefilter("error", exact.LongDoubleParityWarning)
            x = exact.lesolve(A, np.array([1.0, 2.0]), 2)
        assert np.allclose(A @ x, [1.0, 2.0])

    def test_warns_once_when_degraded(self, monkeypatch):
        exact = self._fresh(monkeypatch)
        monkeypatch.setattr(exact, "_longdouble_matches_reference", lambda: False)
        A = np.array([[4.0, 1.0], [1.0, 3.0]])
        with pytest.warns(exact.LongDoubleParityWarning, match="mantissa bits"):
            x = exact.lesolve(A, np.array([1.0, 2.0]), 2)
        assert np.allclose(A @ x, [1.0, 2.0])  # degraded != broken
        # second call: checked flag latched, no repeat warning
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("error", exact.LongDoubleParityWarning)
            exact.lesolve(A, np.array([2.0, 1.0]), 2)
