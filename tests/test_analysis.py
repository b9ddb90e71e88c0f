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