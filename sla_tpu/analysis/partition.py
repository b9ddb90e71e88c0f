"""Optimal block partitioning (reference: src/SLAPredictor.c:1465-1705).

The reference builds a DAG whose nodes sit every 1024 samples; edge (i, j)
carries the estimated code length of encoding that span (fresh LPC analysis
per edge, O(V^2) full autocorrelations), then runs O(V^2) Dijkstra.

Rebuilt data-parallel: all span autocorrelations come from `order+1`
prefix-sum arrays over the window — R_span(i,j)[k] = P_k[end-k] - P_k[start]
with P_k[m] = sum_{n<m} x[n] x[n+k] — one O(N*order) vectorized pass instead
of per-edge recompute. Levinson-Durbin and the code-length estimate then run
batched over all candidate spans at once. Dijkstra itself (<= 17 nodes) stays
on host with the reference's exact tie-breaking so partition choices match.
"""

from __future__ import annotations

import functools

import numpy as np

from ..constants import OPTIMAL_ESTIMATOR_LONGPATH_PENALTY, SLA_SEARCH_BLOCK_NUM_SAMPLES_DELTA
from ..dsp.lpc import BETA_CONST_FOR_LAPLACE_DIST, levinson_durbin

_BIGWEIGHT = float(1 << 24)
_ESTIMATE_BLOCK_HEADER_SIZE = 50
_FLT_MIN = float(np.finfo(np.float32).tiny)
_FLT_EPSILON = float(np.finfo(np.float32).eps)


def num_nodes_for(num_samples: int, delta: int = SLA_SEARCH_BLOCK_NUM_SAMPLES_DELTA) -> int:
    return (num_samples + delta - 1) // delta + 1


@functools.lru_cache(maxsize=64)
def _window_geometry(num_samples: int, min_block: int, max_block: int, delta: int):
    """Node positions + valid candidate spans for one window geometry.
    Cached (callers treat the arrays as read-only): a file's full-size
    windows all share one geometry."""
    V = num_nodes_for(num_samples, delta)
    positions = np.minimum(np.arange(V) * delta, num_samples)
    ii, jj = np.triu_indices(V, k=1)
    lengths = np.minimum((jj - ii) * delta, num_samples - ii * delta)
    valid = (lengths >= min_block) & (lengths <= max_block)
    if not valid.any():
        return V, positions, None, None
    spans = np.stack([ii[valid], jj[valid]], axis=1)
    span_len = lengths[valid].astype(np.float64)
    return V, positions, spans, span_len


def span_autocorrelations(
    data: np.ndarray, node_positions: np.ndarray, spans: np.ndarray, order: int
) -> np.ndarray:
    """Autocorrelations for many sub-spans of one window.

    data: (C, N) float64; node_positions: (V,) sample offsets;
    spans: (S, 2) [start_node, end_node] pairs. Returns (S, C, order+1).

    Instead of full prefix-sum arrays (O(lags*N) memory traffic per window),
    the lag products are segment-reduced at the node boundary positions with
    `np.add.reduceat` and prefixed over the handful of segments — the only
    positions ever queried are nodes and node-minus-lag.
    """
    C, N = data.shape
    lags = order + 1
    starts = node_positions[spans[:, 0]]
    ends = node_positions[spans[:, 1]]
    out = np.empty((len(spans), C, lags), dtype=np.float64)
    for k in range(lags):
        lim = N - k
        if lim <= 0:
            # lag reaches past the whole signal: every span sum is empty
            # (the native twin clamps the same way, sla_native.cpp span
            # query positions q = min(qpos, limit))
            out[:, :, k] = 0.0
            continue
        # clamp query positions to the valid product range [0, lim]: a span
        # shorter than the lag (tiny tail windows) sums zero products
        s = np.minimum(starts, lim)
        e = np.minimum(np.maximum(ends - k, starts), lim)
        # all query positions for this lag, deduplicated and sorted
        qpos = np.unique(np.concatenate([s, e]))
        prod = data[:, :lim] * data[:, k:]
        # segment sums between consecutive query positions -> prefix at qpos
        bounds = qpos[:-1] if qpos.size and qpos[-1] == lim else qpos
        if bounds.size == 0 or bounds[0] != 0:
            bounds = np.concatenate([[0], bounds])
        # every bound is < lim by construction (the == lim entry was
        # stripped above), so reduceat never sees an out-of-range index
        seg = np.add.reduceat(prod, bounds, axis=-1)
        prefix_at = np.concatenate(
            [np.zeros((C, 1)), np.cumsum(seg, axis=-1)], axis=-1
        )  # prefix value after each boundary
        # map positions -> prefix values (all queries are exact members)
        pos_all = np.concatenate([bounds, [lim]])
        e_idx = np.searchsorted(pos_all, e)
        s_idx = np.searchsorted(pos_all, s)
        out[:, :, k] = (prefix_at[:, e_idx] - prefix_at[:, s_idx]).T
    return out


def min_offpath_slack(adj: np.ndarray, num_nodes: int, hops: list[int]) -> float:
    """Smallest cost gap between the chosen shortest path and any path that
    uses an edge outside it. 0.0 means an exact alternative-path tie;
    small values mean the partition decision rests on a near-tie that float
    rounding differences (fast vs reference-exact span costs) could flip.

    The partition graph is a DAG (edges only go forward), so exact
    source/sink distances are two O(V^2) DP sweeps — this guard runs per
    window, keep it cheap."""
    V = num_nodes
    dist_f = np.full(V, _BIGWEIGHT, dtype=np.float64)
    dist_f[0] = 0.0
    for j in range(1, V):
        m = (dist_f[:j] + adj[:j, j]).min()
        if m < dist_f[j]:
            dist_f[j] = m
    dist_b = np.full(V, _BIGWEIGHT, dtype=np.float64)
    dist_b[V - 1] = 0.0
    for i in range(V - 2, -1, -1):
        m = (adj[i, i + 1 :] + dist_b[i + 1 :]).min()
        if m < dist_b[i]:
            dist_b[i] = m
    best = dist_f[V - 1]
    finite = adj < _BIGWEIGHT
    slack = dist_f[:, None] + adj + dist_b[None, :] - best
    onpath = np.zeros((V, V), dtype=bool)
    node = 0
    for h in hops:
        onpath[node, node + h] = True
        node += h
    candidates = slack[finite & ~onpath]
    return float(candidates.min()) if candidates.size else np.inf


def dijkstra_partition(adj: np.ndarray, num_nodes: int) -> list[int]:
    """Shortest path 0 -> V-1 with the reference's exact iteration order and
    tie-breaking (SLAPredictor.c:1521-1581), returning partition sizes in
    node-delta units (caller scales/clips)."""
    V = num_nodes
    used = np.zeros(V, dtype=bool)
    cost = np.full(V, _BIGWEIGHT, dtype=np.float64)
    path = np.full(V, -1, dtype=np.int64)
    cost[0] = 0.0
    goal = V - 1
    while True:
        target = 0
        best = _BIGWEIGHT
        for i in range(V):
            if not used[i] and cost[i] < best:
                best = cost[i]
                target = i
        if best >= _BIGWEIGHT:
            # no reachable unvisited node: a degenerate geometry (e.g.
            # min_block > window) has no path to the goal — fail loudly
            # instead of spinning on the already-used source node
            raise ValueError("partition graph has no path to the goal node")
        if target == goal:
            break
        relax = adj[target] + cost[target]
        improve = cost > relax
        cost = np.where(improve, relax, cost)
        path = np.where(improve, target, path)
        used[target] = True
    # back-walk
    node = goal
    hops = []
    while node != 0:
        prev = int(path[node])
        hops.append((prev, node))
        node = prev
    hops.reverse()
    return [j - i for i, j in hops]


def exact_span_costs(
    data: np.ndarray,
    positions: np.ndarray,
    spans: np.ndarray,
    span_len: np.ndarray,
    num_samples: int,
    order: int,
    bits_per_sample: int,
) -> np.ndarray:
    """The reference's exact edge cost: a fresh per-(span, channel) LPC
    analysis on the unwindowed double data with the reference's own float64
    summation order (SLAPredictor.c:1632-1654). Uses the native rows when
    available, else the pure-Python exact twin (same bits, slower)."""
    from .. import native

    # order 0 must take the exact twin: the native scratch kernels require
    # order >= 1 (same routing as the fast path's use_native gate)
    use_native = native.available() and order >= 1
    if not use_native:
        from .. import exact
    cost = np.zeros(len(spans), dtype=np.float64)
    for si, (i0, _j0) in enumerate(spans):
        start = int(positions[i0])
        n_sp = int(min(span_len[si], num_samples - start))
        rows = np.ascontiguousarray(data[:, start : start + n_sp])
        if use_native:
            _, lens = native.lpc_analyze_rows(rows, order, bits_per_sample)
        else:
            lens = np.array([
                exact.lpc_analyze(rows[ch], order, bits_per_sample)[1]
                for ch in range(rows.shape[0])
            ])
        # per-channel n*len summed in channel order (SLAEncoder.c loop)
        acc = 0.0
        for ch in range(rows.shape[0]):
            acc += n_sp * float(lens[ch])
        cost[si] = acc
    return cost + _ESTIMATE_BLOCK_HEADER_SIZE + OPTIMAL_ESTIMATOR_LONGPATH_PENALTY


# Near-tie threshold (bytes): fast-estimator costs differ from the
# reference-exact ones only by float64 association error in the span
# autocorrelations (relative ~1e-12 on costs of 1e2..1e5 bytes, i.e.
# absolute <= ~1e-6). Any off-path slack below this margin triggers an
# exact re-price of the window, so a rounding-level difference can never
# flip a partition decision. 0.25 bytes is the BASE margin; windows whose
# derived worst-case error bound (span_cost_error_bound) exceeds it get an
# escalated margin of 2x their bound, so the guard is backed by analysis,
# not only by the fuzz campaign.
PARTITION_TIE_EPS = 0.25


def _fast_span_cost(
    R_all: np.ndarray, len_all: np.ndarray, order: int, bits_per_sample: int
) -> np.ndarray:
    """Vectorized fast span cost from autocorrelations (the numpy twin of
    native sla_span_cost): Levinson + the Laplace code-length estimate.
    R_all: (..., C, order+1); len_all broadcastable to (...,). Returns
    per-span cost (sum over channels), WITHOUT the header/long-path
    constants."""
    _, parcor_all = levinson_durbin(R_all, order)
    too_short = len_all[..., None] < order
    parcor_all = np.where(too_short[..., None], 0.0, parcor_all)
    power = R_all[..., 0] * (2.0 ** (2 * (bits_per_sample - 1)))
    silent = np.abs(power) <= _FLT_MIN
    k = parcor_all[..., 1:]
    # one log2 of the product (matches the native fast estimator; see
    # sla_span_cost — an underflow hits the same 1/8 clamp the very
    # negative log-sum would)
    var_prod = np.prod(np.maximum(1.0 - k * k, 1e-300), axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        length = (
            BETA_CONST_FOR_LAPLACE_DIST
            + 0.5
            * np.log2(np.where(silent, 1.0, power) * var_prod / len_all[..., None])
        ) / 8.0
    length = np.where(length <= 0, 1.0 / 8, length)
    length = np.where(silent, 0.0, length)
    return (len_all[..., None] * length).sum(axis=-1)


def span_cost_error_bound(
    R_all: np.ndarray,
    len_all: np.ndarray,
    order: int,
    bits_per_sample: int,
    sens: np.ndarray | None = None,
    e_p: np.ndarray | None = None,
) -> np.ndarray:
    """Per-span first-order worst-case |fast − exact| cost error (bytes).

    Derivation:

    1. **Input error.** Fast and exact pricing differ only in how the span
       autocorrelations are summed (segment-reduce/prefix vs the
       reference's term-reuse loop); the cost function downstream is the
       same mathematical map. Samples are scaled int32 (|x| < 1), so a
       float64 sum of n products carries absolute error
       ≤ γ_n·Σ|x_i x_{i+k}| ≤ γ_n·R0 (Cauchy–Schwarz), γ_n ≤ 2nu for
       nu < ½, u = 2⁻⁵³. Covering both estimators and the fast path's
       extra combining pass: **δR = 4·n·u·R0 per autocorrelation entry**.

    2. **Exact first-order gradient via the envelope theorem.** The cost
       depends on R only through the final prediction-error energy
       e_p = min_{a: a₀=1} aᵀT(R)a (and the clamps below): the per-channel
       code length is β/8 + (1/16)·log2(2^s·e_p/n). Because the optimal
       predictor a* minimizes the quadratic form, ∂e_p/∂R_k =
       a*ᵀ(∂T/∂R_k)a* = Σ_{|i−j|=k} a*_i a*_j — the autocorrelation of
       the computed LPC coefficients, no recursion differentiation needed.
       Hence, per channel,

           |∂cost/∂R_k| = n/(16·ln 2)·|(a*⊛a*)_k| / e_p
           |Δcost| ≤ Σ_{c,k} |∂cost/∂R_{c,k}|·δR .

    3. **Decision-boundary discontinuities.** Two clamps make the cost
       discontinuous in R: the silence test (|power| ≤ FLT_MIN) and the
       length ≤ 0 floor (jump to 1/8). Spans within δR (resp. the
       gradient·δR image) of those boundaries get bound = ∞, forcing the
       reference-exact re-price.

    The bound tracks the true conditioning: ~1e-9..1e-3 bytes on normal
    audio (the 0.25-byte base margin holds with orders of headroom, now by
    analysis, not only by fuzz), and it inflates past the base margin
    exactly where the lattice is near-unstable (k→±1), escalating the
    near-tie guard there. Validated against brute-force finite differences
    of the actual pricing function in tests/test_analysis.py. Second-order
    terms are O(δR²) and negligible."""
    R = np.asarray(R_all, dtype=np.float64)  # (S, C, p+1)
    p = order
    n = np.asarray(len_all, dtype=np.float64)
    u = 2.0 ** -53
    R0 = np.abs(R[..., 0])
    safe0 = np.maximum(R0, _FLT_MIN)
    dR = 4.0 * n[:, None] * u * safe0  # (S, C)
    if sens is not None and e_p is not None:
        # ingredients exported by native span_cost (no second Levinson)
        e_p = np.maximum(e_p, 1e-300)
        var_prod = e_p / safe0
        grad_cost = n[:, None] / (16.0 * np.log(2.0)) * sens  # (S, C)
    else:
        lpc, parcor = levinson_durbin(R, p)  # lpc: (S, C, p+1), a0 = 1
        k = parcor[..., 1:]
        var_prod = np.prod(np.maximum(1.0 - k * k, 1e-300), axis=-1)
        e_p = np.maximum(safe0 * var_prod, 1e-300)  # (S, C)
        # l1 norm of the predictor-coefficient autocorrelation, lag 0 once,
        # lags 1..p twice (T is symmetric Toeplitz)
        corr_l1 = np.einsum("...i,...i->...", lpc, lpc)
        for lag in range(1, p + 1):
            corr_l1 = corr_l1 + 2.0 * np.abs(
                np.einsum("...i,...i->...", lpc[..., : p + 1 - lag], lpc[..., lag:])
            )
        grad_cost = n[:, None] / (16.0 * np.log(2.0)) * corr_l1 / e_p  # (S, C)
    per_channel = grad_cost * dR
    # discontinuity guards (see docstring): silence threshold crossings...
    scale = 2.0 ** (2 * (bits_per_sample - 1))
    power = R[..., 0] * scale
    near_silence = np.abs(np.abs(power) - _FLT_MIN) <= dR * scale
    # ...and the length <= 0 floor (per-channel length within gradient
    # reach of 0). length = beta/8 + log2(2^s e_p / n)/16.
    with np.errstate(divide="ignore", invalid="ignore"):
        length = (
            BETA_CONST_FOR_LAPLACE_DIST
            + 0.5 * np.log2(np.where(np.abs(power) <= _FLT_MIN, 1.0, power)
                            * var_prod / n[:, None])
        ) / 8.0
    near_floor = np.abs(length) * n[:, None] <= per_channel
    # ...and the third discontinuity: the |R0| < FLT_EPSILON Levinson
    # dead-row clamp (SLAPredictor.c:274-279, replicated by both
    # estimators). A span whose fast and exact R0 straddle the threshold
    # flips between zeroed coefficients and full LPC gain — far past any
    # finite gradient bound — so escalate to the exact re-price.
    near_dead = np.abs(R0 - _FLT_EPSILON) <= dR
    # deeply silent channels price to a constant 0 on both paths: zero
    # sensitivity (the gradient formula's 1/e_p blowup does not apply).
    # Exclude them from near_floor: on the native-sens path e_p is exported
    # as 0 (clamped 1e-300), whose huge 1/e_p gradient would otherwise trip
    # near_floor and force-reprice EVERY window of mono-ish content even
    # though the silent channel's true sensitivity is zero.
    silent = np.abs(power) <= _FLT_MIN
    per_channel = np.where(silent & ~near_silence, 0.0, per_channel)
    per_channel = np.where(
        near_silence | near_dead | (near_floor & ~silent), np.inf, per_channel
    )
    bound = per_channel.sum(axis=-1)
    return np.where(np.isfinite(bound), bound, np.inf)


def search_optimal_partitions(
    data_double: np.ndarray,
    num_samples: int,
    min_block: int,
    max_block: int,
    parcor_order: int,
    bits_per_sample: int,
    delta: int = SLA_SEARCH_BLOCK_NUM_SAMPLES_DELTA,
) -> list[int]:
    """Partition one window into block sample counts.

    data_double: (C, num_samples) float64, already channel-processed."""
    return search_optimal_partitions_batch(
        [data_double], [num_samples], [min_block], [max_block],
        parcor_order, bits_per_sample, delta,
    )[0]


def search_optimal_partitions_batch(
    window_data: list[np.ndarray],
    num_samples_list: list[int],
    min_blocks: list[int],
    max_blocks: list[int],
    parcor_order: int,
    bits_per_sample: int,
    delta: int = SLA_SEARCH_BLOCK_NUM_SAMPLES_DELTA,
    base: np.ndarray | None = None,
    base_offsets: list[int] | None = None,
) -> list[list[int]]:
    """Partition many windows at once: span autocorrelations run per window
    (native), but the Levinson-Durbin recursion and code-length estimates
    batch over the concatenation of ALL windows' candidate spans — one
    vectorized pass instead of per-window calls (identical arithmetic; the
    recursion is element-wise per span)."""
    import os

    from .. import native

    def _resolve(d):
        # window_data entries may be lazy thunks (encoder passes closures
        # that materialize float64 MS slices on demand — only the exact
        # re-price / fallback paths ever need the array)
        return d() if callable(d) else d

    use_native = native.available() and parcor_order >= 1
    # (order 0 takes the numpy forms below: the native scratch kernels
    # require order >= 1, and the order-0 estimate reduces to the closed
    # power/length form _fast_span_cost already computes — the config is a
    # passthrough-lattice rarity, so the fallback's speed is fine)
    # SLA_TPU_EXACT_PARTITION=1 prices every candidate span with the
    # reference's own per-span analysis arithmetic (native sla_lpc_analyze)
    # instead of the fast prefix estimator. The fast path has matched the
    # reference byte-for-byte on every fuzz corpus (cost differences sit at
    # byte scale vs ulp noise), but near-ties are theoretically possible;
    # this switch removes even that.
    exact = bool(os.environ.get("SLA_TPU_EXACT_PARTITION"))
    order = parcor_order
    geos = [
        _window_geometry(n, mb, xb, delta)
        for n, mb, xb in zip(num_samples_list, min_blocks, max_blocks)
    ]
    # same-geometry windows over a shared base signal compute their span
    # autocorrelations in ONE native call (per-lag sorts and span index
    # lookups amortize across windows; identical values to per-window calls)
    R_by_idx: dict[int, np.ndarray] = {}
    if use_native and not exact and base is not None and base_offsets is not None:
        groups: dict[tuple[int, int, int], list[int]] = {}
        for i, (V, positions, spans, span_len) in enumerate(geos):
            if spans is not None:
                key = (num_samples_list[i], min_blocks[i], max_blocks[i])
                groups.setdefault(key, []).append(i)
        lazy = hasattr(base, "materialize")  # LazyDoubleSource (int32 rows)
        for (n_win, _mb, _xb), idxs in groups.items():
            if len(idxs) < 2:
                continue
            _V, positions, spans, _sl = geos[idxs[0]]
            offs = np.asarray([base_offsets[i] for i in idxs], dtype=np.int64)
            if lazy:
                # on-the-fly int32 -> float64 conversion inside the sweep
                # (exact arithmetic, bit-identical sums; no whole-file
                # double array)
                Rm = native.span_autocorr_multi_i32(
                    base.data, base.ms, offs, n_win, positions, spans, order
                )
            else:
                Rm = native.span_autocorr_multi(
                    base, offs, n_win, positions, spans, order
                )
            for w, i in enumerate(idxs):
                R_by_idx[i] = Rm[w]
    metas = []
    R_parts = []
    exact_costs: list[np.ndarray] = []
    for wi_data, (data, num_samples, min_block, max_block) in enumerate(
        zip(window_data, num_samples_list, min_blocks, max_blocks)
    ):
        # windows of equal geometry (the common case: every full-size window
        # of a file) share their span enumeration — cached, read-only
        V, positions, spans, span_len = geos[wi_data]
        if spans is None:
            metas.append((V, None, None, num_samples, data, positions))
            continue
        if exact:
            exact_costs.append(
                exact_span_costs(
                    _resolve(data), positions, spans, span_len, num_samples,
                    order, bits_per_sample,
                )
            )
            metas.append((V, spans, span_len, num_samples, data, positions))
            continue
        if wi_data in R_by_idx:
            R = R_by_idx[wi_data]
        elif use_native:
            R = native.span_autocorr(
                _resolve(data)[:, :num_samples], positions, spans, order
            )
        else:
            R = span_autocorrelations(
                _resolve(data)[:, :num_samples], positions, spans, order
            )
        metas.append((V, spans, span_len, num_samples, data, positions))
        R_parts.append(R)

    if R_parts:
        R_all = np.concatenate(R_parts, axis=0)
        len_all = np.concatenate(
            [m[2] for m in metas if m[1] is not None], axis=0
        )
        if use_native:
            cost_all, sens_q, e_q = native.span_cost(
                R_all, len_all, order, bits_per_sample, with_sens=True
            )
            bound_all = span_cost_error_bound(
                R_all, len_all, order, bits_per_sample, sens=sens_q, e_p=e_q
            )
        else:
            cost_all = _fast_span_cost(R_all, len_all, order, bits_per_sample)
            bound_all = span_cost_error_bound(R_all, len_all, order, bits_per_sample)
        cost_all = cost_all + _ESTIMATE_BLOCK_HEADER_SIZE + OPTIMAL_ESTIMATOR_LONGPATH_PENALTY

    # Fast path with native: every window's Dijkstra + near-tie guard runs
    # in ONE batched native call (same iteration order, tie-breaking, and
    # slack arithmetic as the Python forms below, which remain the fallback
    # and the exact-mode path).
    solved_hops = solved_needs = None
    if use_native and not exact and R_parts:
        live = [m for m in metas if m[1] is not None]
        solved_hops, solved_needs = native.partition_solve(
            cost_all,
            np.concatenate([m[1] for m in live], axis=0),
            np.array([len(m[1]) for m in live], dtype=np.int32),
            np.array([m[0] for m in live], dtype=np.int32),
            PARTITION_TIE_EPS,
        )

    results: list[list[int]] = []
    consumed = 0
    wi_exact = 0
    fw = 0
    for V, spans, span_len, num_samples, data, positions in metas:
        if spans is not None and solved_hops is not None:
            S = len(spans)
            # adaptive margin: the base 0.25-byte tie eps, escalated to 2x
            # the window's DERIVED worst-case fast-vs-exact cost error when
            # that bound exceeds it (span_cost_error_bound)
            eps_w = max(
                PARTITION_TIE_EPS,
                2.0 * float(np.max(bound_all[consumed : consumed + S])),
            )
            needs = bool(solved_needs[fw])
            if not needs and eps_w > PARTITION_TIE_EPS:
                # native guard ran with the base margin only; re-check the
                # slack against the escalated one
                adj = np.full((V, V), _BIGWEIGHT, dtype=np.float64)
                adj[spans[:, 0], spans[:, 1]] = cost_all[consumed : consumed + S]
                row = solved_hops[fw]
                hops = [int(h) for h in row[row >= 0]]
                needs = min_offpath_slack(adj, V, hops) < eps_w
            if needs:
                # near-tie: re-price with the reference-exact cost model
                # (byte-identity over speed on the rare tie)
                adj = np.full((V, V), _BIGWEIGHT, dtype=np.float64)
                adj[spans[:, 0], spans[:, 1]] = exact_span_costs(
                    _resolve(data), positions, spans, span_len, num_samples,
                    order, bits_per_sample,
                )
                hops = dijkstra_partition(adj, V)
            else:
                row = solved_hops[fw]
                hops = [int(h) for h in row[row >= 0]]
            consumed += S
            fw += 1
            results.append(_hops_to_sizes(hops, num_samples, delta))
            continue
        adj = np.full((V, V), _BIGWEIGHT, dtype=np.float64)
        eps_w = PARTITION_TIE_EPS
        if spans is not None:
            S = len(spans)
            if exact:
                adj[spans[:, 0], spans[:, 1]] = exact_costs[wi_exact]
                wi_exact += 1
            else:
                adj[spans[:, 0], spans[:, 1]] = cost_all[consumed : consumed + S]
                eps_w = max(
                    PARTITION_TIE_EPS,
                    2.0 * float(np.max(bound_all[consumed : consumed + S])),
                )
                consumed += S
        hops = dijkstra_partition(adj, V)
        if spans is not None and not exact:
            # Near-tie guard (non-batched fallback, also the no-native
            # path — exact_span_costs has a pure-Python exact twin), with
            # the same derived-bound escalation as the batched branch
            if min_offpath_slack(adj, V, hops) < eps_w:
                adj[spans[:, 0], spans[:, 1]] = exact_span_costs(
                    _resolve(data), positions, spans, span_len, num_samples,
                    order, bits_per_sample,
                )
                hops = dijkstra_partition(adj, V)
        results.append(_hops_to_sizes(hops, num_samples, delta))
    return results


def _hops_to_sizes(hops: list[int], num_samples: int, delta: int) -> list[int]:
    sizes = []
    pos = 0
    for h in hops:
        n = min(h * delta, num_samples - pos)
        sizes.append(n)
        pos += n
    assert pos == num_samples, (pos, num_samples, sizes)
    return sizes
