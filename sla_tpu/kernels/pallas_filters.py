"""Pallas TPU kernels for the sample-recursive filters.

The XLA `lax.scan` versions (lattice.py, lms.py) spend microseconds of loop
overhead per sample step on work that is a handful of VPU ops. These kernels
run the sample loop *inside* one program with all state resident in VMEM:

    layout: (L, B) — samples on the sublane-major axis, rows (blocks x
    channels) on the 128-wide lane axis. Each grid step processes a
    (TILE_L, TILE_B) block; filter state lives in VMEM scratch and persists
    across the L-grid dimension (reset at l == 0), so arbitrarily long
    blocks stream through fixed VMEM.

Per sample step the work is a few (order, TILE_B) element-wise ops — the
lattice order-cumsum runs as log2(order) sublane shifts. Integer semantics
are identical to the scan kernels (wrapping int32, arithmetic shifts,
+2^14 >> 15 rounding), which are differential-tested against the reference
C binary.

Used by pipeline.py on TPU; the scan versions remain the CPU/fallback path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALF = 1 << 14
TILE_B = 128
TILE_L = 2048
_UNROLL = 8  # samples per fori iteration: Mosaic's loop overhead is per
# iteration, and trace-level unrolling amortizes it (sample order unchanged)



def _cumsum_sublanes(m: jnp.ndarray, p: int) -> jnp.ndarray:
    """Inclusive cumsum along axis 0 of a (p, TB) tile via log2(p) shifted
    adds (sublane rolls lower poorly; pad+slice keeps it static)."""
    shift = 1
    while shift < p:
        zeros = jnp.zeros((shift, m.shape[1]), dtype=m.dtype)
        m = m + jnp.concatenate([zeros, m[: p - shift, :]], axis=0)
        shift <<= 1
    return m


def _suffix_sum_sublanes(m: jnp.ndarray, p: int) -> jnp.ndarray:
    """Inclusive suffix sum along axis 0: out[k] = sum_{j >= k} m[j]
    (Mosaic cannot lower `rev`, so no reverse+cumsum)."""
    shift = 1
    while shift < p:
        zeros = jnp.zeros((shift, m.shape[1]), dtype=m.dtype)
        m = m + jnp.concatenate([m[shift:, :], zeros], axis=0)
        shift <<= 1
    return m


def _align_window(w: jnp.ndarray, d: jnp.ndarray, need: int) -> jnp.ndarray:
    """Per-lane barrel shift along sublanes: returns a (need, TB) array `a`
    with a[t] = w[d + t] when d + t < rows(w), else 0 — exactly the value
    the one-hot select `sum((iota == d + t) * w)` produces, so swapping the
    two is byte-identity-preserving.

    d: (1, TB) non-negative per-lane shift. log2(rows) truncating select
    passes (Mosaic has no per-lane sublane gather): processing bits high ->
    low, after consuming bit b the remaining shift is < 2^b, so each pass
    keeps only `need + 2^b - 1` rows — the total work is O(rows) per CALL,
    amortized over the group, instead of O(rows) per selected value."""
    nbits = max(1, (w.shape[0] - 1).bit_length())
    for b in reversed(range(nbits)):
        s = 1 << b
        rows = w.shape[0]
        keep = min(rows, need + s - 1) if b else need
        hi_rows = max(0, min(keep, rows - s))
        hi = w[s : s + hi_rows, :]
        if hi_rows < keep:
            hi = jnp.concatenate(
                [hi, jnp.zeros((keep - hi_rows, w.shape[1]), w.dtype)], axis=0
            )
        take = ((d >> b) & 1) != 0  # (1, TB), broadcasts over sublanes
        w = jnp.where(take, hi, w[:keep, :])
    return w


def _lattice_kernel(data_ref, coef_ref, out_ref, b_state, x_prev, *, parcor_order,
                    tile_l, pre_emphasis, synthesize):
    """One (TILE_L, TILE_B) block of lattice analysis/synthesis.

    b_state: (p+1, TB) backward-error state; x_prev: (1, TB) previous input
    sample (pre-emphasis state on the analysis side, de-emphasis state on the
    synthesis side)."""
    p = parcor_order
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        b_state[:] = jnp.zeros_like(b_state)
        x_prev[:] = jnp.zeros_like(x_prev)

    if synthesize:
        _lattice_synth_body(data_ref, coef_ref, out_ref, b_state, x_prev,
                            p=p, tile_l=tile_l, pre_emphasis=pre_emphasis)
        return

    c = coef_ref[:p, :]  # (p, TB); the block is sublane-padded to 8 rows

    def body(x, _unused=None):
        # x: (1, TB) current input sample row (from the aligned block read)
        b_prev = b_state[:]  # (p+1, TB)
        # pre-emphasis folded in: y = x - ((x[-1] * 31) >> 5)
        if pre_emphasis:
            y = x - ((x_prev[:] * 31) >> 5)
            x_prev[:] = x
        else:
            y = x
        m = (c * b_prev[:p, :] + _HALF) >> 15  # (p, TB)
        incl = _cumsum_sublanes(m, p)
        f_prev = y - (incl - m)  # f[0..p-1]
        b_hi = b_prev[:p, :] - ((c * f_prev + _HALF) >> 15)
        b_state[:] = jnp.concatenate([y, b_hi], axis=0)
        return y - incl[p - 1 : p, :]

    def body_u(i, s32):
        # one ALIGNED (_UNROLL, TB) block read/write per group instead of
        # per-sample single-row dynamic slices (each of those costs a
        # sublane relayout); s32 is the carried int32 counter (the fori
        # index is int64 under jax_enable_x64, unusable in Mosaic)
        s0 = pl.multiple_of(s32, _UNROLL)
        blk = data_ref[pl.ds(s0, _UNROLL), :]
        outs = [body(blk[k : k + 1, :]) for k in range(_UNROLL)]
        out_ref[pl.ds(s0, _UNROLL), :] = jnp.concatenate(outs, axis=0)
        return s32 + jnp.int32(_UNROLL)

    jax.lax.fori_loop(0, tile_l // _UNROLL, body_u, jnp.int32(0))


def _lattice_synth_body(data_ref, coef_ref, out_ref, b_state, x_prev, *, p,
                        tile_l, pre_emphasis=True):
    """Lattice synthesis (+ optional de-emphasis) sample loop; shared by the
    standalone lattice kernel and the fused decode cascade (state resets
    belong to the caller)."""
    c = coef_ref[:p, :]  # (p, TB)

    def body(r, _unused=None):
        # r: (1, TB) current residual row (from the aligned block read)
        b_prev = b_state[:]  # (p+1, TB)
        # synthesis: f_partial_k = r + suffix_sum(m)[k]; out = f_partial_1
        m = (c * b_prev[:p, :] + _HALF) >> 15
        suf = _suffix_sum_sublanes(m, p)
        f_partial = r + suf  # (p, TB), stage k at row k-1
        b_hi = b_prev[:p, :] - ((c * f_partial + _HALF) >> 15)
        out = f_partial[0:1, :]
        b_state[:] = jnp.concatenate([out, b_hi], axis=0)
        if pre_emphasis:  # de-emphasis folded in on the synthesis side
            y = out + ((x_prev[:] * 31) >> 5)
            x_prev[:] = y
            return y
        return out

    def body_u(i, s32):
        # aligned (_UNROLL, TB) block I/O per group (see predict body)
        s0 = pl.multiple_of(s32, _UNROLL)
        blk = data_ref[pl.ds(s0, _UNROLL), :]
        outs = [body(blk[k : k + 1, :]) for k in range(_UNROLL)]
        out_ref[pl.ds(s0, _UNROLL), :] = jnp.concatenate(outs, axis=0)
        return s32 + jnp.int32(_UNROLL)

    jax.lax.fori_loop(0, tile_l // _UNROLL, body_u, jnp.int32(0))


def _lms_kernel(data_ref, out_ref, state, *, lms_order, tile_l, synthesize):
    """Sign-sign LMS cascade. state: (4*M, TB) scratch packing
    fc | ic | xb | pb rows."""
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        state[:] = jnp.zeros_like(state)

    _lms_kernel_body(data_ref, out_ref, state, lms_order=lms_order,
                     tile_l=tile_l, synthesize=synthesize, l=l)


def _lms_kernel_body(data_ref, out_ref, state, *, lms_order, tile_l,
                     synthesize, l):
    M = lms_order

    def body(x, s32):
        # x: (1, TB) current sample row; s32: int32 sample counter (the
        # fori index is int64 under jax_enable_x64; Mosaic rejects it)
        fc = state[0:M, :]
        ic = state[M : 2 * M, :]
        xb = state[2 * M : 3 * M, :]
        pb = state[3 * M : 4 * M, :]
        acc = jnp.full_like(x, 512)
        # dtype pinned: jnp.sum would promote int32 -> int64 under x64, and
        # the reference accumulates with wrapping int32 semantics anyway
        acc = acc + jnp.sum(fc * xb, axis=0, keepdims=True, dtype=jnp.int32)
        acc = acc + jnp.sum(ic * pb, axis=0, keepdims=True, dtype=jnp.int32)
        pred = acc >> 10
        # warmup = first M samples overall; M <= tile_l so only the l == 0
        # tile can be warm. The loop index is int64 under jax_enable_x64 —
        # cast before comparing, Mosaic has no 64-bit types.
        warm = jnp.logical_and(l == 0, s32 < M)
        if synthesize:
            res = x
            out = x + pred
            new_sample = out
        else:
            out = x - pred
            res = out
            new_sample = x
        # clz on the int32 bit pattern == clz on uint32 (|INT32_MIN| wraps
        # to 0x80000000, same bits); Mosaic cannot lower i32->u32 casts
        mag = jnp.abs(res)
        bl = jnp.int32(32) - jax.lax.clz(mag)
        step = jnp.sign(res) * (bl >> 1)
        step = jnp.where(warm, jnp.int32(0), step)
        fc = fc + step * jnp.sign(xb)
        ic = ic + step * jnp.sign(pb)
        ins_p = jnp.where(warm, new_sample, pred)
        xb = jnp.concatenate([new_sample, xb[: M - 1, :]], axis=0)
        pb = jnp.concatenate([ins_p, pb[: M - 1, :]], axis=0)
        state[0:M, :] = fc
        state[M : 2 * M, :] = ic
        state[2 * M : 3 * M, :] = xb
        state[3 * M : 4 * M, :] = pb
        return jnp.where(warm, x, out)

    def body_u(i, s32):
        # aligned (_UNROLL, TB) block I/O per group (see lattice predict)
        s0 = pl.multiple_of(s32, _UNROLL)
        blk = data_ref[pl.ds(s0, _UNROLL), :]
        outs = [
            body(blk[k : k + 1, :], s32 + jnp.int32(k)) for k in range(_UNROLL)
        ]
        out_ref[pl.ds(s0, _UNROLL), :] = jnp.concatenate(outs, axis=0)
        return s32 + jnp.int32(_UNROLL)

    jax.lax.fori_loop(0, tile_l // _UNROLL, body_u, jnp.int32(0))


_LT_HIST_D = 264  # ring depth: > max lag (pitch<256 + taps//2 <= 257), 8-aligned


def _longterm_synth_kernel(res_ref, prm_ref, out_ref, hist, *, num_taps,
                           tile_l, hist_d):
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        hist[:] = jnp.zeros_like(hist)

    _longterm_body(res_ref, prm_ref, out_ref, hist, num_taps=num_taps,
                   tile_l=tile_l, hist_d=hist_d, l=l)


def _longterm_synth_kernel_win(hi8_ref, res_ref, prm_ref, out_ref, hist, *,
                               num_taps, tile_l, hist_d, win):
    # hi8_ref: scalar-prefetch (nb,) per-tile max lag rounded up to 8
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        hist[:] = jnp.zeros_like(hist)

    _longterm_body_win(res_ref, prm_ref, out_ref, hist,
                       hi8_ref[pl.program_id(0)],
                       num_taps=num_taps, tile_l=tile_l, hist_d=hist_d,
                       win=win, l=l)


def _longterm_body(res_ref, prm_ref, out_ref, hist, *, num_taps, tile_l,
                   hist_d, l):
    """Long-term (pitch) synthesis: out[n] = res[n] + (sum_j q15_j *
    out[n - (max_delay - j)] + 2^14) >> 15 once n >= max_delay, per-row
    delays (SLAPredictor.c:1031-1130 with the Q31->Q15 reduction noted in
    kernels/longterm.py).

    The per-lane variable lag becomes a one-hot select over a (D, TB)
    output ring in VMEM: slot pos % D holds out[pos]; tap j of lane b
    reads slot (pos - lag_bj) % D. The sum over the ring has exactly one
    nonzero term per tap, so int32 is exact. The Q15 x int32 product needs
    47 bits — Mosaic has no i64, so the product is computed in three exact
    12-bit limbs (S2*2^24 + S1*2^12 + S0) and the +2^14 >> 15 rounding is
    reassembled limb-wise; verified identical to the int64 form over the
    full int32 range.

    prm_ref: (8, TB) — row 0 max_delay (0 = inactive row), rows 1..T the
    q15 coefficients, rest zero padding (Mosaic requires the sublane dim
    divisible by 8). hist: (D, TB) scratch ring, persists across l."""
    T = num_taps
    D = hist_d
    TB = res_ref.shape[1]
    max_delay = prm_ref[0, :][None, :]  # (1, TB)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (D, TB), 0)

    def pred_from_sel(r, sel_limbs, pos):
        S0, S1, S2 = sel_limbs
        u_h = (S0 + _HALF) >> 12
        pred = (S2 << 9) + ((S1 + u_h) >> 3)
        use = jnp.logical_and(max_delay > 0, pos >= max_delay)
        return jnp.where(use, r + pred, r)

    def body(r, s32, wp, h):
        # r: (1, TB) residual row; h: the (D, TB) ring contents
        pos = l * tile_l + s32
        S0 = jnp.zeros_like(r)
        S1 = jnp.zeros_like(r)
        S2 = jnp.zeros_like(r)
        for j in range(T):
            lag = max_delay - j
            rp = wp - lag
            rp = jnp.where(rp < 0, rp + D, rp)
            rp = jnp.where(rp >= D, rp - D, rp)  # inactive rows: lag <= 0
            mask = (d_iota == rp).astype(jnp.int32)
            sel = jnp.sum(mask * h, axis=0, keepdims=True, dtype=jnp.int32)
            q = prm_ref[1 + j, :][None, :]
            S0 = S0 + q * (sel & 0xFFF)
            S1 = S1 + q * ((sel >> 12) & 0xFFF)
            S2 = S2 + q * (sel >> 24)
        return pred_from_sel(r, (S0, S1, S2), pos)

    def body_u(i, carry):
        s32, wp = carry
        s0 = pl.multiple_of(s32, _UNROLL)
        blk = res_ref[pl.ds(s0, _UNROLL), :]
        outs = []
        for k in range(_UNROLL):
            o = body(blk[k : k + 1, :], s32 + jnp.int32(k), wp, hist[:])
            outs.append(o)
            hist[:] = jnp.where(d_iota == wp, o, hist[:])
            wp = wp + 1
            wp = jnp.where(wp == D, jnp.int32(0), wp)
        out_ref[pl.ds(s0, _UNROLL), :] = jnp.concatenate(outs, axis=0)
        return (s32 + jnp.int32(_UNROLL), wp)

    jax.lax.fori_loop(
        0, tile_l // _UNROLL, body_u,
        (jnp.int32(0), jnp.mod(l * jnp.int32(tile_l), jnp.int32(D))),
    )


def _longterm_body_win(res_ref, prm_ref, out_ref, hist, hi8, *, num_taps,
                       tile_l, hist_d, win, l):
    """Windowed long-term synthesis: O(win) selection work per sample
    instead of O(D). The ring is stored DOUBLED — every output lands at
    slots wp and wp + D of a (2D + win + 8, TB) buffer — so each group's
    reads are ONE aligned dynamic slice [wp + D - hi8, +win+8) regardless
    of per-lane wrap, and the per-lane tap select is a one-hot over just
    the window rows. hi8: the tile's max lag rounded up to 8 (scalar, from
    SMEM); win (static) >= roundup8(hi8 - min_active_lag + T) for every
    tile, and every active lag's shallowest feedback (max_delay - (T-1))
    must be >= _UNROLL — the caller guards both (pipeline falls back to the
    one-hot path otherwise). Arithmetic per sample (limb products, rounding,
    warmup mask) is identical to the one-hot body, so outputs are
    byte-identical."""
    T = num_taps
    D = hist_d
    max_delay = prm_ref[0, :][None, :]  # (1, TB)
    # per-lane window row of tap 0 for the group's FIRST sample; tap j of
    # sample k reads row d + j + k — constant shift d, so ONE barrel
    # alignment per group turns every select into a static slice
    d = hi8 - max_delay

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (_UNROLL, res_ref.shape[1]), 0)

    def body_u(i, carry):
        s32, wp = carry
        s0 = pl.multiple_of(s32, _UNROLL)
        blk = res_ref[pl.ds(s0, _UNROLL), :]
        st0 = pl.multiple_of(wp + D - hi8, 8)
        w = hist[pl.ds(st0, win + _UNROLL), :]
        a = _align_window(w, d, T + _UNROLL - 1)
        # the group's predictions depend only on PRIOR groups' history (the
        # feedback-depth precondition), so the whole tap/limb arithmetic
        # runs once on (_UNROLL, TB) tiles — full-sublane vregs — instead
        # of per-sample row ops
        S0 = jnp.zeros_like(blk)
        S1 = jnp.zeros_like(blk)
        S2 = jnp.zeros_like(blk)
        for j in range(T):
            sel = a[j : j + _UNROLL, :]
            q = prm_ref[1 + j, :][None, :]
            S0 = S0 + q * (sel & 0xFFF)
            S1 = S1 + q * ((sel >> 12) & 0xFFF)
            S2 = S2 + q * (sel >> 24)
        u_h = (S0 + _HALF) >> 12
        pred = (S2 << 9) + ((S1 + u_h) >> 3)
        pos_g = k_iota + (l * tile_l + s32)
        use = jnp.logical_and(max_delay > 0, pos_g >= max_delay)
        ob = jnp.where(use, blk + pred, blk)
        out_ref[pl.ds(s0, _UNROLL), :] = ob
        hist[pl.ds(wp, _UNROLL), :] = ob
        hist[pl.ds(wp + D, _UNROLL), :] = ob
        wp = wp + jnp.int32(_UNROLL)
        wp = jnp.where(wp == D, jnp.int32(0), wp)
        return (s32 + jnp.int32(_UNROLL), wp)

    jax.lax.fori_loop(
        0, tile_l // _UNROLL, body_u,
        (jnp.int32(0), jnp.mod(l * jnp.int32(tile_l), jnp.int32(D))),
    )


@functools.partial(
    jax.jit, static_argnames=("num_taps", "interpret", "hist_d", "lt_win")
)
def longterm_synth_tl(data_t, prm_t, num_taps, interpret=False,
                      hist_d=_LT_HIST_D, lt_win=0, hi8s=None):
    """data_t: (L, B) int32 residual after LMS synthesis; prm_t: (1+T, B)
    packed per-row parameters (see kernel). Returns (L, B).

    hist_d (static): ring depth — must exceed the batch's maximum lag
    (max_delay). The per-step masked select/insert work is linear in the
    ring depth, so callers dispatch the smallest sufficient size
    (longterm_ring_depth); most audio sits under pitch 128. lt_win > 0
    selects the windowed pass (see fused_synth_tl for the preconditions
    and the hi8s layout) — per-step work becomes linear in the lag spread
    instead of the ring depth."""
    D = hist_d
    win_on = lt_win > 0
    if win_on:
        kernel = functools.partial(
            _longterm_synth_kernel_win,
            num_taps=num_taps,
            tile_l=TILE_L,
            hist_d=hist_d,
            win=lt_win,
        )
    else:
        kernel = functools.partial(
            _longterm_synth_kernel,
            num_taps=num_taps,
            tile_l=TILE_L,
            hist_d=hist_d,
        )
    nl = data_t.shape[0] // TILE_L
    if prm_t.shape[0] < 8:  # pad sublanes to 8 (Mosaic block-shape rule)
        prm_t = jnp.concatenate(
            [prm_t, jnp.zeros((8 - prm_t.shape[0], prm_t.shape[1]), prm_t.dtype)],
            axis=0,
        )
    prm_tiled = jnp.tile(prm_t, (nl, 1))  # fresh block per L-step (Mosaic)
    prm_spec = pl.BlockSpec((8, TILE_B), lambda b, l: (l, b), memory_space=pltpu.VMEM)
    rows = 2 * D + lt_win + _UNROLL if win_on else D
    scratch = [pltpu.VMEM((rows, TILE_B), jnp.int32)]
    if win_on:
        return _filter_call_scalar(
            kernel, jnp.asarray(hi8s, dtype=jnp.int32).reshape(-1), data_t,
            [prm_tiled], [prm_spec], scratch, interpret,
        )
    return _filter_call(kernel, data_t, [prm_tiled], [prm_spec], scratch, interpret)


def _fused_synth_kernel_win(hi8_ref, res_ref, coef_ref, prm_ref, out_ref,
                            lms_state, hist, b_state, x_prev, *, parcor_order,
                            num_taps, tile_l, hist_d, win):
    """Fully-merged decode cascade for the windowed long-term form: ONE
    sample loop runs LMS synth -> windowed long-term -> lattice synth +
    de-emphasis back to back, so each 8-sample group costs one aligned
    block read, one window slice, and one block write — the three-loop
    form paid that machinery (and an out_ref VMEM round trip) per stage.
    Per-sample arithmetic and ordering are identical to the standalone
    bodies, so outputs are byte-identical. hi8_ref: scalar-prefetch (nb,)
    per-tile max lag rounded to 8 (see _longterm_body_win for the ring
    discipline and preconditions)."""
    p = parcor_order
    T = num_taps
    D = hist_d
    M = lms_state.shape[0] // 4
    l = pl.program_id(1)
    hi8 = hi8_ref[pl.program_id(0)]

    @pl.when(l == 0)
    def _():
        lms_state[:] = jnp.zeros_like(lms_state)
        b_state[:] = jnp.zeros_like(b_state)
        x_prev[:] = jnp.zeros_like(x_prev)
        hist[:] = jnp.zeros_like(hist)

    c = coef_ref[:p, :]  # (p, TB)
    max_delay = prm_ref[0, :][None, :]
    d = hi8 - max_delay  # constant per-lane window shift (see _align_window)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (_UNROLL, res_ref.shape[1]), 0)

    def lms_step(x, s32, step_in):
        # step_in: the sign-sign adaptation step for this sample, computed
        # group-wide from the INPUT residual (decode adapts on x, which is
        # known upfront — only the warmup zeroing stays per-sample)
        fc = lms_state[0:M, :]
        ic = lms_state[M : 2 * M, :]
        xb = lms_state[2 * M : 3 * M, :]
        pb = lms_state[3 * M : 4 * M, :]
        acc = jnp.full_like(x, 512)
        acc = acc + jnp.sum(fc * xb, axis=0, keepdims=True, dtype=jnp.int32)
        acc = acc + jnp.sum(ic * pb, axis=0, keepdims=True, dtype=jnp.int32)
        pred = acc >> 10
        warm = jnp.logical_and(l == 0, s32 < M)
        out = x + pred
        step = jnp.where(warm, jnp.int32(0), step_in)
        lms_state[0:M, :] = fc + step * jnp.sign(xb)
        lms_state[M : 2 * M, :] = ic + step * jnp.sign(pb)
        lms_state[2 * M : 3 * M, :] = jnp.concatenate(
            [out, xb[: M - 1, :]], axis=0
        )
        lms_state[3 * M : 4 * M, :] = jnp.concatenate(
            [jnp.where(warm, out, pred), pb[: M - 1, :]], axis=0
        )
        return jnp.where(warm, x, out)

    def lattice_step(r):
        b_prev = b_state[:]
        m = (c * b_prev[:p, :] + _HALF) >> 15
        suf = _suffix_sum_sublanes(m, p)
        f_partial = r + suf
        b_hi = b_prev[:p, :] - ((c * f_partial + _HALF) >> 15)
        out = f_partial[0:1, :]
        b_state[:] = jnp.concatenate([out, b_hi], axis=0)
        y = out + ((x_prev[:] * 31) >> 5)
        x_prev[:] = y
        return y

    def body_u(i, carry):
        s32, wp = carry
        s0 = pl.multiple_of(s32, _UNROLL)
        blk = res_ref[pl.ds(s0, _UNROLL), :]
        st0 = pl.multiple_of(wp + D - hi8, 8)
        w = hist[pl.ds(st0, win + _UNROLL), :]
        a = _align_window(w, d, T + _UNROLL - 1)
        # group-wide long-term prediction + LMS adaptation step: both
        # depend only on prior groups' history / the input residual, so
        # they run on full-sublane (_UNROLL, TB) tiles (the feedback-depth
        # precondition guarantees the group's own outputs aren't read)
        S0 = jnp.zeros_like(blk)
        S1 = jnp.zeros_like(blk)
        S2 = jnp.zeros_like(blk)
        for j in range(T):
            sel = a[j : j + _UNROLL, :]
            q = prm_ref[1 + j, :][None, :]
            S0 = S0 + q * (sel & 0xFFF)
            S1 = S1 + q * ((sel >> 12) & 0xFFF)
            S2 = S2 + q * (sel >> 24)
        u_h = (S0 + _HALF) >> 12
        lt_pred = (S2 << 9) + ((S1 + u_h) >> 3)
        use = jnp.logical_and(
            max_delay > 0, k_iota + (l * tile_l + s32) >= max_delay
        )
        bl_g = jnp.int32(32) - jax.lax.clz(jnp.abs(blk))
        step_g = jnp.sign(blk) * (bl_g >> 1)
        lt_outs = []
        outs = []
        for k in range(_UNROLL):
            o1 = lms_step(blk[k : k + 1, :], s32 + jnp.int32(k),
                          step_g[k : k + 1, :])
            o2 = jnp.where(use[k : k + 1, :], o1 + lt_pred[k : k + 1, :], o1)
            lt_outs.append(o2)
            outs.append(lattice_step(o2))
        lt = jnp.concatenate(lt_outs, axis=0)
        hist[pl.ds(wp, _UNROLL), :] = lt
        hist[pl.ds(wp + D, _UNROLL), :] = lt
        out_ref[pl.ds(s0, _UNROLL), :] = jnp.concatenate(outs, axis=0)
        wp = wp + jnp.int32(_UNROLL)
        wp = jnp.where(wp == D, jnp.int32(0), wp)
        return (s32 + jnp.int32(_UNROLL), wp)

    jax.lax.fori_loop(
        0, tile_l // _UNROLL, body_u,
        (jnp.int32(0), jnp.mod(l * jnp.int32(tile_l), jnp.int32(D))),
    )


def _fused_stage2_kernel_win(hi8_ref, res_ref, prm_ref, out_ref, lms_state,
                             hist, *, num_taps, tile_l, hist_d, win):
    """Merged encode stage 2: windowed long-term FIR + sign-sign LMS
    predict in ONE sample loop (the two-dispatch form paid an XLA gated
    FIR pass plus a separate LMS kernel, each a full HBM round trip). The
    FIR history is the stage-1 residual itself (prediction reads the
    INPUT, kernels/longterm.py), kept as the same doubled ring the decode
    cascade uses — every 8-sample group reads one aligned window slice and
    writes the raw input rows twice, batched. Per-sample arithmetic is
    value-identical to longterm_predict (int64 accumulate reproduced in
    exact 12-bit limbs) followed by the LMS predict body, so residuals are
    byte-identical. Same preconditions as the decode window (caller plans
    and falls back)."""
    T = num_taps
    D = hist_d
    M = lms_state.shape[0] // 4
    l = pl.program_id(1)
    hi8 = hi8_ref[pl.program_id(0)]

    @pl.when(l == 0)
    def _():
        lms_state[:] = jnp.zeros_like(lms_state)
        hist[:] = jnp.zeros_like(hist)

    max_delay = prm_ref[0, :][None, :]
    d = hi8 - max_delay  # constant per-lane window shift (see _align_window)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (_UNROLL, res_ref.shape[1]), 0)

    def lms_step(x, s32):
        fc = lms_state[0:M, :]
        ic = lms_state[M : 2 * M, :]
        xb = lms_state[2 * M : 3 * M, :]
        pb = lms_state[3 * M : 4 * M, :]
        acc = jnp.full_like(x, 512)
        acc = acc + jnp.sum(fc * xb, axis=0, keepdims=True, dtype=jnp.int32)
        acc = acc + jnp.sum(ic * pb, axis=0, keepdims=True, dtype=jnp.int32)
        pred = acc >> 10
        warm = jnp.logical_and(l == 0, s32 < M)
        out = x - pred
        mag = jnp.abs(out)
        bl = jnp.int32(32) - jax.lax.clz(mag)
        step = jnp.sign(out) * (bl >> 1)
        step = jnp.where(warm, jnp.int32(0), step)
        lms_state[0:M, :] = fc + step * jnp.sign(xb)
        lms_state[M : 2 * M, :] = ic + step * jnp.sign(pb)
        lms_state[2 * M : 3 * M, :] = jnp.concatenate(
            [x, xb[: M - 1, :]], axis=0
        )
        lms_state[3 * M : 4 * M, :] = jnp.concatenate(
            [jnp.where(warm, x, pred), pb[: M - 1, :]], axis=0
        )
        return jnp.where(warm, x, out)

    def body_u(i, carry):
        s32, wp = carry
        s0 = pl.multiple_of(s32, _UNROLL)
        blk = res_ref[pl.ds(s0, _UNROLL), :]
        st0 = pl.multiple_of(wp + D - hi8, 8)
        w = hist[pl.ds(st0, win + _UNROLL), :]
        a = _align_window(w, d, T + _UNROLL - 1)
        # group-wide FIR prediction (the history is the INPUT residual,
        # never this group's outputs): full-sublane (_UNROLL, TB) tiles
        S0 = jnp.zeros_like(blk)
        S1 = jnp.zeros_like(blk)
        S2 = jnp.zeros_like(blk)
        for j in range(T):
            sel = a[j : j + _UNROLL, :]
            q = prm_ref[1 + j, :][None, :]
            S0 = S0 + q * (sel & 0xFFF)
            S1 = S1 + q * ((sel >> 12) & 0xFFF)
            S2 = S2 + q * (sel >> 24)
        u_h = (S0 + _HALF) >> 12
        lt_pred = (S2 << 9) + ((S1 + u_h) >> 3)
        use = jnp.logical_and(
            max_delay > 0, k_iota + (l * tile_l + s32) >= max_delay
        )
        r2_g = jnp.where(use, blk - lt_pred, blk)
        outs = []
        for k in range(_UNROLL):
            outs.append(lms_step(r2_g[k : k + 1, :], s32 + jnp.int32(k)))
        hist[pl.ds(wp, _UNROLL), :] = blk
        hist[pl.ds(wp + D, _UNROLL), :] = blk
        out_ref[pl.ds(s0, _UNROLL), :] = jnp.concatenate(outs, axis=0)
        wp = wp + jnp.int32(_UNROLL)
        wp = jnp.where(wp == D, jnp.int32(0), wp)
        return (s32 + jnp.int32(_UNROLL), wp)

    jax.lax.fori_loop(
        0, tile_l // _UNROLL, body_u,
        (jnp.int32(0), jnp.mod(l * jnp.int32(tile_l), jnp.int32(D))),
    )


def _fused_encode_kernel_win(hi8_ref, data_ref, coef_ref, prm_ref, out_ref,
                             lms_state, hist, b_state, x_prev, *,
                             parcor_order, num_taps, tile_l, hist_d, win):
    """Fully-merged ENCODE cascade (VERDICT r4 #2): pre-emphasis -> lattice
    predict -> windowed long-term FIR -> sign-sign LMS predict in ONE
    sample loop, so the tile makes a single HBM round trip — the
    stage1+stage2 form paid two kernel dispatches plus a full (L, B)
    intermediate write+read (and its transposes). The FIR history is the
    stage-1 residual, computed in-loop and landed in the same doubled ring
    the decode cascade uses; the window slice is read once per 8-sample
    group BEFORE the group computes, which is safe because the plan
    guarantees every active lag's shallowest feedback >= _UNROLL (the
    group's own residuals are never referenced). Per-sample arithmetic is
    identical to _lattice_kernel (predict) -> _fused_stage2_kernel_win, so
    residuals are byte-identical. Reference hot loop being batched:
    SLAEncoder.c:598-672."""
    p = parcor_order
    T = num_taps
    D = hist_d
    M = lms_state.shape[0] // 4
    l = pl.program_id(1)
    hi8 = hi8_ref[pl.program_id(0)]

    @pl.when(l == 0)
    def _():
        lms_state[:] = jnp.zeros_like(lms_state)
        b_state[:] = jnp.zeros_like(b_state)
        x_prev[:] = jnp.zeros_like(x_prev)
        hist[:] = jnp.zeros_like(hist)

    c = coef_ref[:p, :]  # (p, TB)
    max_delay = prm_ref[0, :][None, :]
    d = hi8 - max_delay  # constant per-lane window shift (see _align_window)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (_UNROLL, data_ref.shape[1]), 0)

    def lattice_step(x):
        # pre-emphasis + lattice predict (_lattice_kernel predict body)
        b_prev = b_state[:]
        y = x - ((x_prev[:] * 31) >> 5)
        x_prev[:] = x
        m = (c * b_prev[:p, :] + _HALF) >> 15
        incl = _cumsum_sublanes(m, p)
        f_prev = y - (incl - m)
        b_hi = b_prev[:p, :] - ((c * f_prev + _HALF) >> 15)
        b_state[:] = jnp.concatenate([y, b_hi], axis=0)
        return y - incl[p - 1 : p, :]

    def lms_step(x, s32):
        # sign-sign LMS predict (_fused_stage2_kernel_win body)
        fc = lms_state[0:M, :]
        ic = lms_state[M : 2 * M, :]
        xb = lms_state[2 * M : 3 * M, :]
        pb = lms_state[3 * M : 4 * M, :]
        acc = jnp.full_like(x, 512)
        acc = acc + jnp.sum(fc * xb, axis=0, keepdims=True, dtype=jnp.int32)
        acc = acc + jnp.sum(ic * pb, axis=0, keepdims=True, dtype=jnp.int32)
        pred = acc >> 10
        warm = jnp.logical_and(l == 0, s32 < M)
        out = x - pred
        mag = jnp.abs(out)
        bl = jnp.int32(32) - jax.lax.clz(mag)
        step = jnp.sign(out) * (bl >> 1)
        step = jnp.where(warm, jnp.int32(0), step)
        lms_state[0:M, :] = fc + step * jnp.sign(xb)
        lms_state[M : 2 * M, :] = ic + step * jnp.sign(pb)
        lms_state[2 * M : 3 * M, :] = jnp.concatenate(
            [x, xb[: M - 1, :]], axis=0
        )
        lms_state[3 * M : 4 * M, :] = jnp.concatenate(
            [jnp.where(warm, x, pred), pb[: M - 1, :]], axis=0
        )
        return jnp.where(warm, x, out)

    def body_u(i, carry):
        s32, wp = carry
        s0 = pl.multiple_of(s32, _UNROLL)
        blk = data_ref[pl.ds(s0, _UNROLL), :]
        st0 = pl.multiple_of(wp + D - hi8, 8)
        w = hist[pl.ds(st0, win + _UNROLL), :]
        a = _align_window(w, d, T + _UNROLL - 1)
        # group-wide FIR prediction: the window predates this group (the
        # feedback-depth precondition), so the tap/limb arithmetic runs on
        # full-sublane (_UNROLL, TB) tiles before the sample loop
        S0 = jnp.zeros_like(blk)
        S1 = jnp.zeros_like(blk)
        S2 = jnp.zeros_like(blk)
        for j in range(T):
            sel = a[j : j + _UNROLL, :]
            q = prm_ref[1 + j, :][None, :]
            S0 = S0 + q * (sel & 0xFFF)
            S1 = S1 + q * ((sel >> 12) & 0xFFF)
            S2 = S2 + q * (sel >> 24)
        u_h = (S0 + _HALF) >> 12
        lt_pred = (S2 << 9) + ((S1 + u_h) >> 3)
        use = jnp.logical_and(
            max_delay > 0, k_iota + (l * tile_l + s32) >= max_delay
        )
        r1s = []
        outs = []
        for k in range(_UNROLL):
            r1 = lattice_step(blk[k : k + 1, :])
            r1s.append(r1)
            r2 = jnp.where(use[k : k + 1, :], r1 - lt_pred[k : k + 1, :], r1)
            outs.append(lms_step(r2, s32 + jnp.int32(k)))
        r1b = jnp.concatenate(r1s, axis=0)
        hist[pl.ds(wp, _UNROLL), :] = r1b
        hist[pl.ds(wp + D, _UNROLL), :] = r1b
        out_ref[pl.ds(s0, _UNROLL), :] = jnp.concatenate(outs, axis=0)
        wp = wp + jnp.int32(_UNROLL)
        wp = jnp.where(wp == D, jnp.int32(0), wp)
        return (s32 + jnp.int32(_UNROLL), wp)

    jax.lax.fori_loop(
        0, tile_l // _UNROLL, body_u,
        (jnp.int32(0), jnp.mod(l * jnp.int32(tile_l), jnp.int32(D))),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "parcor_order", "num_taps", "lms_order", "hist_d", "lt_win", "interpret",
    ),
)
def fused_encode_tl(data_t, coef_t, prm_t, parcor_order, num_taps, lms_order,
                    hist_d=_LT_HIST_D, lt_win=0, hi8s=None, interpret=False):
    """Fully-merged encode cascade (see _fused_encode_kernel_win). data_t:
    (L, B) int32 input samples; coef_t: (p, B); prm_t: (1+T, B). Requires
    lt_win > 0, num_taps > 0, parcor_order >= 1, lms_order >= 1 — the
    caller plans the window and falls back to encode_stage1 +
    fused_stage2_tl otherwise. Returns the (L, B) final residual."""
    p = parcor_order
    kernel = functools.partial(
        _fused_encode_kernel_win,
        parcor_order=p,
        num_taps=num_taps,
        tile_l=TILE_L,
        hist_d=hist_d,
        win=lt_win,
    )
    nl = data_t.shape[0] // TILE_L
    pp = -(-p // 8) * 8  # Mosaic sublane rule (see lattice_filter_tl)
    if pp != p:
        coef_t = jnp.concatenate(
            [coef_t, jnp.zeros((pp - p, coef_t.shape[1]), coef_t.dtype)], axis=0
        )
    coef_tiled = jnp.tile(coef_t, (nl, 1))
    coef_spec = pl.BlockSpec((pp, TILE_B), lambda b, l: (l, b), memory_space=pltpu.VMEM)
    if prm_t.shape[0] < 8:
        prm_t = jnp.concatenate(
            [prm_t, jnp.zeros((8 - prm_t.shape[0], prm_t.shape[1]), prm_t.dtype)],
            axis=0,
        )
    prm_tiled = jnp.tile(prm_t, (nl, 1))
    prm_spec = pl.BlockSpec((8, TILE_B), lambda b, l: (l, b), memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((4 * lms_order, TILE_B), jnp.int32),
        pltpu.VMEM((2 * hist_d + lt_win + _UNROLL, TILE_B), jnp.int32),
        pltpu.VMEM((p + 1, TILE_B), jnp.int32),
        pltpu.VMEM((1, TILE_B), jnp.int32),
    ]
    return _filter_call_scalar(
        kernel, jnp.asarray(hi8s, dtype=jnp.int32).reshape(-1), data_t,
        [coef_tiled, prm_tiled], [coef_spec, prm_spec], scratch, interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("num_taps", "lms_order", "hist_d", "lt_win", "interpret")
)
def fused_stage2_tl(data_t, prm_t, num_taps, lms_order, hist_d=_LT_HIST_D,
                    lt_win=0, hi8s=None, interpret=False):
    """Merged encode stage 2 (see _fused_stage2_kernel_win). data_t: (L, B)
    stage-1 residual; prm_t: (1+T, B). Requires lt_win > 0 and num_taps > 0
    (the caller plans the window and falls back to the two-dispatch form
    otherwise). Returns the (L, B) final residual."""
    kernel = functools.partial(
        _fused_stage2_kernel_win,
        num_taps=num_taps,
        tile_l=TILE_L,
        hist_d=hist_d,
        win=lt_win,
    )
    nl = data_t.shape[0] // TILE_L
    if prm_t.shape[0] < 8:
        prm_t = jnp.concatenate(
            [prm_t, jnp.zeros((8 - prm_t.shape[0], prm_t.shape[1]), prm_t.dtype)],
            axis=0,
        )
    prm_tiled = jnp.tile(prm_t, (nl, 1))
    prm_spec = pl.BlockSpec((8, TILE_B), lambda b, l: (l, b), memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((4 * lms_order, TILE_B), jnp.int32),
        pltpu.VMEM((2 * hist_d + lt_win + _UNROLL, TILE_B), jnp.int32),
    ]
    return _filter_call_scalar(
        kernel, jnp.asarray(hi8s, dtype=jnp.int32).reshape(-1), data_t,
        [prm_tiled], [prm_spec], scratch, interpret,
    )


# ---------------------------------------------------------------------------
# Wide (sublane-batched) fused cascades.
#
# The narrow kernels spend most per-sample arithmetic on (1, TB) row values
# (acc, pred, out, mag, step, the lattice out row ...) — each occupies a
# full 8-sublane vector register at 1/8 utilization. The wide layout packs
# _WG = 8 INDEPENDENT row-groups onto the sublane axis instead: packed row
# _WG*slot + g holds slot `slot` of row-group g, so every former (1, TB)
# value becomes a full (_WG, TB) register and every state scan runs over
# slots at stride _WG (all shifts stay 8-row aligned). One kernel
# invocation advances 8 * TILE_B = 1024 rows; the host plans 1024-row lag
# bands (pipeline._longterm_window_plan on the wide tile size) and falls
# back to the narrow kernels for small batches. Per-sample arithmetic is
# identical op-for-op, so outputs are byte-identical over the same rows.
# ---------------------------------------------------------------------------

_WG = 8  # row-groups per sublane batch (the vreg sublane count)
_WTILE_L = 512  # L tile: wide blocks are 8x taller, so 1/4 the narrow tile


def _slot_suffix_sum(m: jnp.ndarray, p: int) -> jnp.ndarray:
    """_suffix_sum_sublanes over slots at stride _WG (wide layout)."""
    shift = 1
    while shift < p:
        z = jnp.zeros((_WG * shift, m.shape[1]), m.dtype)
        m = m + jnp.concatenate([m[_WG * shift :, :], z], axis=0)
        shift <<= 1
    return m


def _slot_cumsum(m: jnp.ndarray, p: int) -> jnp.ndarray:
    """_cumsum_sublanes over slots at stride _WG (wide layout)."""
    shift = 1
    while shift < p:
        z = jnp.zeros((_WG * shift, m.shape[1]), m.dtype)
        m = m + jnp.concatenate([z, m[: _WG * (p - shift), :]], axis=0)
        shift <<= 1
    return m


def _slot_total(v: jnp.ndarray, n: int) -> jnp.ndarray:
    """Per-row-group total over n slots: (_WG*n, TB) -> (_WG, TB).
    Wrapping int32 adds are associative, so the shifted-add tree produces
    the same value as the narrow kernels' jnp.sum."""
    s = 1
    while s < n:
        z = jnp.zeros((_WG * s, v.shape[1]), v.dtype)
        v = v + jnp.concatenate([v[_WG * s :, :], z], axis=0)
        s <<= 1
    return v[:_WG, :]


def _rep(v: jnp.ndarray, n: int) -> jnp.ndarray:
    """Repeat a (_WG, TB) tile n times along sublanes (2-D concat — Mosaic
    has no 3-D broadcast path for jnp.tile)."""
    return v if n == 1 else jnp.concatenate([v] * n, axis=0)


def _wide_takes(d: jnp.ndarray, win: int, need: int) -> list:
    """Pre-tiled barrel-select masks for _align_window_wide: one (rows_b,
    TB) bool per bit of the per-row window shift d (_WG, TB). Hoisted out
    of the sample loop — d is constant for the whole kernel."""
    nbits = max(1, (win + _UNROLL - 1).bit_length())
    takes = []
    for b in range(nbits):
        keep = min(win + _UNROLL, need + (1 << b) - 1) if b else need
        takes.append(_rep(((d >> b) & 1) != 0, keep))
    return takes


def _align_window_wide(w: jnp.ndarray, takes: list, need: int) -> jnp.ndarray:
    """_align_window in the wide layout: shifts move whole slots (_WG rows
    at a time, all aligned); takes comes from _wide_takes."""
    for b in reversed(range(len(takes))):
        s = _WG * (1 << b)
        keep = takes[b].shape[0]
        rows = w.shape[0]
        hi_rows = max(0, min(keep, rows - s))
        hi = w[s : s + hi_rows, :]
        if hi_rows < keep:
            hi = jnp.concatenate(
                [hi, jnp.zeros((keep - hi_rows, w.shape[1]), w.dtype)], axis=0
            )
        w = jnp.where(takes[b], hi, w[:keep, :])
    return w


def _fused_synth_kernel_wide(hi8_ref, res_ref, coef_ref, prm_ref, out_ref,
                             lms_state, hist, b_state, x_prev, *,
                             parcor_order, num_taps, tile_l, hist_d, win):
    """_fused_synth_kernel_win in the wide layout (see the section comment).
    State refs are the narrow shapes scaled by _WG rows; the ring is
    addressed in slots (row = _WG*slot + g)."""
    G = _WG
    p = parcor_order
    T = num_taps
    D = hist_d
    M = lms_state.shape[0] // (4 * G)
    l = pl.program_id(1)
    hi8 = hi8_ref[pl.program_id(0)]

    @pl.when(l == 0)
    def _():
        lms_state[:] = jnp.zeros_like(lms_state)
        b_state[:] = jnp.zeros_like(b_state)
        x_prev[:] = jnp.zeros_like(x_prev)
        hist[:] = jnp.zeros_like(hist)

    c = coef_ref[: G * p, :]  # (G*p, TB), order o of group g at row G*o+g
    max_delay = prm_ref[0:G, :]  # (G, TB)
    d = hi8 - max_delay
    TB = res_ref.shape[1]
    need = T + _UNROLL - 1
    takes = _wide_takes(d, win, need)
    qs = [_rep(prm_ref[G * (1 + j) : G * (2 + j), :], _UNROLL)
          for j in range(T)]
    md_t = _rep(max_delay, _UNROLL)
    # packed row -> sample index inside the group (row // _WG)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (G * _UNROLL, TB), 0) >> 3

    def lms_step(x, s32, step_in):
        fc = lms_state[0 : G * M, :]
        ic = lms_state[G * M : 2 * G * M, :]
        xb = lms_state[2 * G * M : 3 * G * M, :]
        pb = lms_state[3 * G * M : 4 * G * M, :]
        acc = jnp.full((G, TB), 512, jnp.int32)
        acc = acc + _slot_total(fc * xb, M)
        acc = acc + _slot_total(ic * pb, M)
        pred = acc >> 10
        warm = jnp.logical_and(l == 0, s32 < M)
        out = x + pred
        step = jnp.where(warm, jnp.int32(0), step_in)
        step_t = _rep(step, M)
        lms_state[0 : G * M, :] = fc + step_t * jnp.sign(xb)
        lms_state[G * M : 2 * G * M, :] = ic + step_t * jnp.sign(pb)
        lms_state[2 * G * M : 3 * G * M, :] = jnp.concatenate(
            [out, xb[: G * (M - 1), :]], axis=0
        )
        lms_state[3 * G * M : 4 * G * M, :] = jnp.concatenate(
            [jnp.where(warm, out, pred), pb[: G * (M - 1), :]], axis=0
        )
        return jnp.where(warm, x, out)

    def lattice_step(r):
        b_prev = b_state[:]
        m = (c * b_prev[: G * p, :] + _HALF) >> 15
        suf = _slot_suffix_sum(m, p)
        f_partial = _rep(r, p) + suf
        b_hi = b_prev[: G * p, :] - ((c * f_partial + _HALF) >> 15)
        out = f_partial[0:G, :]
        b_state[:] = jnp.concatenate([out, b_hi], axis=0)
        y = out + ((x_prev[:] * 31) >> 5)
        x_prev[:] = y
        return y

    def body_u(i, carry):
        s32, wp = carry
        s0 = pl.multiple_of(s32, _UNROLL)
        blk = res_ref[pl.ds(G * s0, G * _UNROLL), :]
        st0 = pl.multiple_of(wp + D - hi8, 8)
        w = hist[pl.ds(G * st0, G * (win + _UNROLL)), :]
        a = _align_window_wide(w, takes, need)
        S0 = jnp.zeros_like(blk)
        S1 = jnp.zeros_like(blk)
        S2 = jnp.zeros_like(blk)
        for j in range(T):
            sel = a[G * j : G * (j + _UNROLL), :]
            S0 = S0 + qs[j] * (sel & 0xFFF)
            S1 = S1 + qs[j] * ((sel >> 12) & 0xFFF)
            S2 = S2 + qs[j] * (sel >> 24)
        u_h = (S0 + _HALF) >> 12
        lt_pred = (S2 << 9) + ((S1 + u_h) >> 3)
        use = jnp.logical_and(md_t > 0, k_iota + (l * tile_l + s32) >= md_t)
        bl_g = jnp.int32(32) - jax.lax.clz(jnp.abs(blk))
        step_g = jnp.sign(blk) * (bl_g >> 1)
        lt_outs = []
        outs = []
        for k in range(_UNROLL):
            o1 = lms_step(blk[G * k : G * (k + 1), :], s32 + jnp.int32(k),
                          step_g[G * k : G * (k + 1), :])
            o2 = jnp.where(use[G * k : G * (k + 1), :],
                           o1 + lt_pred[G * k : G * (k + 1), :], o1)
            lt_outs.append(o2)
            outs.append(lattice_step(o2))
        lt = jnp.concatenate(lt_outs, axis=0)
        hist[pl.ds(G * wp, G * _UNROLL), :] = lt
        hist[pl.ds(G * (wp + D), G * _UNROLL), :] = lt
        out_ref[pl.ds(G * s0, G * _UNROLL), :] = jnp.concatenate(outs, axis=0)
        wp = wp + jnp.int32(_UNROLL)
        wp = jnp.where(wp == D, jnp.int32(0), wp)
        return (s32 + jnp.int32(_UNROLL), wp)

    jax.lax.fori_loop(
        0, tile_l // _UNROLL, body_u,
        (jnp.int32(0), jnp.mod(l * jnp.int32(tile_l), jnp.int32(D))),
    )


def _fused_encode_kernel_wide(hi8_ref, data_ref, coef_ref, prm_ref, out_ref,
                              lms_state, hist, b_state, x_prev, *,
                              parcor_order, num_taps, tile_l, hist_d, win):
    """_fused_encode_kernel_win in the wide layout (see the section
    comment): pre-emphasis -> lattice predict -> windowed long-term FIR ->
    sign-sign LMS predict over 8 sublane-batched row-groups."""
    G = _WG
    p = parcor_order
    T = num_taps
    D = hist_d
    M = lms_state.shape[0] // (4 * G)
    l = pl.program_id(1)
    hi8 = hi8_ref[pl.program_id(0)]

    @pl.when(l == 0)
    def _():
        lms_state[:] = jnp.zeros_like(lms_state)
        b_state[:] = jnp.zeros_like(b_state)
        x_prev[:] = jnp.zeros_like(x_prev)
        hist[:] = jnp.zeros_like(hist)

    c = coef_ref[: G * p, :]
    max_delay = prm_ref[0:G, :]
    d = hi8 - max_delay
    TB = data_ref.shape[1]
    need = T + _UNROLL - 1
    takes = _wide_takes(d, win, need)
    qs = [_rep(prm_ref[G * (1 + j) : G * (2 + j), :], _UNROLL)
          for j in range(T)]
    md_t = _rep(max_delay, _UNROLL)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (G * _UNROLL, TB), 0) >> 3

    def lattice_step(x):
        b_prev = b_state[:]
        y = x - ((x_prev[:] * 31) >> 5)
        x_prev[:] = x
        m = (c * b_prev[: G * p, :] + _HALF) >> 15
        incl = _slot_cumsum(m, p)
        f_prev = _rep(y, p) - (incl - m)
        b_hi = b_prev[: G * p, :] - ((c * f_prev + _HALF) >> 15)
        b_state[:] = jnp.concatenate([y, b_hi], axis=0)
        return y - incl[G * (p - 1) : G * p, :]

    def lms_step(x, s32):
        fc = lms_state[0 : G * M, :]
        ic = lms_state[G * M : 2 * G * M, :]
        xb = lms_state[2 * G * M : 3 * G * M, :]
        pb = lms_state[3 * G * M : 4 * G * M, :]
        acc = jnp.full((G, TB), 512, jnp.int32)
        acc = acc + _slot_total(fc * xb, M)
        acc = acc + _slot_total(ic * pb, M)
        pred = acc >> 10
        warm = jnp.logical_and(l == 0, s32 < M)
        out = x - pred
        mag = jnp.abs(out)
        bl = jnp.int32(32) - jax.lax.clz(mag)
        step = jnp.sign(out) * (bl >> 1)
        step = jnp.where(warm, jnp.int32(0), step)
        step_t = _rep(step, M)
        lms_state[0 : G * M, :] = fc + step_t * jnp.sign(xb)
        lms_state[G * M : 2 * G * M, :] = ic + step_t * jnp.sign(pb)
        lms_state[2 * G * M : 3 * G * M, :] = jnp.concatenate(
            [x, xb[: G * (M - 1), :]], axis=0
        )
        lms_state[3 * G * M : 4 * G * M, :] = jnp.concatenate(
            [jnp.where(warm, x, pred), pb[: G * (M - 1), :]], axis=0
        )
        return jnp.where(warm, x, out)

    def body_u(i, carry):
        s32, wp = carry
        s0 = pl.multiple_of(s32, _UNROLL)
        blk = data_ref[pl.ds(G * s0, G * _UNROLL), :]
        st0 = pl.multiple_of(wp + D - hi8, 8)
        w = hist[pl.ds(G * st0, G * (win + _UNROLL)), :]
        a = _align_window_wide(w, takes, need)
        S0 = jnp.zeros_like(blk)
        S1 = jnp.zeros_like(blk)
        S2 = jnp.zeros_like(blk)
        for j in range(T):
            sel = a[G * j : G * (j + _UNROLL), :]
            S0 = S0 + qs[j] * (sel & 0xFFF)
            S1 = S1 + qs[j] * ((sel >> 12) & 0xFFF)
            S2 = S2 + qs[j] * (sel >> 24)
        u_h = (S0 + _HALF) >> 12
        lt_pred = (S2 << 9) + ((S1 + u_h) >> 3)
        use = jnp.logical_and(md_t > 0, k_iota + (l * tile_l + s32) >= md_t)
        r1s = []
        outs = []
        for k in range(_UNROLL):
            r1 = lattice_step(blk[G * k : G * (k + 1), :])
            r1s.append(r1)
            r2 = jnp.where(use[G * k : G * (k + 1), :],
                           r1 - lt_pred[G * k : G * (k + 1), :], r1)
            outs.append(lms_step(r2, s32 + jnp.int32(k)))
        r1b = jnp.concatenate(r1s, axis=0)
        hist[pl.ds(G * wp, G * _UNROLL), :] = r1b
        hist[pl.ds(G * (wp + D), G * _UNROLL), :] = r1b
        out_ref[pl.ds(G * s0, G * _UNROLL), :] = jnp.concatenate(outs, axis=0)
        wp = wp + jnp.int32(_UNROLL)
        wp = jnp.where(wp == D, jnp.int32(0), wp)
        return (s32 + jnp.int32(_UNROLL), wp)

    jax.lax.fori_loop(
        0, tile_l // _UNROLL, body_u,
        (jnp.int32(0), jnp.mod(l * jnp.int32(tile_l), jnp.int32(D))),
    )


def _pack_wide(x: jnp.ndarray) -> jnp.ndarray:
    """(R, B) -> (_WG*R, B/_WG): element (r, bi*1024 + g*128 + lane) lands
    at packed row _WG*r + g, packed column bi*128 + lane — the wide
    kernels' sublane-batched layout. B must be a multiple of _WG*TILE_B."""
    R, B = x.shape
    nb = B // (_WG * TILE_B)
    return (
        x.reshape(R, nb, _WG, TILE_B)
        .transpose(0, 2, 1, 3)
        .reshape(_WG * R, nb * TILE_B)
    )


def _unpack_wide(y: jnp.ndarray, B: int) -> jnp.ndarray:
    """Inverse of _pack_wide."""
    rows, C = y.shape
    R = rows // _WG
    nb = C // TILE_B
    return (
        y.reshape(R, _WG, nb, TILE_B)
        .transpose(0, 2, 1, 3)
        .reshape(R, B)
    )


def _wide_call(kernel, data_t, coef_t, prm_t, p, lms_order, hist_rows, hi8s,
               interpret):
    """Shared wiring for the wide fused cascades: pack the (L, B) operands
    into the sublane-batched layout, tile the parameter blocks per L-step,
    and unpack the result. B must be a multiple of _WG*TILE_B and L a
    multiple of _WTILE_L (callers pad; TILE_L is a multiple of _WTILE_L)."""
    G = _WG
    L, B = data_t.shape
    if prm_t.shape[0] < 8:
        prm_t = jnp.concatenate(
            [prm_t, jnp.zeros((8 - prm_t.shape[0], prm_t.shape[1]), prm_t.dtype)],
            axis=0,
        )
    data_p = _pack_wide(data_t)
    coef_p = _pack_wide(coef_t)
    prm_p = _pack_wide(prm_t)
    nl = L // _WTILE_L
    coef_tiled = jnp.tile(coef_p, (nl, 1))
    prm_tiled = jnp.tile(prm_p, (nl, 1))
    C = data_p.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C // TILE_B, nl),
        in_specs=[
            pl.BlockSpec((G * _WTILE_L, TILE_B), lambda b, l, s: (l, b)),
            pl.BlockSpec((G * p, TILE_B), lambda b, l, s: (l, b)),
            pl.BlockSpec((G * 8, TILE_B), lambda b, l, s: (l, b)),
        ],
        out_specs=pl.BlockSpec((G * _WTILE_L, TILE_B), lambda b, l, s: (l, b)),
        scratch_shapes=[
            pltpu.VMEM((4 * lms_order * G, TILE_B), jnp.int32),
            pltpu.VMEM((G * hist_rows, TILE_B), jnp.int32),
            pltpu.VMEM((G * (p + 1), TILE_B), jnp.int32),
            pltpu.VMEM((G, TILE_B), jnp.int32),
        ],
    )
    out_p = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G * L, C), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(hi8s, dtype=jnp.int32).reshape(-1), data_p, coef_tiled,
      prm_tiled)
    return _unpack_wide(out_p, B)


@functools.partial(
    jax.jit,
    static_argnames=(
        "parcor_order", "num_taps", "lms_order", "hist_d", "lt_win", "interpret",
    ),
)
def fused_synth_wide_tl(data_t, coef_t, prm_t, parcor_order, num_taps,
                        lms_order, hist_d=_LT_HIST_D, lt_win=0, hi8s=None,
                        interpret=False):
    """Wide fused decode cascade. Same contract as fused_synth_tl's
    windowed form, but B % (_WG*TILE_B) == 0, hi8s is per 1024-row tile,
    and the window plan must hold over those wider tiles (the pipeline
    plans with tile_rows=_WG*TILE_B and falls back to the narrow kernel).
    Requires lt_win > 0 and num_taps > 0."""
    kernel = functools.partial(
        _fused_synth_kernel_wide,
        parcor_order=parcor_order,
        num_taps=num_taps,
        tile_l=_WTILE_L,
        hist_d=hist_d,
        win=lt_win,
    )
    return _wide_call(kernel, data_t, coef_t, prm_t, parcor_order, lms_order,
                      2 * hist_d + lt_win + _UNROLL, hi8s, interpret)


@functools.partial(
    jax.jit,
    static_argnames=(
        "parcor_order", "num_taps", "lms_order", "hist_d", "lt_win", "interpret",
    ),
)
def fused_encode_wide_tl(data_t, coef_t, prm_t, parcor_order, num_taps,
                         lms_order, hist_d=_LT_HIST_D, lt_win=0, hi8s=None,
                         interpret=False):
    """Wide fully-merged encode cascade (fused_encode_tl's contract over
    the sublane-batched layout; see fused_synth_wide_tl)."""
    kernel = functools.partial(
        _fused_encode_kernel_wide,
        parcor_order=parcor_order,
        num_taps=num_taps,
        tile_l=_WTILE_L,
        hist_d=hist_d,
        win=lt_win,
    )
    return _wide_call(kernel, data_t, coef_t, prm_t, parcor_order, lms_order,
                      2 * hist_d + lt_win + _UNROLL, hi8s, interpret)


def _fused_stage2_kernel_wide(hi8_ref, res_ref, prm_ref, out_ref, lms_state,
                              hist, *, num_taps, tile_l, hist_d, win):
    """_fused_stage2_kernel_win in the wide layout (see the section
    comment): windowed long-term FIR + sign-sign LMS predict over 8
    sublane-batched row-groups. The FIR history is the stage-1 residual
    itself (prediction reads the INPUT)."""
    G = _WG
    T = num_taps
    D = hist_d
    M = lms_state.shape[0] // (4 * G)
    l = pl.program_id(1)
    hi8 = hi8_ref[pl.program_id(0)]

    @pl.when(l == 0)
    def _():
        lms_state[:] = jnp.zeros_like(lms_state)
        hist[:] = jnp.zeros_like(hist)

    max_delay = prm_ref[0:G, :]
    d = hi8 - max_delay
    TB = res_ref.shape[1]
    need = T + _UNROLL - 1
    takes = _wide_takes(d, win, need)
    qs = [_rep(prm_ref[G * (1 + j) : G * (2 + j), :], _UNROLL)
          for j in range(T)]
    md_t = _rep(max_delay, _UNROLL)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (G * _UNROLL, TB), 0) >> 3

    def lms_step(x, s32):
        fc = lms_state[0 : G * M, :]
        ic = lms_state[G * M : 2 * G * M, :]
        xb = lms_state[2 * G * M : 3 * G * M, :]
        pb = lms_state[3 * G * M : 4 * G * M, :]
        acc = jnp.full((G, TB), 512, jnp.int32)
        acc = acc + _slot_total(fc * xb, M)
        acc = acc + _slot_total(ic * pb, M)
        pred = acc >> 10
        warm = jnp.logical_and(l == 0, s32 < M)
        out = x - pred
        mag = jnp.abs(out)
        bl = jnp.int32(32) - jax.lax.clz(mag)
        step = jnp.sign(out) * (bl >> 1)
        step = jnp.where(warm, jnp.int32(0), step)
        step_t = _rep(step, M)
        lms_state[0 : G * M, :] = fc + step_t * jnp.sign(xb)
        lms_state[G * M : 2 * G * M, :] = ic + step_t * jnp.sign(pb)
        lms_state[2 * G * M : 3 * G * M, :] = jnp.concatenate(
            [x, xb[: G * (M - 1), :]], axis=0
        )
        lms_state[3 * G * M : 4 * G * M, :] = jnp.concatenate(
            [jnp.where(warm, x, pred), pb[: G * (M - 1), :]], axis=0
        )
        return jnp.where(warm, x, out)

    def body_u(i, carry):
        s32, wp = carry
        s0 = pl.multiple_of(s32, _UNROLL)
        blk = res_ref[pl.ds(G * s0, G * _UNROLL), :]
        st0 = pl.multiple_of(wp + D - hi8, 8)
        w = hist[pl.ds(G * st0, G * (win + _UNROLL)), :]
        a = _align_window_wide(w, takes, need)
        S0 = jnp.zeros_like(blk)
        S1 = jnp.zeros_like(blk)
        S2 = jnp.zeros_like(blk)
        for j in range(T):
            sel = a[G * j : G * (j + _UNROLL), :]
            S0 = S0 + qs[j] * (sel & 0xFFF)
            S1 = S1 + qs[j] * ((sel >> 12) & 0xFFF)
            S2 = S2 + qs[j] * (sel >> 24)
        u_h = (S0 + _HALF) >> 12
        lt_pred = (S2 << 9) + ((S1 + u_h) >> 3)
        use = jnp.logical_and(md_t > 0, k_iota + (l * tile_l + s32) >= md_t)
        r2_g = jnp.where(use, blk - lt_pred, blk)
        outs = []
        for k in range(_UNROLL):
            outs.append(lms_step(r2_g[G * k : G * (k + 1), :],
                                 s32 + jnp.int32(k)))
        hist[pl.ds(G * wp, G * _UNROLL), :] = blk
        hist[pl.ds(G * (wp + D), G * _UNROLL), :] = blk
        out_ref[pl.ds(G * s0, G * _UNROLL), :] = jnp.concatenate(outs, axis=0)
        wp = wp + jnp.int32(_UNROLL)
        wp = jnp.where(wp == D, jnp.int32(0), wp)
        return (s32 + jnp.int32(_UNROLL), wp)

    jax.lax.fori_loop(
        0, tile_l // _UNROLL, body_u,
        (jnp.int32(0), jnp.mod(l * jnp.int32(tile_l), jnp.int32(D))),
    )


@functools.partial(
    jax.jit, static_argnames=("num_taps", "lms_order", "hist_d", "lt_win", "interpret")
)
def fused_stage2_wide_tl(data_t, prm_t, num_taps, lms_order,
                         hist_d=_LT_HIST_D, lt_win=0, hi8s=None,
                         interpret=False):
    """Merged encode stage 2 in the wide layout (fused_stage2_tl's
    contract over sublane-batched row-groups; see fused_synth_wide_tl for
    the shape preconditions)."""
    G = _WG
    L, B = data_t.shape
    if prm_t.shape[0] < 8:
        prm_t = jnp.concatenate(
            [prm_t, jnp.zeros((8 - prm_t.shape[0], prm_t.shape[1]), prm_t.dtype)],
            axis=0,
        )
    data_p = _pack_wide(data_t)
    prm_p = _pack_wide(prm_t)
    nl = L // _WTILE_L
    prm_tiled = jnp.tile(prm_p, (nl, 1))
    C = data_p.shape[1]
    kernel = functools.partial(
        _fused_stage2_kernel_wide,
        num_taps=num_taps,
        tile_l=_WTILE_L,
        hist_d=hist_d,
        win=lt_win,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C // TILE_B, nl),
        in_specs=[
            pl.BlockSpec((G * _WTILE_L, TILE_B), lambda b, l, s: (l, b)),
            pl.BlockSpec((G * 8, TILE_B), lambda b, l, s: (l, b)),
        ],
        out_specs=pl.BlockSpec((G * _WTILE_L, TILE_B), lambda b, l, s: (l, b)),
        scratch_shapes=[
            pltpu.VMEM((4 * lms_order * G, TILE_B), jnp.int32),
            pltpu.VMEM((G * (2 * hist_d + lt_win + _UNROLL), TILE_B), jnp.int32),
        ],
    )
    out_p = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G * L, C), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(hi8s, dtype=jnp.int32).reshape(-1), data_p, prm_tiled)
    return _unpack_wide(out_p, B)


def _lattice_kernel_wide(data_ref, coef_ref, out_ref, b_state, x_prev, *,
                         parcor_order, tile_l, pre_emphasis, synthesize):
    """_lattice_kernel in the wide layout: lattice analysis/synthesis (+
    pre/de-emphasis) over 8 sublane-batched row-groups; the stage
    recursion runs over slots at stride _WG (see the section comment)."""
    G = _WG
    p = parcor_order
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        b_state[:] = jnp.zeros_like(b_state)
        x_prev[:] = jnp.zeros_like(x_prev)

    c = coef_ref[: G * p, :]

    if synthesize:
        def body(r):
            b_prev = b_state[:]
            m = (c * b_prev[: G * p, :] + _HALF) >> 15
            suf = _slot_suffix_sum(m, p)
            f_partial = _rep(r, p) + suf
            b_hi = b_prev[: G * p, :] - ((c * f_partial + _HALF) >> 15)
            out = f_partial[0:G, :]
            b_state[:] = jnp.concatenate([out, b_hi], axis=0)
            if pre_emphasis:  # de-emphasis on the synthesis side
                y = out + ((x_prev[:] * 31) >> 5)
                x_prev[:] = y
                return y
            return out
    else:
        def body(x):
            b_prev = b_state[:]
            if pre_emphasis:
                y = x - ((x_prev[:] * 31) >> 5)
                x_prev[:] = x
            else:
                y = x
            m = (c * b_prev[: G * p, :] + _HALF) >> 15
            incl = _slot_cumsum(m, p)
            f_prev = _rep(y, p) - (incl - m)
            b_hi = b_prev[: G * p, :] - ((c * f_prev + _HALF) >> 15)
            b_state[:] = jnp.concatenate([y, b_hi], axis=0)
            return y - incl[G * (p - 1) : G * p, :]

    def body_u(i, s32):
        s0 = pl.multiple_of(s32, _UNROLL)
        blk = data_ref[pl.ds(G * s0, G * _UNROLL), :]
        outs = [body(blk[G * k : G * (k + 1), :]) for k in range(_UNROLL)]
        out_ref[pl.ds(G * s0, G * _UNROLL), :] = jnp.concatenate(outs, axis=0)
        return s32 + jnp.int32(_UNROLL)

    jax.lax.fori_loop(0, tile_l // _UNROLL, body_u, jnp.int32(0))


@functools.partial(
    jax.jit, static_argnames=("parcor_order", "pre_emphasis", "synthesize", "interpret")
)
def lattice_filter_wide_tl(data_t, coef_t, parcor_order, pre_emphasis=True,
                           synthesize=False, interpret=False):
    """lattice_filter_tl in the wide layout: B % (_WG*TILE_B) == 0,
    L % _WTILE_L == 0. No window plan needed — eligibility is shape-only."""
    G = _WG
    p = parcor_order
    L, B = data_t.shape
    data_p = _pack_wide(data_t)
    coef_p = _pack_wide(coef_t)
    nl = L // _WTILE_L
    coef_tiled = jnp.tile(coef_p, (nl, 1))
    C = data_p.shape[1]
    kernel = functools.partial(
        _lattice_kernel_wide,
        parcor_order=p,
        tile_l=_WTILE_L,
        pre_emphasis=pre_emphasis,
        synthesize=synthesize,
    )
    out_p = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G * L, C), jnp.int32),
        grid=(C // TILE_B, nl),
        in_specs=[
            pl.BlockSpec((G * _WTILE_L, TILE_B), lambda b, l: (l, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * p, TILE_B), lambda b, l: (l, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G * _WTILE_L, TILE_B), lambda b, l: (l, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G * (p + 1), TILE_B), jnp.int32),
            pltpu.VMEM((G, TILE_B), jnp.int32),
        ],
        interpret=interpret,
    )(data_p, coef_tiled)
    return _unpack_wide(out_p, B)


def _fused_synth_kernel(res_ref, coef_ref, prm_ref, out_ref, lms_state, hist,
                        b_state, x_prev, *, parcor_order, num_taps, tile_l,
                        hist_d):
    """Whole decode cascade (LMS synth -> long-term synth -> lattice synth
    + de-emphasis) in ONE kernel: the tile makes one HBM->VMEM round trip
    instead of three. The stages have no cross-feedback (decoder.py
    synth_rowsT has the same three-pass argument), so running each stage's
    sample loop to completion over the tile — with its own state carried
    across the L grid — produces values identical to the separate kernels.
    Intermediates live in the out_ref VMEM block, rewritten in place."""
    p = parcor_order
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        lms_state[:] = jnp.zeros_like(lms_state)
        b_state[:] = jnp.zeros_like(b_state)
        x_prev[:] = jnp.zeros_like(x_prev)
        if num_taps > 0:
            hist[:] = jnp.zeros_like(hist)

    # ---- pass A: LMS synthesis, res_ref -> out_ref
    _lms_kernel_body(res_ref, out_ref, lms_state, lms_order=lms_state.shape[0] // 4,
                     tile_l=tile_l, synthesize=True, l=l)
    # ---- pass B: long-term ring synthesis, out_ref in place
    if num_taps > 0:
        _longterm_body(out_ref, prm_ref, out_ref, hist, num_taps=num_taps,
                       tile_l=tile_l, hist_d=hist_d, l=l)
    # ---- pass C: lattice synthesis + de-emphasis, out_ref in place
    _lattice_synth_body(out_ref, coef_ref, out_ref, b_state, x_prev, p=p,
                        tile_l=tile_l)


@functools.partial(
    jax.jit,
    static_argnames=(
        "parcor_order", "num_taps", "lms_order", "hist_d", "lt_win", "interpret",
    ),
)
def fused_synth_tl(data_t, coef_t, prm_t, parcor_order, num_taps, lms_order,
                   hist_d=_LT_HIST_D, lt_win=0, hi8s=None, interpret=False):
    """Fused decode cascade. data_t: (L, B) residual; coef_t: (p, B);
    prm_t: (1+T, B) long-term params (ignored when num_taps == 0).
    Returns (L, B) PCM rows (pre MS-inverse / left shift).

    lt_win > 0 selects the windowed long-term pass: hi8s must be the
    (B/TILE_B, 1) int32 per-tile max lag rounded up to 8, lt_win (static,
    multiple of 8) must cover every tile's lag spread + num_taps, and every
    active lag's shallowest feedback must be >= 8 samples — the pipeline
    computes all three and falls back to lt_win=0 otherwise."""
    p = parcor_order
    win_on = lt_win > 0 and num_taps > 0
    if win_on:
        kernel = functools.partial(
            _fused_synth_kernel_win,
            parcor_order=p,
            num_taps=num_taps,
            tile_l=TILE_L,
            hist_d=hist_d,
            win=lt_win,
        )
    else:
        kernel = functools.partial(
            _fused_synth_kernel,
            parcor_order=p,
            num_taps=num_taps,
            tile_l=TILE_L,
            hist_d=hist_d,
        )
    nl = data_t.shape[0] // TILE_L
    pp = -(-p // 8) * 8  # Mosaic sublane rule (see lattice_filter_tl)
    if pp != p:
        coef_t = jnp.concatenate(
            [coef_t, jnp.zeros((pp - p, coef_t.shape[1]), coef_t.dtype)], axis=0
        )
    coef_tiled = jnp.tile(coef_t, (nl, 1))
    coef_spec = pl.BlockSpec((pp, TILE_B), lambda b, l: (l, b), memory_space=pltpu.VMEM)
    if prm_t.shape[0] < 8:
        prm_t = jnp.concatenate(
            [prm_t, jnp.zeros((8 - prm_t.shape[0], prm_t.shape[1]), prm_t.dtype)],
            axis=0,
        )
    prm_tiled = jnp.tile(prm_t, (nl, 1))
    prm_spec = pl.BlockSpec((8, TILE_B), lambda b, l: (l, b), memory_space=pltpu.VMEM)
    hist_rows = 2 * hist_d + lt_win + _UNROLL if win_on else hist_d
    scratch = [
        pltpu.VMEM((4 * lms_order, TILE_B), jnp.int32),
        pltpu.VMEM((hist_rows, TILE_B), jnp.int32),
        pltpu.VMEM((p + 1, TILE_B), jnp.int32),
        pltpu.VMEM((1, TILE_B), jnp.int32),
    ]
    if win_on:
        return _filter_call_scalar(
            kernel, jnp.asarray(hi8s, dtype=jnp.int32).reshape(-1), data_t,
            [coef_tiled, prm_tiled], [coef_spec, prm_spec], scratch, interpret,
        )
    return _filter_call(
        kernel, data_t, [coef_tiled, prm_tiled], [coef_spec, prm_spec],
        scratch, interpret,
    )


def longterm_ring_depth(max_lag: int) -> int:
    """Smallest supported ring depth > max_lag (bounded set of sizes keeps
    the jit specializations bounded; all are 8-aligned)."""
    for d in (72, 136, _LT_HIST_D):
        if max_lag < d:
            return d
    raise ValueError(f"long-term lag {max_lag} exceeds the ring capacity")


def _filter_call(kernel, data_t, extra_inputs, extra_specs, scratch, interpret=False):
    """Common pallas_call wiring: grid (B/TB, L/TL) with the L axis fastest
    so VMEM scratch state persists sample order within each row group."""
    L, B = data_t.shape
    grid = (B // TILE_B, L // TILE_L)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, B), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_L, TILE_B), lambda b, l: (l, b), memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec(
            (TILE_L, TILE_B), lambda b, l: (l, b), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(data_t, *extra_inputs)


def _filter_call_scalar(kernel, scalars, data_t, extra_inputs, extra_specs,
                        scratch, interpret=False):
    """_filter_call with ONE scalar-prefetch input (per-B-tile values in
    SMEM, available before the body runs — the supported way to hand Mosaic
    small per-tile scalars; a constant-index-map SMEM block is rejected).
    The kernel receives the scalar ref FIRST; index maps gain a trailing
    scalar-ref argument they ignore."""
    L, B = data_t.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // TILE_B, L // TILE_L),
        in_specs=[
            pl.BlockSpec((TILE_L, TILE_B), lambda b, l, s: (l, b)),
            *[
                pl.BlockSpec(sp.block_shape, functools.partial(
                    lambda im, b, l, s: im(b, l), sp.index_map))
                for sp in extra_specs
            ],
        ],
        out_specs=pl.BlockSpec((TILE_L, TILE_B), lambda b, l, s: (l, b)),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, B), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, data_t, *extra_inputs)


@functools.partial(
    jax.jit, static_argnames=("parcor_order", "pre_emphasis", "synthesize", "interpret")
)
def lattice_filter_tl(data_t, coef_t, parcor_order, pre_emphasis=True,
                      synthesize=False, interpret=False):
    """data_t: (L, B) int32 (L % TILE_L == 0, B % TILE_B == 0);
    coef_t: (p, B). Returns (L, B) residual/output."""
    p = parcor_order
    kernel = functools.partial(
        _lattice_kernel,
        parcor_order=p,
        tile_l=TILE_L,
        pre_emphasis=pre_emphasis,
        synthesize=synthesize,
    )
    # Mosaic (this toolchain) rejects input blocks that are revisited across
    # grid steps (index map constant in the fastest dim) — tile the coefs per
    # L-step so every grid step maps to a fresh block. nl * p * B int32 is
    # a few hundred KB at most.
    nl = data_t.shape[0] // TILE_L
    # pad the coefficient block's sublane dim to a multiple of 8 (Mosaic
    # block-shape rule, CLAUDE.md invariant 6 — the long-term prm block is
    # padded the same way); the kernel reads rows 0..p-1 only
    pp = -(-p // 8) * 8
    if pp != p:
        coef_t = jnp.concatenate(
            [coef_t, jnp.zeros((pp - p, coef_t.shape[1]), coef_t.dtype)], axis=0
        )
    coef_tiled = jnp.tile(coef_t, (nl, 1))
    coef_spec = pl.BlockSpec((pp, TILE_B), lambda b, l: (l, b), memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((p + 1, TILE_B), jnp.int32),
        pltpu.VMEM((1, TILE_B), jnp.int32),
    ]
    return _filter_call(kernel, data_t, [coef_tiled], [coef_spec], scratch, interpret)


@functools.partial(jax.jit, static_argnames=("lms_order", "synthesize", "interpret"))
def lms_filter_tl(data_t, lms_order, synthesize=False, interpret=False):
    """data_t: (L, B) int32. Returns (L, B)."""
    M = lms_order
    if M == 0:  # valid stream parameter: passthrough (see kernels/lms.py)
        return data_t

    def kernel(data_ref, out_ref, state):
        _lms_kernel(
            data_ref, out_ref, state, lms_order=M, tile_l=TILE_L, synthesize=synthesize
        )

    scratch = [pltpu.VMEM((4 * M, TILE_B), jnp.int32)]
    return _filter_call(kernel, data_t, [], [], scratch, interpret)
