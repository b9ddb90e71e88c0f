"""Multi-chip sharding of the codec over a `jax.sharding.Mesh`.

The reference encoder iterates two serial axes in one thread: blocks
(SLAEncoder.c:846 `while (encode_offset_sample < num_samples)`) and channels
(SLAEncoder.c:531 `for (ch = 0; ...)`). Here those axes become mesh axes:

    mesh ('blocks', 'channels')   batch rows = blocks x channels

* **blocks** is the sequence-parallel axis: the format resets every filter at
  block start (SLADecoder.c:637-639), so blocks are fully independent — this
  is data parallelism over the sample dimension with zero halo exchange.
* **channels** shards the per-block channel grid (and, at corpus scale, whole
  files round-robin).

The only cross-shard coordination the format requires is the header
statistics — `max_block_size` / `max_bit_per_second` are maxima over all
blocks (SLAEncoder.c:890-898) — and the stream-offset prefix sum over encoded
block byte lengths (SLAEncoder.c:887). Both ride ICI as one collective here
(`jax.lax.pmax` / cumulative sum), instead of being serial loop state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.emphasis import pre_emphasis
from ..kernels.lattice import lattice_init_state, lattice_predict
from ..kernels.lms import lms_init_state, lms_predict
from ..kernels.longterm import longterm_predict

BLOCK_AXIS = "blocks"
CHANNEL_AXIS = "channels"


def make_mesh(devices=None, channel_parallel: int | None = None) -> Mesh:
    """Build a ('blocks', 'channels') mesh over the given devices.

    `channel_parallel` devices are assigned to the channel axis; the rest go
    to the (always larger) block axis. None reads SLA_TPU_MESH_CHANNELS
    (default 1, pure block parallelism) — the knob the full-pipeline
    backend='mesh' paths honor when the stream's channel count divides it.
    """
    if channel_parallel is None:
        import os

        channel_parallel = max(int(os.environ.get("SLA_TPU_MESH_CHANNELS", "1")), 1)
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % channel_parallel != 0:
        raise ValueError(f"{n} devices not divisible by channel_parallel={channel_parallel}")
    grid = np.asarray(devices).reshape(n // channel_parallel, channel_parallel)
    return Mesh(grid, (BLOCK_AXIS, CHANNEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (num_blocks, num_channels, L) batches: blocks and
    channels across the mesh, samples replicated within a row (the sample
    scan is sequential inside each block — SURVEY §7)."""
    return NamedSharding(mesh, P(BLOCK_AXIS, CHANNEL_AXIS, None))


def _vary(x):
    """Mark a scan carry as varying over BOTH manual mesh axes (shard_map
    bodies trace with replicated-by-default leaves; the per-row filter
    state is per-shard)."""
    return jax.lax.pcast(x, (BLOCK_AXIS, CHANNEL_AXIS), to="varying")


def _reject_assert_mode() -> None:
    """checkify.check calls embedded by SLA_TPU_DEBUG_ASSERTS=1 cannot be
    functionalized through shard_map; fail with a clear message (at trace
    time) instead of the cryptic 'cannot abstractly evaluate' error. The
    encoder demotes mesh to the checkified single-device path
    automatically."""
    from .. import debug

    if debug.asserts_enabled():
        from ..errors import ApiResult, SLAError

        raise SLAError(
            ApiResult.INVALID_ARGUMENT,
            "SLA_TPU_DEBUG_ASSERTS is not supported on the mesh path",
        )


@functools.partial(
    jax.jit, static_argnames=("parcor_order", "num_taps", "lms_order", "mesh")
)
def sharded_encode_step(
    data: jnp.ndarray,
    parcor_coef: jnp.ndarray,
    pitch: jnp.ndarray,
    ltm_coef: jnp.ndarray,
    parcor_order: int,
    num_taps: int,
    lms_order: int,
    mesh: Mesh,
):
    """One sharded encode filter step over the whole mesh.

    data: (NB, NC, L) int32 sharded (blocks, channels); parcor_coef:
    (NB, NC, p); pitch: (NB, NC); ltm_coef: (NB, NC, T).

    Returns (residual (NB, NC, L), abs_sum (NB, NC), global_max_bitlen ()):
    the final residual, the per-row zigzag magnitude sum (the initial Rice
    parameter numerator, SLACoder.c:361-385), and the globally reduced
    maximum estimated payload bit length: a crude 2+log2(mean) finiteness
    statistic over the PADDED row length (demonstrating the cross-shard
    pmax collective; zero padding dilutes the mean) — NOT the exact
    `max_block_size` header field, which the host computes from the real
    encoded block sizes (SLAEncoder.c:890-898). Callers use it only as a
    sharded-reduction smoke value.
    """
    _reject_assert_mode()

    def local(data, parcor_coef, pitch, ltm_coef):
        nb, nc, L = data.shape
        B = nb * nc
        rows = data.reshape(B, L)
        coefs = parcor_coef.reshape(B, -1)
        pit = pitch.reshape(B)
        ltm = ltm_coef.reshape(B, -1)

        vary = _vary

        emphasized, _ = pre_emphasis(rows, vary(jnp.zeros((B,), jnp.int32)))
        residual, _ = lattice_predict(
            emphasized, coefs, vary(lattice_init_state(B, parcor_order))
        )
        if num_taps > 0:
            lt_res, _ = longterm_predict(
                residual, pit, ltm, num_taps, vary(jnp.zeros((B,), jnp.int32))
            )
            residual = jnp.where((pit > 0)[:, None], lt_res, residual)
        out, _ = lms_predict(
            residual, jax.tree.map(vary, lms_init_state(B, lms_order)), lms_order
        )

        # zigzag magnitude sum -> initial Rice parameter numerator
        zz = jnp.where(out < 0, -2 * out.astype(jnp.int64) - 1, 2 * out.astype(jnp.int64))
        abs_sum = zz.sum(axis=1)
        # crude per-row bit-length estimate: 2 + log2(mean) bits/sample
        mean = jnp.maximum(abs_sum // L, 1)
        bits = (2 + jnp.log2(mean.astype(jnp.float32))) * L
        local_max = jnp.max(bits)
        # header statistic: global max over every shard (ICI collective)
        gmax = jax.lax.pmax(jax.lax.pmax(local_max, BLOCK_AXIS), CHANNEL_AXIS)
        return out.reshape(nb, nc, L), abs_sum.reshape(nb, nc), gmax

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
            P(BLOCK_AXIS, CHANNEL_AXIS),
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
        ),
        out_specs=(
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
            P(BLOCK_AXIS, CHANNEL_AXIS),
            P(),
        ),
    )(data, parcor_coef, pitch, ltm_coef)


@functools.partial(jax.jit, static_argnames=("parcor_order", "mesh"))
def sharded_encode_stage1(
    data: jnp.ndarray, parcor_coef: jnp.ndarray, parcor_order: int, mesh: Mesh
):
    """Mesh-sharded pre-emphasis + lattice predict over (NB, NC, L) batches
    (the first half of the encode cascade; pitch analysis sits between the
    stages on host, so full-file encode needs the split)."""
    _reject_assert_mode()

    def local(data, parcor_coef):
        nb, nc, L = data.shape
        B = nb * nc

        vary = _vary

        emphasized, _ = pre_emphasis(data.reshape(B, L), vary(jnp.zeros((B,), jnp.int32)))
        residual, _ = lattice_predict(
            emphasized, parcor_coef.reshape(B, -1), vary(lattice_init_state(B, parcor_order))
        )
        return residual.reshape(nb, nc, L)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, CHANNEL_AXIS, None), P(BLOCK_AXIS, CHANNEL_AXIS, None)),
        out_specs=P(BLOCK_AXIS, CHANNEL_AXIS, None),
    )(data, parcor_coef)


@functools.partial(jax.jit, static_argnames=("num_taps", "lms_order", "mesh"))
def sharded_encode_stage2(
    residual: jnp.ndarray,
    pitch: jnp.ndarray,
    ltm_coef: jnp.ndarray,
    num_taps: int,
    lms_order: int,
    mesh: Mesh,
):
    """Mesh-sharded long-term + LMS predict (second half of the cascade)."""
    _reject_assert_mode()

    def local(residual, pitch, ltm_coef):
        nb, nc, L = residual.shape
        B = nb * nc
        rows = residual.reshape(B, L)
        pit = pitch.reshape(B)

        vary = _vary

        if num_taps > 0:
            lt_res, _ = longterm_predict(
                rows, pit, ltm_coef.reshape(B, -1), num_taps, vary(jnp.zeros((B,), jnp.int32))
            )
            rows = jnp.where((pit > 0)[:, None], lt_res, rows)
        out, _ = lms_predict(rows, jax.tree.map(vary, lms_init_state(B, lms_order)), lms_order)
        return out.reshape(nb, nc, L)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
            P(BLOCK_AXIS, CHANNEL_AXIS),
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
        ),
        out_specs=P(BLOCK_AXIS, CHANNEL_AXIS, None),
    )(residual, pitch, ltm_coef)


@functools.partial(
    jax.jit,
    static_argnames=("parcor_order", "num_taps", "lms_order", "mesh", "lt_chunk"),
)
def sharded_decode_step(
    residual: jnp.ndarray,
    parcor_coef: jnp.ndarray,
    pitch: jnp.ndarray,
    ltm_coef: jnp.ndarray,
    parcor_order: int,
    num_taps: int,
    lms_order: int,
    mesh: Mesh,
    lt_chunk: int = 1,
):
    """Mesh-sharded synthesis: the decode mirror of sharded_encode_step.

    lt_chunk (static): samples per long-term scan step; the caller derives
    it from the batch's concrete pitches (pipeline._longterm_chunk).

    residual: (NB, NC, L) int32 sharded (blocks, channels). Returns PCM rows
    prior to the MS inverse / final left shift. Blocks decode with zero
    cross-shard communication — the format's reset-at-block-start invariant
    (SLADecoder.c:637-639) is what makes the whole stream embarrassingly
    block-parallel."""
    _reject_assert_mode()
    from ..kernels.lattice import lattice_init_state, lattice_synthesize
    from ..kernels.lms import lms_init_state, lms_synthesize
    from ..kernels.longterm import longterm_init_state, longterm_synthesize
    from ..kernels.emphasis import de_emphasis

    def local(residual, parcor_coef, pitch, ltm_coef):
        nb, nc, L = residual.shape
        B = nb * nc
        rows = residual.reshape(B, L)
        coefs = parcor_coef.reshape(B, -1)
        pit = pitch.reshape(B)
        ltm = ltm_coef.reshape(B, -1)

        vary = _vary

        out, _ = lms_synthesize(
            rows, jax.tree.map(vary, lms_init_state(B, lms_order)), lms_order
        )
        if num_taps > 0:
            lt_out, _ = longterm_synthesize(
                out, pit, ltm, num_taps,
                jax.tree.map(vary, longterm_init_state(B)), chunk=lt_chunk,
            )
            out = jnp.where((pit > 0)[:, None], lt_out, out)
        out, _ = lattice_synthesize(
            out, coefs, vary(lattice_init_state(B, parcor_order))
        )
        out, _ = de_emphasis(out, vary(jnp.zeros((B,), jnp.int32)))
        return out.reshape(nb, nc, L)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
            P(BLOCK_AXIS, CHANNEL_AXIS),
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
        ),
        out_specs=P(BLOCK_AXIS, CHANNEL_AXIS, None),
    )(residual, parcor_coef, pitch, ltm_coef)


def _mesh_use_pallas(mesh: Mesh) -> bool:
    """Gate for the Pallas shard_map bodies: TPU-class mesh devices only
    (the scan bodies remain the CPU/dryrun path; tests monkeypatch this
    with interpret-mode kernels). Honors SLA_TPU_NO_PALLAS."""
    import os

    if os.environ.get("SLA_TPU_NO_PALLAS"):
        return False
    return mesh.devices.flat[0].platform in ("tpu", "axon")


def mesh_window_plans(pitch_np, num_taps: int, mesh: Mesh, L: int):
    """Host-side per-shard window plans for the Pallas mesh bodies.

    pitch_np: (NB, NC) concrete host pitches laid out like the sharded
    batch. Each shard lag-sorts ITS OWN rows (no cross-shard resharding),
    so the plan arrays ride the same (blocks, channels) sharding as the
    batch: hi8s (ndb, ndc, ntiles) int32 per-tile window bases and order
    (NB, NC) int32 per-shard LOCAL sort orders. The window length and
    ring depth are static (the max over shards — a larger-than-needed
    window is safe: selected taps always index the row's true lag band,
    extra rows only cost align work). Returns None when any shard's lag
    band rejects the windowed kernel or no row is active (callers fall
    back to the scan bodies), else a dict of sharded-array + static
    kwargs for the *_pallas mesh steps."""
    from ..kernels.pallas_filters import (
        _WG, _WTILE_L, TILE_B, longterm_ring_depth,
    )
    from ..pipeline import _longterm_window_plan

    if num_taps <= 0:
        return None
    NB, NC = pitch_np.shape
    ndb, ndc = mesh.shape[BLOCK_AXIS], mesh.shape[CHANNEL_AXIS]
    if NB % ndb or NC % ndc:
        return None
    nb, nc = NB // ndb, NC // ndc
    B_loc = nb * nc
    md = np.where(pitch_np > 0, pitch_np.astype(np.int64) + num_taps // 2, 0)
    if not (md > 0).any():
        return None
    ring = longterm_ring_depth(int(md.max()))
    wt = _WG * TILE_B
    wide = (-(-B_loc // wt) * wt <= 2 * B_loc) and L % _WTILE_L == 0

    def plan_all(tile_rows):
        wins, his, orders = [], [], []
        for i in range(ndb):
            for j in range(ndc):
                loc = np.ascontiguousarray(
                    pitch_np[i * nb : (i + 1) * nb, j * nc : (j + 1) * nc]
                ).reshape(-1)
                win, hi8, order = _longterm_window_plan(
                    loc, num_taps, B_loc, tile_rows
                )
                if win == 0:
                    return None
                if order is None:
                    order = np.arange(B_loc, dtype=np.int32)
                wins.append(win)
                his.append(hi8)
                orders.append(order.reshape(nb, nc))
        ntiles = his[0].shape[0]
        hi8s = np.stack(his).reshape(ndb, ndc, ntiles).astype(np.int32)
        order = (
            np.stack(orders)
            .reshape(ndb, ndc, nb, nc)
            .transpose(0, 2, 1, 3)
            .reshape(NB, NC)
            .astype(np.int32)
        )
        return max(wins), hi8s, order

    for tile_rows, w in ((wt, True), (TILE_B, False)) if wide else ((TILE_B, False),):
        got = plan_all(tile_rows)
        if got is not None:
            lt_win, hi8s, order = got
            return {
                "lt_ring": ring,
                "lt_win": lt_win,
                "wide": w,
                "hi8s": hi8s,
                "order": order,
            }
    return None


@functools.partial(
    jax.jit,
    static_argnames=(
        "parcor_order", "num_taps", "lms_order", "mesh", "lt_ring", "lt_win",
        "wide",
    ),
)
def sharded_decode_step_pallas(
    residual: jnp.ndarray,
    parcor_coef: jnp.ndarray,
    pitch: jnp.ndarray,
    ltm_coef: jnp.ndarray,
    hi8s: jnp.ndarray,
    order: jnp.ndarray,
    parcor_order: int,
    num_taps: int,
    lms_order: int,
    mesh: Mesh,
    lt_ring: int,
    lt_win: int,
    wide: bool,
):
    """sharded_decode_step with the fused Pallas cascade per shard: every
    device runs the SAME single-kernel windowed (optionally wide
    sublane-batched) synthesis the one-chip path uses — lag sort, pad,
    kernel, unsort all LOCAL to the shard, zero cross-shard traffic.
    Plan arrays come from mesh_window_plans (host, concrete pitches).
    Bit-identical to the scan body."""
    _reject_assert_mode()
    from ..pipeline import _decode_stage_pallas

    def local(residual, parcor_coef, pitch, ltm_coef, hi8s, order):
        nb, nc, L = residual.shape
        B = nb * nc
        out = _decode_stage_pallas(
            residual.reshape(B, L),
            parcor_coef.reshape(B, -1),
            pitch.reshape(B),
            ltm_coef.reshape(B, -1),
            parcor_order,
            num_taps,
            lms_order,
            lt_ring=lt_ring,
            lt_win=lt_win,
            hi8s=hi8s.reshape(-1),
            order=order.reshape(B),
            wide=wide,
        )
        return out.reshape(nb, nc, L)

    return jax.shard_map(
        local,
        mesh=mesh,
        check_vma=False,  # pallas_call outputs carry no vma annotation

        in_specs=(
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
            P(BLOCK_AXIS, CHANNEL_AXIS),
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
            P(BLOCK_AXIS, CHANNEL_AXIS),
        ),
        out_specs=P(BLOCK_AXIS, CHANNEL_AXIS, None),
    )(residual, parcor_coef, pitch, ltm_coef, hi8s, order)


@functools.partial(jax.jit, static_argnames=("parcor_order", "mesh"))
def sharded_encode_stage1_pallas(
    data: jnp.ndarray, parcor_coef: jnp.ndarray, parcor_order: int, mesh: Mesh
):
    """sharded_encode_stage1 with the Pallas lattice kernel per shard
    (wide sublane-batched when the local row count admits it — shape-only
    eligibility, no plan needed). Bit-identical to the scan body."""
    _reject_assert_mode()
    from ..pipeline import _encode_stage1_pallas

    def local(data, parcor_coef):
        nb, nc, L = data.shape
        B = nb * nc
        out = _encode_stage1_pallas(
            data.reshape(B, L), parcor_coef.reshape(B, -1), parcor_order
        )
        return out.reshape(nb, nc, L)

    return jax.shard_map(
        local,
        mesh=mesh,
        check_vma=False,  # pallas_call outputs carry no vma annotation

        in_specs=(
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
        ),
        out_specs=P(BLOCK_AXIS, CHANNEL_AXIS, None),
    )(data, parcor_coef)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_taps", "lms_order", "mesh", "lt_ring", "lt_win", "wide",
    ),
)
def sharded_encode_stage2_pallas(
    residual: jnp.ndarray,
    pitch: jnp.ndarray,
    ltm_coef: jnp.ndarray,
    hi8s: jnp.ndarray,
    order: jnp.ndarray,
    num_taps: int,
    lms_order: int,
    mesh: Mesh,
    lt_ring: int,
    lt_win: int,
    wide: bool,
):
    """sharded_encode_stage2 with the merged windowed stage-2 Pallas
    kernel per shard (see sharded_decode_step_pallas for the plan-array
    contract). Bit-identical to the scan body."""
    _reject_assert_mode()
    from ..pipeline import _encode_stage2_pallas_win

    def local(residual, pitch, ltm_coef, hi8s, order):
        nb, nc, L = residual.shape
        B = nb * nc
        out = _encode_stage2_pallas_win(
            residual.reshape(B, L),
            pitch.reshape(B),
            ltm_coef.reshape(B, -1),
            num_taps,
            lms_order,
            lt_ring=lt_ring,
            lt_win=lt_win,
            hi8s=hi8s.reshape(-1),
            order=order.reshape(B),
            wide=wide,
        )
        return out.reshape(nb, nc, L)

    return jax.shard_map(
        local,
        mesh=mesh,
        check_vma=False,  # pallas_call outputs carry no vma annotation

        in_specs=(
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
            P(BLOCK_AXIS, CHANNEL_AXIS),
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
            P(BLOCK_AXIS, CHANNEL_AXIS, None),
            P(BLOCK_AXIS, CHANNEL_AXIS),
        ),
        out_specs=P(BLOCK_AXIS, CHANNEL_AXIS, None),
    )(residual, pitch, ltm_coef, hi8s, order)


def shard_batch(mesh: Mesh, *arrays):
    """Device-put each (NB, NC, ...) array with the mesh batch sharding."""
    out = []
    for a in arrays:
        spec = P(BLOCK_AXIS, CHANNEL_AXIS, *([None] * (a.ndim - 2)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)
