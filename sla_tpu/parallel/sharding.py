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


def shard_batch(mesh: Mesh, *arrays):
    """Device-put each (NB, NC, ...) array with the mesh batch sharding."""
    out = []
    for a in arrays:
        spec = P(BLOCK_AXIS, CHANNEL_AXIS, *([None] * (a.ndim - 2)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)
