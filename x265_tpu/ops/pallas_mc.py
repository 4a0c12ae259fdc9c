"""Pallas TPU kernels for per-CU window gathering (the MC hot path).

XLA lowers a vmapped `dynamic_slice` over CU lanes to a serial gather
(~200M elem/s measured on this chip) — at 1080p that is >100 ms per
plane sweep and dominates the inter residual/adopt graphs (x265 analog:
the MC interp SIMD family, source/common/predict.cpp:87
motionCompensation + the ipfilter primitives).

These kernels fetch each lane's window with a tiling-ALIGNED strided
DMA (Mosaic requires 8-sublane/128-lane aligned offsets), then undo the
alignment in VMEM with two `pltpu.roll`s per lane, and fuse the 8/4-tap
separable interpolation. Lanes are processed LANES at a grid step with
double-buffered DMAs.

Bit-exactness: integer taps + arithmetic shifts identical to
models.inter_residual._mc_gather (differential-tested on device in
tests/test_pallas_tpu.py). CPU/mesh paths keep the jnp twin.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 8          # CU lanes per grid step
COLS = 256         # aligned DMA cols (dx <= 127 + side <= 128)


def _rows_for(side: int) -> int:
    # aligned DMA rows: dy <= 7 after 8-alignment, window side more
    return -(-(side + 7) // 8) * 8


def _win(scratch, slot, l, oy, ox, j, Hp, Wp, side, ROWS):
    """Extract the [side, side] window whose absolute origin is
    (oy[j], ox[j]) from the aligned [ROWS, COLS] DMA tile, via two
    circular rolls + a static slice."""
    # (x >> k) << k is the alignment form Mosaic's divisibility prover
    # accepts; Hp/Wp are tile-aligned so the min keeps alignment
    # multiplication is the alignment form Mosaic's divisibility
    # prover pattern-matches ((x>>k)<<k is not)
    ay = (jnp.minimum(oy[j], np.int32(Hp - ROWS)) >> 3) * np.int32(8)
    ax = (jnp.minimum(ox[j], np.int32(Wp - COLS)) >> 7) * np.int32(128)
    dy = oy[j] - ay
    dx = ox[j] - ax
    # Mosaic's rotate is 32-bit only: upcast before the rolls
    t = scratch[slot, np.int32(l)].astype(jnp.int32)  # [ROWS, COLS]
    t = pltpu.roll(t, jax.lax.rem(np.int32(ROWS) - dy, np.int32(ROWS)),
                   axis=0)
    t = pltpu.roll(t, jax.lax.rem(np.int32(COLS) - dx, np.int32(COLS)),
                   axis=1)
    return t[:side, :side]


def _dma_starts(planes, scratch, sem, ridx, oy, ox, slot, step, Hp, Wp, ROWS):
    base = step * LANES
    copies = []
    for l in range(LANES):
        j = base + l
        ay = (jnp.minimum(oy[j], np.int32(Hp - ROWS)) >> 3) * np.int32(8)
        ax = (jnp.minimum(ox[j], np.int32(Wp - COLS)) >> 7) * np.int32(128)
        copies.append(pltpu.make_async_copy(
            planes.at[ridx[j], pl.ds(ay, ROWS), pl.ds(ax, COLS)],
            scratch.at[slot, np.int32(l)],
            sem.at[slot, np.int32(l)]))
    return copies


def _mc_kernel(ridx, oy, ox, xf, yf, planes, filt, out,
               scratch, sem, *, n, taps, side, bd, Hp, Wp, ROWS):
    # np.int32 scalars everywhere: these kernels are traced from
    # enable_x64 callers too, where python ints weak-promote to i64
    i = jnp.int32(pl.program_id(0))
    nsteps = jnp.int32(pl.num_programs(0))

    @pl.when(i == 0)
    def _():
        for c in _dma_starts(planes, scratch, sem, ridx, oy, ox,
                             np.int32(0), np.int32(0), Hp, Wp, ROWS):
            c.start()

    slot = jax.lax.rem(i, np.int32(2))
    nxt = jax.lax.rem(i + np.int32(1), np.int32(2))

    @pl.when(i + np.int32(1) < nsteps)
    def _():
        for c in _dma_starts(planes, scratch, sem, ridx, oy, ox,
                             nxt, i + np.int32(1), Hp, Wp, ROWS):
            c.start()

    for c in _dma_starts(planes, scratch, sem, ridx, oy, ox,
                         slot, i, Hp, Wp, ROWS):
        c.wait()

    base = i * LANES
    wins = jnp.stack([
        _win(scratch, slot, l, oy, ox, base + l, Hp, Wp, side,
             ROWS)
        for l in range(LANES)])                       # [LANES, side, side]
    # per-lane tap rows from the phase indices (SMEM loads are scalar)
    fx = jnp.stack([filt[xf[base + l]] for l in range(LANES)])
    fy = jnp.stack([filt[yf[base + l]] for l in range(LANES)])
    # horizontal: hor[l, r, c] = sum_t fx[l,t] * win[l, r, c+t]
    hor = jnp.zeros((LANES, side, n), jnp.int32)
    for t in range(taps):
        hor = hor + fx[:, t][:, None, None] * wins[:, :, t:t + n]
    if bd > 8:
        hor = jax.lax.shift_right_arithmetic(hor, np.int32(bd - 8))
    # vertical: out[l, r, c] = (sum_t fy[l,t] * hor[l, r+t, c]) >> 6
    acc = jnp.zeros((LANES, n, n), jnp.int32)
    for t in range(taps):
        acc = acc + fy[:, t][:, None, None] * hor[:, t:t + n, :]
    out[:] = jax.lax.shift_right_arithmetic(acc, np.int32(6))


@partial(jax.jit, static_argnames=("n", "taps", "bd"))
def mc_gather_interp(planes, ridx, oy, ox, xf, yf, filt,
                     n: int, taps: int, bd: int):
    """14-bit MC prediction [N, n, n] i32 for N CU lanes.

    planes [R, Hp, Wp] int16 (padded refs; Hp >= ROWS, Wp >= COLS);
    ridx/oy/ox [N] int32 ABSOLUTE window origins, pre-clamped to
    [0, dim - side] (dynamic_slice clamp semantics); xf/yf [N] int32
    fractional phases; filt [P, taps] int32. N % LANES == 0 (callers
    pad with origin-0 lanes)."""
    N = ridx.shape[0]
    side = n + taps - 1
    ROWS = _rows_for(side)
    assert side <= COLS - 128
    R, Hp, Wp = planes.shape
    # tile-aligned plane dims keep min(origin, dim-window) aligned
    assert Hp >= ROWS and Wp >= COLS and Hp % 8 == 0 and Wp % 128 == 0
    grid = N // LANES

    kern = partial(_mc_kernel, n=n, taps=taps, side=side, bd=bd,
                   Hp=Hp, Wp=Wp, ROWS=ROWS)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,       # ridx, oy, ox, xf, yf
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),     # planes
                pl.BlockSpec(memory_space=pltpu.VMEM),    # filt
            ],
            out_specs=pl.BlockSpec((LANES, n, n),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, LANES, ROWS, COLS), jnp.int16),
                pltpu.SemaphoreType.DMA((2, LANES)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N, n, n), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ridx, oy, ox, xf, yf, planes, filt)


def _copy_kernel(oy, ox, plane, out, scratch, sem, *, n, Hp, Wp,
                 ROWS):
    i = jnp.int32(pl.program_id(0))
    nsteps = jnp.int32(pl.num_programs(0))

    def dmas(slot, step):
        base = step * LANES
        copies = []
        for l in range(LANES):
            j = base + l
            ay = ((jnp.minimum(oy[j], np.int32(Hp - ROWS)) >> 3)
                  * np.int32(8))
            ax = ((jnp.minimum(ox[j], np.int32(Wp - COLS)) >> 7)
                  * np.int32(128))
            copies.append(pltpu.make_async_copy(
                plane.at[pl.ds(ay, ROWS), pl.ds(ax, COLS)],
                scratch.at[slot, np.int32(l)],
                sem.at[slot, np.int32(l)]))
        return copies

    @pl.when(i == 0)
    def _():
        for c in dmas(np.int32(0), np.int32(0)):
            c.start()

    slot = jax.lax.rem(i, np.int32(2))
    nxt = jax.lax.rem(i + np.int32(1), np.int32(2))

    @pl.when(i + np.int32(1) < nsteps)
    def _():
        for c in dmas(nxt, i + np.int32(1)):
            c.start()

    for c in dmas(slot, i):
        c.wait()
    base = i * LANES
    out[:] = jnp.stack([
        _win(scratch, slot, l, oy, ox, base + l, Hp, Wp, n, ROWS)
        for l in range(LANES)])


@partial(jax.jit, static_argnames=("n",))
def tile_gather(plane, oy, ox, n: int):
    """Plain [N, n, n] i32 tile gather from one int16 plane (the
    block_src analog). oy/ox [N] int32, pre-clamped; N % LANES == 0."""
    N = oy.shape[0]
    ROWS = _rows_for(n)
    assert n <= COLS - 128
    Hp, Wp = plane.shape
    assert Hp >= ROWS and Wp >= COLS and Hp % 8 == 0 and Wp % 128 == 0
    kern = partial(_copy_kernel, n=n, Hp=Hp, Wp=Wp, ROWS=ROWS)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(N // LANES,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((LANES, n, n),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, LANES, ROWS, COLS), jnp.int16),
                pltpu.SemaphoreType.DMA((2, LANES)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N, n, n), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(oy, ox, plane)


def _copy3_kernel(ridx, oy, ox, planes, out, scratch, sem, *, n, Hp, Wp,
                  ROWS):
    i = jnp.int32(pl.program_id(0))
    nsteps = jnp.int32(pl.num_programs(0))

    def dmas(slot, step):
        base = step * LANES
        copies = []
        for l in range(LANES):
            j = base + l
            ay = ((jnp.minimum(oy[j], np.int32(Hp - ROWS)) >> 3)
                  * np.int32(8))
            ax = ((jnp.minimum(ox[j], np.int32(Wp - COLS)) >> 7)
                  * np.int32(128))
            copies.append(pltpu.make_async_copy(
                planes.at[ridx[j], pl.ds(ay, ROWS), pl.ds(ax, COLS)],
                scratch.at[slot, np.int32(l)],
                sem.at[slot, np.int32(l)]))
        return copies

    @pl.when(i == 0)
    def _():
        for c in dmas(np.int32(0), np.int32(0)):
            c.start()

    slot = jax.lax.rem(i, np.int32(2))
    nxt = jax.lax.rem(i + np.int32(1), np.int32(2))

    @pl.when(i + np.int32(1) < nsteps)
    def _():
        for c in dmas(nxt, i + np.int32(1)):
            c.start()

    for c in dmas(slot, i):
        c.wait()
    base = i * LANES
    out[:] = jnp.stack([
        _win(scratch, slot, l, oy, ox, base + l, Hp, Wp, n, ROWS)
        for l in range(LANES)])


@partial(jax.jit, static_argnames=("n",))
def tile_gather_planes(planes, ridx, oy, ox, n: int):
    """[N, n, n] i32 tile gather from STACKED int16 planes, one plane
    index per lane (the phase-plane subpel fetch of engine.me).
    ridx/oy/ox [N] int32, origins pre-clamped; N % LANES == 0."""
    N = oy.shape[0]
    ROWS = _rows_for(n)
    assert n <= COLS - 128
    P, Hp, Wp = planes.shape
    assert Hp >= ROWS and Wp >= COLS and Hp % 8 == 0 and Wp % 128 == 0
    kern = partial(_copy3_kernel, n=n, Hp=Hp, Wp=Wp, ROWS=ROWS)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(N // LANES,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((LANES, n, n),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, LANES, ROWS, COLS), jnp.int16),
                pltpu.SemaphoreType.DMA((2, LANES)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N, n, n), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ridx, oy, ox, planes)
