"""Hand-written Pallas TPU kernels for hot cost ops.

x265 analog: the per-kernel assembly in source/common/x86 — here the
hot cost primitives get explicit TPU kernels (VMEM-resident, MXU-shaped)
next to the jnp forms XLA autotiles. Kernels are drop-in bit-exact
replacements validated in interpreter mode (tests/test_pallas_kernels.py)
and benchmarked against their jnp twins by tools/kernel_bench.py (the
TestBench analog, reference test/TestBench.cpp:98-271).

Production use is opt-in via X265TPU_PALLAS=1 until each kernel's
on-device speedup is confirmed by the harness — the jnp forms are
already MXU einsums, so a Pallas win must come from fusion (diff ->
transform -> abs-sum in one VMEM round trip), not from the matmul.

SATD-8x8 formulation: the two-sided Hadamard  t = H8 @ D @ H8^T  is one
64x64 matmul in the Kronecker basis,  t_flat = (H8 (x) H8) @ d_flat —
so a [T,64] tile of difference blocks hits the MXU once, and abs-sum +
floor/4 ride the same VMEM residency. All intermediates are integers
below 2^24, exact in float32.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

try:                                   # Pallas needs a recent jaxlib
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:                      # pragma: no cover
    HAVE_PALLAS = False


def _h8() -> np.ndarray:
    """Sylvester Hadamard 8x8 (the +-1 butterfly matrix sa8d uses)."""
    h = np.array([[1]])
    for _ in range(3):
        h = np.block([[h, h], [h, -h]])
    return h.astype(np.int32)


# (H8 (x) H8)^T so that  d_flat [T,64] @ S  ==  (H8 D H8^T) flattened
_S64 = np.kron(_h8(), _h8()).T.astype(np.float32)

_TILE = 256        # diff blocks per grid step ([256,64] x [64,64] matmul)


def _satd8_kernel(d_ref, s_ref, out_ref):
    t = jnp.dot(d_ref[:], s_ref[:], preferred_element_type=jnp.float32)
    s = jnp.sum(jnp.abs(t), axis=1, keepdims=True)       # [T,1]
    out_ref[:] = jnp.broadcast_to(jnp.floor(s * 0.25), out_ref.shape)


@partial(jax.jit, static_argnames=("interpret",))
def satd8x8_pallas(a: jnp.ndarray, b: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """sa8d of [N,8,8] blocks -> [N] int32 (bit-exact vs
    engine.me.satd8_batched for S=8)."""
    if not HAVE_PALLAS:                # pragma: no cover
        raise RuntimeError("pallas unavailable")
    N = a.shape[0]
    d = (a.astype(jnp.int32) - b.astype(jnp.int32)).reshape(N, 64)
    npad = (-N) % _TILE
    d = jnp.pad(d, ((0, npad), (0, 0))).astype(jnp.float32)
    np_ = N + npad
    out = pl.pallas_call(
        _satd8_kernel,
        grid=(np_ // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, 64), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, 128), jnp.float32),
        interpret=interpret,
    )(d, jnp.asarray(_S64))
    return out[:N, 0].astype(jnp.int32)


def satd_pallas(a: jnp.ndarray, b: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """SATD over [N,S,S] blocks (S a multiple of 8) -> [N], matching
    engine.me.satd8_batched: per-8x8 sa8d sums."""
    N, S, _ = a.shape
    k = S // 8
    a8 = (a.reshape(N, k, 8, k, 8).transpose(0, 1, 3, 2, 4)
          .reshape(N * k * k, 8, 8))
    b8 = (b.reshape(N, k, 8, k, 8).transpose(0, 1, 3, 2, 4)
          .reshape(N * k * k, 8, 8))
    s = satd8x8_pallas(a8, b8, interpret=interpret)
    return s.reshape(N, k * k).sum(axis=1)


def _make_sad_kernel(n: int, S: int, H: int, W: int):
    """SAD of 8 displacements per grid step (the out block's sublane
    tile must be 8-divisible on real TPUs): the whole cur plane and the
    padded reference stay VMEM-resident across the sweep; each step
    slices its (dy, dx) windows and reduces per S-block — pure VPU work
    with zero HBM re-reads (the me._int_search inner loop, fused)."""
    nby, nbx = H // S, W // S
    total = n * n

    def kernel(cur_ref, ref_ref, out_ref):
        i = jnp.int32(pl.program_id(0))
        cur = cur_ref[:]
        for j in range(8):
            d = jnp.minimum(i * np.int32(8) + np.int32(j),
                            np.int32(total - 1))
            dy = d // np.int32(n)
            dx = jax.lax.rem(d, np.int32(n))
            win = ref_ref[pl.ds(dy, H), pl.ds(dx, W)]
            ad = jnp.abs(cur - win)
            sums = ad.reshape(nby, S, nbx, S).sum(axis=(1, 3))
            out_ref[j, :nby * nbx] = (sums.reshape(nby * nbx)
                                      .astype(jnp.float32))

    return kernel


@partial(jax.jit, static_argnames=("S", "R", "interpret"))
def sad_sweep_pallas(cur: jnp.ndarray, ref_pad: jnp.ndarray, S: int,
                     R: int, interpret: bool = False) -> jnp.ndarray:
    """Dense integer-search SAD field: cur [H,W], ref_pad [H+2R, W+2R]
    -> [(2R+1)^2, nby, nbx] float32 (matches the per-displacement SAD
    grid me._int_search folds its argmin over)."""
    if not HAVE_PALLAS:                # pragma: no cover
        raise RuntimeError("pallas unavailable")
    H, W = cur.shape
    n = 2 * R + 1
    nby, nbx = H // S, W // S
    nb = nby * nbx
    nb_pad = -(-nb // 128) * 128
    steps = -(-(n * n) // 8)
    out = pl.pallas_call(
        _make_sad_kernel(n, S, H, W),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((H, W), lambda d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, nb_pad), lambda d: (d, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * 8, nb_pad), jnp.float32),
        interpret=interpret,
    )(cur.astype(jnp.int32), ref_pad.astype(jnp.int32))
    return out[:n * n, :nb].reshape(n * n, nby, nbx)
