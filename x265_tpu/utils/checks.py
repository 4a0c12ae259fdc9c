"""Runtime invariant checking for the device compute paths.

The x265 analog of building with sanitizers for the regression farm
(SURVEY §5.2): jax.experimental.checkify instruments the jitted graphs
with value assertions that survive compilation, so a quantizer overflow
or an out-of-range QP inside a fused dispatch fails LOUDLY with a
message instead of silently corrupting the bitstream downstream.

Off by default (the checks cost a second traced graph); enable with
    X265TPU_CHECKIFY=1
for debug runs and CI canaries.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def enabled() -> bool:
    return os.environ.get("X265TPU_CHECKIFY") == "1"


@partial(jax.jit, static_argnames=("n", "dst", "is_intra", "bd", "sdh",
                                  "do_rdoq", "lossless", "scaling"))
def _checked_tq(resi, qp, scan_sel, n, dst, is_intra, bd, sdh, do_rdoq,
                lossless, scaling, consts=None):
    from x265_tpu.models.residual import _tq_chain

    def run(resi, qp, scan_sel):
        checkify.check(jnp.all((qp >= 0) & (qp <= 51 + 6 * (bd - 8))),
                       "tq_chain: QP out of range")
        checkify.check(
            jnp.all(jnp.abs(resi) < (1 << bd)),
            "tq_chain: residual exceeds the bit-depth dynamic range")
        lvl, rres, cbf = _tq_chain(resi, qp, scan_sel, n, dst, is_intra,
                                   bd, sdh, do_rdoq, lossless, scaling,
                                   consts)
        checkify.check(jnp.all(jnp.abs(lvl) <= 32767),
                       "tq_chain: coefficient level overflow")
        checkify.check(jnp.all(jnp.abs(rres) <= 32767),
                       "tq_chain: reconstruction residual overflow")
        return lvl, rres, cbf

    err, out = checkify.checkify(run)(resi, qp, scan_sel)
    return err, out


def checked_tq_chain(resi, qp, scan_sel, n, dst, is_intra, bd, sdh,
                     do_rdoq, lossless, scaling=False, consts=None):
    """tq_chain with checkify assertions; raises on violated invariants."""
    from jax import enable_x64
    with enable_x64():
        err, out = _checked_tq(resi, qp, scan_sel, n, dst, is_intra, bd,
                               sdh, do_rdoq, lossless, scaling, consts)
    err.throw()
    return out
