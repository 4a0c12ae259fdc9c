"""Runtime invariant checks (X265TPU_CHECKIFY; SURVEY §5.2 — the
sanitizer-build analog for the jitted compute graphs)."""
import numpy as np
import jax.numpy as jnp
import pytest


def test_checked_tq_chain_clean_matches_unchecked():
    from x265_tpu.models.residual import tq_chain
    from x265_tpu.utils.checks import checked_tq_chain

    rng = np.random.default_rng(3)
    resi = jnp.asarray(rng.integers(-200, 201, (8, 16, 16)).astype(np.int32))
    qp = jnp.full((8,), 30, jnp.int32)
    sel = jnp.zeros((8,), jnp.int32)
    a = tq_chain(resi, qp, sel, 16, False, False, 8, True, False, False)
    b = checked_tq_chain(resi, qp, sel, 16, False, False, 8, True,
                         False, False)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_checked_tq_chain_raises_on_bad_qp():
    from jax._src.checkify import JaxRuntimeError
    from x265_tpu.utils.checks import checked_tq_chain

    resi = jnp.zeros((4, 16, 16), jnp.int32)
    qp = jnp.full((4,), 99, jnp.int32)          # out of range
    sel = jnp.zeros((4,), jnp.int32)
    with pytest.raises(Exception, match="QP out of range"):
        checked_tq_chain(resi, qp, sel, 16, False, False, 8, True,
                         False, False)


def test_checkify_env_gate(monkeypatch):
    from x265_tpu.utils import checks
    monkeypatch.delenv("X265TPU_CHECKIFY", raising=False)
    assert not checks.enabled()
    monkeypatch.setenv("X265TPU_CHECKIFY", "1")
    assert checks.enabled()
