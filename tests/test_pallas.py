"""Pallas fused matmul+top-k kernel correctness (interpret mode — the
compiled kernel was validated on a real TPU v5e; see ops/pallas_topk.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from searchlite_tpu.ops.pallas_topk import C, QT, make_fused_topk


@pytest.mark.parametrize("seed", [3, 7])
def test_fused_topk_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    q, s, n = QT, 64, C * 2
    w = (rng.random((q, s)) * (rng.random((q, s)) < 0.3)).astype(np.float32)
    m = (rng.random((s, n)) * (rng.random((s, n)) < 0.2)).astype(np.float32)
    valid = np.ones(n, dtype=np.float32)
    valid[-37:] = 0.0
    fused = make_fused_topk(interpret=True)
    scores, ids = fused(jnp.asarray(w), jnp.asarray(m), jnp.asarray(valid),
                        k=10)
    oracle = w @ m
    oracle[:, valid == 0] = -np.inf
    oracle[oracle <= 0] = -np.inf
    order = np.argsort(-oracle, axis=1, kind="stable")[:, :10]
    np.testing.assert_allclose(
        np.asarray(scores), np.take_along_axis(oracle, order, 1),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids), order)


def test_fused_topk_handles_all_filtered():
    rng = np.random.default_rng(1)
    q, s, n = QT, 32, C
    w = rng.random((q, s)).astype(np.float32)
    m = rng.random((s, n)).astype(np.float32)
    valid = np.zeros(n, dtype=np.float32)
    fused = make_fused_topk(interpret=True)
    scores, _ids = fused(jnp.asarray(w), jnp.asarray(m),
                         jnp.asarray(valid), k=5)
    assert np.all(np.asarray(scores) == -np.inf)
