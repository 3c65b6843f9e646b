"""rel_to_abs skewing vs. naive index arithmetic.

For queries at absolute positions Th..Th+T-1 over keys 0..Th+T-1, the relative
offset of key j from query i is (i + Th) - j; the rel-indexed score row stores
offsets most-distant-past-first. Each skewing variant must therefore satisfy
abs[i, j] == rel[i, T - 1 - i + j] (suitably strided/blocked).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from efficientconformer_tpu.ops import attention as A


def rng(*shape):
    return np.random.default_rng(sum(shape) + 7).standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("t,th", [(5, 0), (8, 0), (4, 6), (1, 3)])
def test_full(t, th):
    scores = rng(2, 3, t, th + 2 * t - 1)
    out = np.asarray(A.rel_to_abs_full(jnp.array(scores)))
    assert out.shape == (2, 3, t, th + t)
    for i in range(t):
        for j in range(th + t):
            np.testing.assert_allclose(out[:, :, i, j], scores[:, :, i, t - 1 - i + j])


@pytest.mark.parametrize("t,th", [(5, 0), (8, 0), (4, 6), (1, 3)])
def test_causal(t, th):
    scores = rng(2, 3, t, th + t)
    out = np.asarray(A.rel_to_abs_causal(jnp.array(scores)))
    assert out.shape == (2, 3, t, th + t)
    for i in range(t):
        for j in range(th + t):
            if j <= i + th:  # past/self positions only; future is masked later
                np.testing.assert_allclose(
                    out[:, :, i, j], scores[:, :, i, t - 1 - i + j]
                )


@pytest.mark.parametrize("tq,s,th", [(4, 2, 0), (3, 3, 0), (5, 2, 4)])
def test_strided_full(tq, s, th):
    t = tq * s
    scores = rng(2, 2, tq, th + 2 * t - 1)
    out = np.asarray(A.rel_to_abs_strided_full(jnp.array(scores), s))
    assert out.shape == (2, 2, tq, th + t)
    for q in range(tq):
        for j in range(th + t):
            np.testing.assert_allclose(
                out[:, :, q, j], scores[:, :, q, t - 1 - q * s + j]
            )


@pytest.mark.parametrize("tq,s,th", [(4, 2, 0), (3, 3, 0), (5, 2, 4)])
def test_strided_causal(tq, s, th):
    t = tq * s
    scores = rng(2, 2, tq, th + t)
    out = np.asarray(A.rel_to_abs_strided_causal(jnp.array(scores), s))
    assert out.shape == (2, 2, tq, th + t)
    for q in range(tq):
        for j in range(th + t):
            if j <= q * s + th:
                np.testing.assert_allclose(
                    out[:, :, q, j], scores[:, :, q, t - 1 - q * s + j]
                )


@pytest.mark.parametrize("n,k", [(2, 4), (3, 5), (1, 3)])
def test_local_full(n, k):
    t = n * k
    scores = rng(2, 3, t, 2 * k - 1)
    out = np.asarray(A.rel_to_abs_local_full(jnp.array(scores), k))
    assert out.shape == (2, n, 3, k, k)
    for b in range(n):
        for i in range(k):
            for j in range(k):
                np.testing.assert_allclose(
                    out[:, b, :, i, j], scores[:, :, b * k + i, k - 1 - i + j]
                )


@pytest.mark.parametrize("n,k", [(2, 4), (3, 5), (1, 3)])
def test_local_causal(n, k):
    t = n * k
    scores = rng(2, 3, t, k)
    out = np.asarray(A.rel_to_abs_local_causal(jnp.array(scores), k))
    assert out.shape == (2, n, 3, k, k)
    for b in range(n):
        for i in range(k):
            for j in range(i + 1):
                np.testing.assert_allclose(
                    out[:, b, :, i, j], scores[:, :, b * k + i, k - 1 - i + j]
                )


@pytest.mark.parametrize("n,k,s", [(2, 4, 2), (2, 6, 3), (3, 4, 4)])
def test_strided_local_full(n, k, s):
    kq = k // s
    tq = n * kq
    scores = rng(2, 2, tq, 2 * k - 1)
    out = np.asarray(A.rel_to_abs_strided_local_full(jnp.array(scores), k, s))
    assert out.shape == (2, n, 2, kq, k)
    for b in range(n):
        for q in range(kq):
            for j in range(k):
                np.testing.assert_allclose(
                    out[:, b, :, q, j], scores[:, :, b * kq + q, k - 1 - q * s + j]
                )


@pytest.mark.parametrize("n,k,s", [(2, 4, 2), (2, 6, 3), (3, 4, 4)])
def test_strided_local_causal(n, k, s):
    kq = k // s
    tq = n * kq
    scores = rng(2, 2, tq, k)
    out = np.asarray(A.rel_to_abs_strided_local_causal(jnp.array(scores), k, s))
    assert out.shape == (2, n, 2, kq, k)
    for b in range(n):
        for q in range(kq):
            for j in range(q * s + 1):
                np.testing.assert_allclose(
                    out[:, b, :, q, j], scores[:, :, b * kq + q, k - 1 - q * s + j]
                )
