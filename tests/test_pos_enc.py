"""Positional encoding windows vs. an independently-written table oracle."""

import numpy as np
import pytest

from efficientconformer_tpu.ops import pos_enc as P


def sinusoid_np(pos, dim):
    i = np.arange(dim // 2, dtype=np.float64)
    ang = np.asarray(pos, np.float64)[:, None] / 10000.0 ** (2 * i[None] / dim)
    pe = np.zeros((len(pos), dim))
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return pe


def reference_rel_table(max_len, dim, group_size=1):
    """Table of 2*max_len - G%2 positions, left (past) half then right half."""
    g = group_size
    pos = np.concatenate(
        [np.arange(max_len - 1, g % 2 - 1, -1), np.arange(0, -max_len, -1)]
    )
    return pos, sinusoid_np(pos, dim)


@pytest.mark.parametrize("t", [1, 5, 16])
def test_absolute(t):
    got = np.asarray(P.absolute_encoding(t, 8))
    np.testing.assert_allclose(got, sinusoid_np(np.arange(t), 8), atol=1e-5)


@pytest.mark.parametrize("t,h,causal", [(6, 0, False), (6, 0, True), (4, 5, False), (4, 5, True)])
def test_relative(t, h, causal):
    max_len = 32
    pos, table = reference_rel_table(max_len, 8)
    if causal:
        want = table[max_len - t - h : max_len]
    else:
        want = table[max_len - t - h : max_len - 1 + t]
    got = np.asarray(P.relative_encoding(t, 8, hidden_len=h, causal=causal))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize(
    "t,g,h,causal",
    [(6, 3, 0, False), (6, 3, 0, True), (9, 3, 3, False), (8, 2, 0, False), (8, 4, 0, False), (6, 1, 0, False)],
)
def test_grouped_relative(t, g, h, causal):
    max_len = 32
    pos, table = reference_rel_table(max_len, 8, g)
    if causal:
        want = table[max_len - t - h : max_len]
    else:
        want = table[max_len - t + g // 2 - h : max_len - g % 2 + t - g // 2]
    got = np.asarray(P.grouped_relative_encoding(t, 8, g, hidden_len=h, causal=causal))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=1e-5)
