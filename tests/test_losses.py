"""CTC / RNN-T losses vs. brute-force lattice DP oracles (numpy + torch autograd
for gradients). torch is used strictly as a test oracle, never in the framework.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from efficientconformer_tpu.ops.ctc_loss import ctc_loss
from efficientconformer_tpu.ops.rnnt_loss import rnnt_loss


def np_ctc_forward(log_probs, labels, t_len, u_len):
    """Plain O(T*S) alpha recursion, one sample."""
    ext = [0]
    for c in labels[:u_len]:
        ext += [int(c), 0]
    s = len(ext)
    NEG = -1e30
    alpha = np.full(s, NEG)
    alpha[0] = log_probs[0, 0]
    if s > 1:
        alpha[1] = log_probs[0, ext[1]]
    for t in range(1, t_len):
        new = np.full(s, NEG)
        for i in range(s):
            acc = alpha[i]
            if i >= 1:
                acc = np.logaddexp(acc, alpha[i - 1])
            if i >= 2 and ext[i] != 0 and ext[i] != ext[i - 2]:
                acc = np.logaddexp(acc, alpha[i - 2])
            new[i] = acc + log_probs[t, ext[i]]
        alpha = new
    out = alpha[s - 1]
    if s > 1:
        out = np.logaddexp(out, alpha[s - 2])
    return -out


def np_rnnt_forward(log_probs, labels, t_len, u_len):
    """Plain O(T*U) alpha recursion, one sample. log_probs (T, U+1, V)."""
    NEG = -1e30
    alpha = np.full((t_len, u_len + 1), NEG)
    alpha[0, 0] = 0.0
    for t in range(t_len):
        for u in range(u_len + 1):
            acc = alpha[t, u] if (t == 0 and u == 0) else NEG
            if t > 0:
                acc = np.logaddexp(acc, alpha[t - 1, u] + log_probs[t - 1, u, 0])
            if u > 0:
                acc = np.logaddexp(acc, alpha[t, u - 1] + log_probs[t, u - 1, labels[u - 1]])
            if not (t == 0 and u == 0):
                alpha[t, u] = acc
    return -(alpha[t_len - 1, u_len] + log_probs[t_len - 1, u_len, 0])


def test_ctc_matches_bruteforce():
    rng = np.random.default_rng(0)
    b, t, v, u = 3, 11, 7, 4
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.array(logits), axis=-1)
    labels = np.array([[1, 2, 2, 3], [4, 5, 0, 0], [6, 6, 6, 0]])
    f_len = np.array([11, 8, 9])
    y_len = np.array([4, 2, 3])
    got = np.asarray(ctc_loss(lp, jnp.array(labels), jnp.array(f_len), jnp.array(y_len)))
    for i in range(b):
        want = np_ctc_forward(np.asarray(lp)[i], labels[i], f_len[i], y_len[i])
        np.testing.assert_allclose(got[i], want, rtol=1e-5)


def test_ctc_matches_torch():
    rng = np.random.default_rng(1)
    b, t, v, u = 2, 9, 6, 3
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = np.array([[1, 2, 3], [4, 4, 0]])
    f_len = np.array([9, 7])
    y_len = np.array([3, 2])
    lp = jax.nn.log_softmax(jnp.array(logits), axis=-1)
    got = np.asarray(ctc_loss(lp, jnp.array(labels), jnp.array(f_len), jnp.array(y_len)))
    tl = torch.nn.functional.ctc_loss(
        torch.log_softmax(torch.tensor(logits), -1).transpose(0, 1),
        torch.tensor(labels),
        torch.tensor(f_len),
        torch.tensor(y_len),
        blank=0,
        reduction="none",
    )
    np.testing.assert_allclose(got, tl.numpy(), rtol=1e-4)


def test_rnnt_matches_bruteforce():
    rng = np.random.default_rng(2)
    b, t, u, v = 3, 6, 4, 8
    logits = rng.standard_normal((b, t, u + 1, v)).astype(np.float32)
    labels = np.array([[1, 2, 3, 4], [5, 6, 0, 0], [7, 1, 2, 0]])
    f_len = np.array([6, 4, 5])
    y_len = np.array([4, 2, 3])
    got = np.asarray(
        rnnt_loss(jnp.array(logits), jnp.array(labels), jnp.array(f_len), jnp.array(y_len))
    )
    lp = np.asarray(jax.nn.log_softmax(jnp.array(logits), axis=-1))
    for i in range(b):
        want = np_rnnt_forward(lp[i], labels[i], f_len[i], y_len[i])
        np.testing.assert_allclose(got[i], want, rtol=1e-5)


def test_rnnt_gradient_matches_torch_autograd():
    """Gradients via a straightforward torch DP (autograd oracle)."""
    rng = np.random.default_rng(3)
    t, u, v = 4, 3, 5
    logits = rng.standard_normal((1, t, u + 1, v)).astype(np.float32)
    labels = np.array([[1, 2, 3]])
    f_len = np.array([t])
    y_len = np.array([3])

    grad = jax.grad(
        lambda lg: rnnt_loss(lg, jnp.array(labels), jnp.array(f_len), jnp.array(y_len)).sum()
    )(jnp.array(logits))

    tlogits = torch.tensor(logits, requires_grad=True)
    lp = torch.log_softmax(tlogits, -1)[0]
    NEG = torch.tensor(-1e30)
    alpha = {}
    alpha[(0, 0)] = torch.tensor(0.0)
    for tt in range(t):
        for uu in range(y_len[0] + 1):
            if tt == 0 and uu == 0:
                continue
            acc = NEG
            if tt > 0:
                acc = torch.logaddexp(acc, alpha[(tt - 1, uu)] + lp[tt - 1, uu, 0])
            if uu > 0:
                acc = torch.logaddexp(
                    acc, alpha[(tt, uu - 1)] + lp[tt, uu - 1, labels[0][uu - 1]]
                )
            alpha[(tt, uu)] = acc
    loss = -(alpha[(t - 1, y_len[0])] + lp[t - 1, y_len[0], 0])
    loss.backward()
    np.testing.assert_allclose(
        np.asarray(grad), tlogits.grad.numpy(), atol=1e-4
    )
