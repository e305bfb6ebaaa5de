"""Masked pooling primitives vs hand values and torch (CPU) reference
semantics (reference: models/utils.py:22-105)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from texttoaudiogrounding_tpu.ops import (
    exp_softmax_with_lens,
    generate_length_mask,
    linear_softmax_with_lens,
    max_with_lens,
    mean_by_group,
    mean_with_lens,
    sum_with_lens,
)


def torch_sum_with_lens(features, lens):
    mask = (torch.arange(features.shape[1])[None, :]
            < torch.as_tensor(lens)[:, None])
    while mask.ndim < features.ndim:
        mask = mask.unsqueeze(-1)
    return (features * mask).sum(1)


def test_length_mask_hand():
    mask = generate_length_mask(jnp.array([2, 0, 3]), 3)
    np.testing.assert_array_equal(
        np.asarray(mask),
        [[True, True, False], [False, False, False], [True, True, True]])


@pytest.mark.parametrize("shape", [(4, 7), (4, 7, 5)])
def test_sum_mean_max_parity(rng, shape):
    x = rng.normal(size=shape).astype(np.float32)
    lens = np.array([7, 3, 1, 5])
    tx = torch.tensor(x)
    tsum = torch_sum_with_lens(tx, lens)
    np.testing.assert_allclose(np.asarray(sum_with_lens(jnp.array(x), lens)),
                               tsum.numpy(), rtol=1e-6, atol=1e-6)
    tlens = torch.as_tensor(lens).float()
    while tlens.ndim < tsum.ndim:
        tlens = tlens.unsqueeze(-1)
    np.testing.assert_allclose(np.asarray(mean_with_lens(jnp.array(x), lens)),
                               (tsum / tlens).numpy(), rtol=1e-6, atol=1e-6)
    # max: fill invalid with -inf
    tmax = tx.clone()
    mask = (torch.arange(shape[1])[None, :] < torch.as_tensor(lens)[:, None])
    while mask.ndim < tmax.ndim:
        mask = mask.unsqueeze(-1)
    tmax = tmax.masked_fill(~mask.expand_as(tmax), float("-inf")).max(1).values
    np.testing.assert_allclose(np.asarray(max_with_lens(jnp.array(x), lens)),
                               tmax.numpy(), rtol=1e-6, atol=1e-6)


def test_linear_softmax_value_and_grad(rng):
    """linear_softmax = sum(x^2)/sum(x); its quotient VJP must match torch
    autograd (the MIL gradient of WSTAG, reference models/utils.py:75-76)."""
    x = rng.uniform(0.05, 0.95, size=(3, 6)).astype(np.float32)
    lens = np.array([6, 2, 4])

    tx = torch.tensor(x, requires_grad=True)
    t_out = (torch_sum_with_lens(tx**2, lens)
             / torch_sum_with_lens(tx, lens))
    t_out.sum().backward()

    fn = lambda a: jnp.sum(linear_softmax_with_lens(a, jnp.array(lens)))
    j_val = linear_softmax_with_lens(jnp.array(x), jnp.array(lens))
    j_grad = jax.grad(fn)(jnp.array(x))

    np.testing.assert_allclose(np.asarray(j_val), t_out.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(j_grad), tx.grad.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_exp_softmax_parity(rng):
    """exp_softmax normalizes by the unmasked max (reference
    models/utils.py:79-84) — replicate exactly."""
    x = rng.normal(size=(3, 5)).astype(np.float32)
    lens = np.array([5, 2, 3])
    tx = torch.tensor(x)
    normed = tx - tx.max(1, keepdim=True).values
    exp_f = torch.exp(normed)
    weight = exp_f / torch_sum_with_lens(exp_f, lens).unsqueeze(1)
    expected = torch_sum_with_lens(weight * tx, lens)
    got = exp_softmax_with_lens(jnp.array(x), jnp.array(lens))
    np.testing.assert_allclose(np.asarray(got), expected.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_mean_by_group():
    arr = jnp.array([[1.0], [3.0], [10.0], [20.0], [30.0]])
    group_ids = jnp.array([0, 0, 1, 1, 1])
    out = mean_by_group(arr, group_ids, 2, jnp.array([2, 3]))
    np.testing.assert_allclose(np.asarray(out), [[2.0], [20.0]])
