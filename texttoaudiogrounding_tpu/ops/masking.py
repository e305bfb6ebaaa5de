"""Length-masked pooling primitives over ragged time axes.

These are the TPU-native equivalents of the reference's masking utilities
(reference: models/utils.py:22-105).  All sequences are carried as
statically-shaped padded arrays plus an integer length vector; every pooling
is a masked reduction, which XLA fuses into the surrounding computation.

Semantics are kept bit-equivalent to the reference (so MIL gradients — in
particular the quotient gradient of linear-softmax pooling — match):

* ``linear_softmax_with_lens(x, lens) = sum(x^2) / sum(x)`` over valid frames
  (reference models/utils.py:75-76).
* ``exp_softmax_with_lens`` normalizes by the *unmasked* per-row max before
  the exp (reference models/utils.py:79-84 uses ``features.max(1)`` without a
  mask); the final weighted sum is masked.  We reproduce that exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def generate_length_mask(lens: jax.Array, max_length: int) -> jax.Array:
    """Boolean mask ``[N, max_length]``, True where index < length.

    Reference: models/utils.py:22-30.  ``max_length`` must be a static int
    (in the reference it defaults to ``max(lens)``; under XLA the padded
    time extent is always known statically, so we require it explicitly).
    """
    lens = jnp.asarray(lens)
    idxs = jnp.arange(max_length, dtype=lens.dtype)
    return idxs[None, :] < lens[:, None]


def _broadcast_mask(mask: jax.Array, ndim: int) -> jax.Array:
    """Append trailing singleton dims so mask broadcasts against features."""
    while mask.ndim < ndim:
        mask = mask[..., None]
    return mask


def sum_with_lens(features: jax.Array, lens: jax.Array) -> jax.Array:
    """Masked sum over axis 1.  features: [N, T, ...], lens: [N].

    Reference: models/utils.py:33-46.
    """
    mask = generate_length_mask(lens, features.shape[1])
    mask = _broadcast_mask(mask, features.ndim)
    return jnp.sum(features * mask.astype(features.dtype), axis=1)


def mean_with_lens(features: jax.Array, lens: jax.Array) -> jax.Array:
    """Masked mean over axis 1.  Reference: models/utils.py:49-58."""
    feature_sum = sum_with_lens(features, lens)
    lens = jnp.asarray(lens).astype(feature_sum.dtype)
    lens = _broadcast_mask(lens, feature_sum.ndim)
    return feature_sum / lens


def max_with_lens(features: jax.Array, lens: jax.Array) -> jax.Array:
    """Masked max over axis 1 (invalid frames treated as -inf).

    Reference: models/utils.py:61-72.
    """
    mask = generate_length_mask(lens, features.shape[1])
    mask = _broadcast_mask(mask, features.ndim)
    neg_inf = jnp.asarray(-jnp.inf, dtype=features.dtype)
    return jnp.max(jnp.where(mask, features, neg_inf), axis=1)


def linear_softmax_with_lens(features: jax.Array, lens: jax.Array) -> jax.Array:
    """MIL linear-softmax pooling: sum(x^2)/sum(x) over valid frames.

    Reference: models/utils.py:75-76.  The quotient VJP is what gives WSTAG
    its attention-like gradient; verified against torch autograd in tests.
    """
    return sum_with_lens(features**2, lens) / sum_with_lens(features, lens)


def exp_softmax_with_lens(features: jax.Array, lens: jax.Array) -> jax.Array:
    """MIL exp-softmax pooling.

    Reference: models/utils.py:79-84.  NOTE: the max-normalization there is
    over the full (padded) axis; we replicate that for bit-parity.
    """
    normed = features - jnp.max(features, axis=1, keepdims=True)
    exp_f = jnp.exp(normed)
    weight = exp_f / sum_with_lens(exp_f, lens)[:, None]
    return sum_with_lens(weight * features, lens)


def mean_by_group(arr: jax.Array, group_ids: jax.Array, num_groups: int,
                  group_sizes: jax.Array) -> jax.Array:
    """Segment mean: average rows of ``arr`` that share a group id.

    TPU-native reformulation of reference models/utils.py:87-105 (which takes
    per-group counts and builds a scatter index host-side).  Here the caller
    passes precomputed ``group_ids [total]`` and ``group_sizes [num_groups]``
    so the op is a single ``segment_sum`` — static-shape friendly.
    """
    summed = jax.ops.segment_sum(arr, group_ids, num_segments=num_groups)
    denom = jnp.asarray(group_sizes).astype(summed.dtype)
    denom = _broadcast_mask(denom, summed.ndim)
    return summed / denom


def masked_softmax(scores: jax.Array, mask: jax.Array,
                   axis: int = -1) -> jax.Array:
    """Softmax with invalid positions forced to ~0 weight (fill -1e10).

    Matches the reference's attention-pooling masking idiom
    (models/text_encoder.py:51-58).
    """
    scores = jnp.where(mask, scores, jnp.asarray(-1e10, scores.dtype))
    return jax.nn.softmax(scores, axis=axis)
