"""Loss functions consuming the model output dict.

Ports of all 18 reference loss modules (reference losses.py:11-440), as
stateless callables: ``loss_fn(output_dict) -> scalar``.  Probability BCE
follows torch ``F.binary_cross_entropy`` semantics (log clamped at -100).
Losses needing randomness accept an optional ``rng`` keyword.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.ops.masking import generate_length_mask
from texttoaudiogrounding_tpu.utils.registry import register

_LOG_CLAMP = -100.0


def binary_cross_entropy(prob: jax.Array, target: jax.Array,
                         weight: Optional[jax.Array] = None,
                         reduction: str = "mean") -> jax.Array:
    """torch ``F.binary_cross_entropy`` on probabilities (log clamp -100)."""
    log_p = jnp.maximum(jnp.log(prob), _LOG_CLAMP)
    log_1p = jnp.maximum(jnp.log1p(-prob), _LOG_CLAMP)
    loss = -(target * log_p + (1.0 - target) * log_1p)
    if weight is not None:
        loss = loss * weight
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


@register("FrameBceLoss")
class FrameBceLoss:
    """Length-masked frame BCE (reference losses.py:11-35)."""

    def __call__(self, output: dict, **kw) -> jax.Array:
        frame_sim = output["frame_sim"]
        if frame_sim.ndim == 3 and frame_sim.shape[2] == 1:
            frame_sim = frame_sim[..., 0]
        return self.forward_tensor(frame_sim, output["label"],
                                   output["length"])

    @staticmethod
    def forward_tensor(frame_sim, label, length):
        loss = binary_cross_entropy(frame_sim, label, reduction="none")
        mask = generate_length_mask(jnp.asarray(length),
                                    frame_sim.shape[1]).astype(loss.dtype)
        if loss.ndim == 3:
            mask = jnp.broadcast_to(mask[..., None], loss.shape)
        loss = loss * mask
        return jnp.sum(loss) / jnp.sum(mask)


@register("ClipBceLoss")
class ClipBceLoss:
    """Clip-level BCE (reference losses.py:38-43)."""

    def __call__(self, output: dict, **kw) -> jax.Array:
        return binary_cross_entropy(output["clip_sim"], output["label"])

    @staticmethod
    def forward_tensor(prob, label):
        return binary_cross_entropy(prob, label)


@register("MilNceLoss")
class MilNceLoss:
    """MIL-NCE over clip sims (reference losses.py:46-56)."""

    def __init__(self, tau: float = 1.0):
        self.tau = tau

    def __call__(self, output: dict, **kw) -> jax.Array:
        clip_sim = output["clip_sim"]
        label = output["label"]
        nominator = jax.scipy.special.logsumexp(
            clip_sim * label / self.tau, axis=1)
        denominator = jax.scipy.special.logsumexp(clip_sim / self.tau, axis=1)
        return jnp.mean(denominator - nominator)


@register("FocalClipBceLoss")
class FocalClipBceLoss:
    """Focal clip BCE (reference losses.py:59-72)."""

    def __init__(self, gamma: float = 2, alpha: float = 0.25):
        self.gamma = gamma
        self.alpha = alpha

    def __call__(self, output: dict, **kw) -> jax.Array:
        p = output["clip_sim"]
        y = output["label"]
        loss = (-self.alpha * jnp.power(1 - p, self.gamma) * y * jnp.log(p)
                - (1 - self.alpha) * jnp.power(p, self.gamma) * (1.0 - y)
                * jnp.log(1 - p))
        return jnp.mean(loss)


@register("ClipBceLossFreqWeight")
class ClipBceLossFreqWeight:
    """Frequency-weighted clip BCE (reference losses.py:75-87)."""

    def __init__(self, C: float, gamma: float):
        self.C = C
        self.gamma = gamma

    def __call__(self, output: dict, **kw) -> jax.Array:
        counts = jnp.asarray(output["counts"])
        label = output["label"]
        weight = (self.C / (self.C + counts)) ** self.gamma
        weight = jnp.where(label == 0.0, 1.0, weight)
        return binary_cross_entropy(output["clip_sim"], label, weight=weight)


@register("SymmetricClipBceLoss")
class SymmetricClipBceLoss:
    """BCE + reverse BCE with clamped labels (reference losses.py:90-104)."""

    def __init__(self, a: float = 1, b: float = 1, eps: float = 1e-3):
        self.a, self.b, self.eps = a, b, eps

    def __call__(self, output: dict, **kw) -> jax.Array:
        p = output["clip_sim"]
        y = output["label"]
        loss = binary_cross_entropy(p, y)
        loss += binary_cross_entropy(jnp.clip(y, self.eps, 1.0 - self.eps), p)
        return loss


@register("OriginSymmetricClipBceLoss")
class OriginSymmetricClipBceLoss:
    """Original symmetric BCE (reference losses.py:107-122)."""

    def __init__(self, a: float = 1, b: float = 1, eps: float = 1e-3):
        self.a, self.b = a, b
        self.A = math.log(eps)

    def __call__(self, output: dict, **kw) -> jax.Array:
        p = output["clip_sim"]
        y = output["label"]
        loss = binary_cross_entropy(p, y)
        reverse = -jnp.mean(y * (1 - p) * self.A + (1 - y) * self.A * p)
        return self.a * loss + self.b * reverse


@register("PriorAdjustedClipBceLoss")
class PriorAdjustedClipBceLoss:
    """Logit-adjusted clip BCE by class prior (reference losses.py:125-143)."""

    def __init__(self, data_size: float, tau: float = 1):
        self.data_size = data_size
        self.tau = tau

    def __call__(self, output: dict, **kw) -> jax.Array:
        p = output["clip_sim"]
        y = output["label"]
        prior = jnp.asarray(output["counts"]) / self.data_size
        one = p * prior ** self.tau
        zero = (1 - p) * (1 - prior) ** self.tau
        adjusted = one / (one + zero)
        return binary_cross_entropy(adjusted, y)


@register("MaskedClipBceLoss")
class MaskedClipBceLoss:
    """Class-masked clip BCE (reference losses.py:146-154).

    PARITY QUIRK: the reference passes the legacy kwarg
    ``reduce="none"`` — a truthy string, which torch's legacy path
    resolves to ``reduction='mean'`` — so its "masked" loss is actually
    the plain UNMASKED mean (the scalar broadcasts through the mask and
    the mask cancels in the ratio).  The default replicates that
    effective behavior (it determines training results); set
    ``fixed_masking=True`` for the mean over masked entries the
    reference code intended.  No shipped eg_configs recipe uses this
    loss, so the flag changes nothing for the recipe set.
    """

    def __init__(self, fixed_masking: bool = False):
        self.fixed_masking = fixed_masking

    def __call__(self, output: dict, **kw) -> jax.Array:
        loss = binary_cross_entropy(output["clip_sim"], output["label"],
                                    reduction="none")
        if not self.fixed_masking:
            return jnp.mean(loss)
        cls_mask = output["label_mask"]
        return jnp.sum(loss * cls_mask) / jnp.sum(cls_mask)


@register("MaskedFrameBceLoss")
class MaskedFrameBceLoss:
    """Length- and class-masked frame BCE (reference losses.py:157-170)."""

    def __call__(self, output: dict, **kw) -> jax.Array:
        prob = output["frame_sim"]               # [N, T, C]
        label = output["strong_label"]
        loss = binary_cross_entropy(prob, label, reduction="none")
        len_mask = generate_length_mask(
            jnp.asarray(output["length"]), prob.shape[1]).astype(loss.dtype)
        cls_mask = output["strong_label_mask"]   # [N, C]
        mask = len_mask[..., None] * cls_mask[:, None, :]
        return jnp.sum(loss * mask) / jnp.sum(mask)


@register("ClipMaskedFrameBceLoss")
class ClipMaskedFrameBceLoss:
    """Weighted clip BCE + masked frame BCE (reference losses.py:173-183)."""

    def __init__(self, frame_weight: float):
        self.frame_weight = frame_weight
        self.frame_loss_fn = MaskedFrameBceLoss()

    def __call__(self, output: dict, **kw) -> jax.Array:
        clip = ClipBceLoss.forward_tensor(output["clip_sim"],
                                          output["weak_label"])
        return ((1 - self.frame_weight) * clip
                + self.frame_weight * self.frame_loss_fn(output))


@register("ClipFrameBceLoss")
class ClipFrameBceLoss:
    """Weighted clip + frame BCE with configurable keys — used for
    self-supervision distillation (reference losses.py:186-210)."""

    def __init__(self, frame_weight: float,
                 clip_label_key: str = "weak_label",
                 clip_prob_key: str = "clip_sim",
                 frame_label_key: str = "strong_label",
                 frame_prob_key: str = "frame_sim"):
        self.frame_weight = frame_weight
        self.clip_label_key = clip_label_key
        self.clip_prob_key = clip_prob_key
        self.frame_label_key = frame_label_key
        self.frame_prob_key = frame_prob_key

    def __call__(self, output: dict, **kw) -> jax.Array:
        clip = ClipBceLoss.forward_tensor(output[self.clip_prob_key],
                                          output[self.clip_label_key])
        frame = FrameBceLoss.forward_tensor(output[self.frame_prob_key],
                                            output[self.frame_label_key],
                                            output["length"])
        return (1 - self.frame_weight) * clip + self.frame_weight * frame


@register("VectorQuantizeLoss")
class VectorQuantizeLoss:
    """Adds a VQ commitment term (reference losses.py:213-223)."""

    def __init__(self, loss_fn, vq_weight: float = 1.0):
        self.loss_fn = loss_fn
        self.vq_weight = vq_weight

    def __call__(self, output: dict, **kw) -> jax.Array:
        return self.vq_weight * output["vq_loss"] + self.loss_fn(output)


@register("MaxMarginRankingLoss")
class MaxMarginRankingLoss:
    """Bidirectional max-margin ranking on a [B, B] sim matrix.

    Reference: losses.py:226-264 (fix_norm=True drops diagonal pairs).
    """

    def __init__(self, margin: float = 1, fix_norm: bool = True,
                 lamda1: float = 1, sim_key: str = "sim"):
        self.margin = margin
        self.fix_norm = fix_norm
        self.lamda1 = lamda1
        self.sim_key = sim_key

    def __call__(self, output: dict, **kw) -> jax.Array:
        x = output[self.sim_key]
        n = x.shape[0]
        d = jnp.diag(x)[:, None]                     # [n, 1]
        cost1 = jax.nn.relu(self.margin - (d - x))               # columns
        cost2 = jax.nn.relu(self.margin - (d - self.lamda1 * x.T))
        if self.fix_norm:
            keep = 1.0 - jnp.eye(n)
            total = jnp.sum(cost1 * keep) + jnp.sum(cost2 * keep)
            return total / (2 * n * (n - 1))
        return (jnp.sum(cost1) + jnp.sum(cost2)) / (2 * n * n)


@register("InfoNceLoss")
class InfoNceLoss:
    """Symmetric InfoNCE on a [B, B] sim matrix (reference losses.py:267-281)."""

    def __init__(self, tau: float = 0.07):
        self.tau = tau

    def __call__(self, output: dict, **kw) -> jax.Array:
        sim = output["sim"]
        logit = sim.T / self.tau
        n = sim.shape[0]
        labels = jnp.arange(n)
        loss_a = _cross_entropy(logit.T, labels)
        loss_t = _cross_entropy(logit, labels)
        return (loss_a + loss_t) / 2


def _cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def _triplet_costs(sim: jax.Array, margin: float):
    n = sim.shape[0]
    d = jnp.diag(sim)[:, None]
    cost_s = jax.nn.relu(margin + sim - d)        # caption retrieval
    cost_a = jax.nn.relu(margin + sim - d.T)      # audio retrieval
    off = 1.0 - jnp.eye(n, dtype=sim.dtype)
    return cost_s * off, cost_a * off


@register("MaxTripletLoss")
class MaxTripletLoss:
    """Hardest-negative triplet loss (reference losses.py:285-315)."""

    def __init__(self, margin: float = 1.0):
        self.margin = margin

    def __call__(self, output: dict, **kw) -> jax.Array:
        sim = output["sim"]
        n = sim.shape[0]
        cost_s, cost_a = _triplet_costs(sim, self.margin)
        return (jnp.sum(jnp.max(cost_s, axis=1))
                + jnp.sum(jnp.max(cost_a, axis=0))) / n


@register("RandomTripletLoss")
class RandomTripletLoss:
    """Random-negative triplet loss (reference losses.py:319-351)."""

    def __init__(self, margin: float = 1.0):
        self.margin = margin

    def __call__(self, output: dict, rng: Optional[jax.Array] = None,
                 **kw) -> jax.Array:
        sim = output["sim"]
        n = sim.shape[0]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        cost_s, cost_a = _triplet_costs(sim, self.margin)
        rows = jnp.arange(n)
        s_idx = jax.random.randint(k1, (n,), 0, n)
        a_idx = jax.random.randint(k2, (n,), 0, n)
        return (jnp.sum(cost_s[rows, s_idx])
                + jnp.sum(cost_a[rows, a_idx])) / n


@register("WeightedTripletLoss")
class WeightedTripletLoss:
    """Polynomial-weighted triplet loss (reference losses.py:355-417).

    The reference's per-row dynamic filtering ("negatives violating the
    margin") becomes a masked max; rows with no violating negative
    contribute zero, and if *no* row has one the loss degenerates to 0
    with a live gradient path (reference :406-408).
    """

    def __init__(self, margin: float = 1.0):
        self.margin = margin

    def _one_direction(self, sim: jax.Array) -> tuple[jax.Array, jax.Array]:
        n = sim.shape[0]
        pos = jnp.diag(sim)                               # [n]
        off_diag = ~jnp.eye(n, dtype=bool)
        violate = off_diag & (sim + self.margin > pos[:, None])
        neg = jnp.max(jnp.where(violate, sim, -jnp.inf), axis=1)
        has_neg = jnp.any(violate, axis=1)
        neg = jnp.where(has_neg, neg, 0.0)
        pos_loss = jax.nn.relu(0.2 * pos**2 - 0.7 * pos + 0.5)
        neg_loss = jax.nn.relu(0.9 * neg**2 - 0.4 * neg + 0.03)
        per_row = jnp.where(has_neg, pos_loss + neg_loss, 0.0)
        return jnp.sum(per_row), jnp.any(has_neg)

    def __call__(self, output: dict, **kw) -> jax.Array:
        sim = output["sim"]
        n = sim.shape[0]
        l1, any1 = self._one_direction(sim)
        l2, any2 = self._one_direction(sim.T)
        total = (l1 + l2) / n
        # no violating negatives anywhere → 0 (keeps grad path alive)
        return jnp.where(any1 | any2, total, sim.mean() - sim.mean())


@register("MultipleLossSum")
class MultipleLossSum:
    """Weighted sum of named losses (reference losses.py:420-440).

    Values already present in the output dict under a loss name are used
    directly (e.g. ``vq_loss``).
    """

    def __init__(self, names: list, weights: list, **loss_fns):
        self.names = names
        self.weights = weights
        self.loss_fns = loss_fns

    def __call__(self, output: dict, **kw) -> jax.Array:
        total = 0.0
        for name, weight in zip(self.names, self.weights):
            if name in output:
                loss = output[name]
            else:
                loss = self.loss_fns[name](output, **kw)
            total = total + weight * loss
        return total
