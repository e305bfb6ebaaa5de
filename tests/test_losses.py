"""Loss parity vs torch reference implementations (reference losses.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from texttoaudiogrounding_tpu import losses as L


def j(x):
    return jnp.asarray(x)


def test_frame_bce(rng):
    prob = rng.uniform(0.01, 0.99, size=(3, 7)).astype(np.float32)
    label = (rng.uniform(size=(3, 7)) > 0.5).astype(np.float32)
    length = np.array([7, 3, 5])
    got = L.FrameBceLoss()({"frame_sim": j(prob), "label": j(label),
                            "length": j(length)})
    tl = F.binary_cross_entropy(torch.tensor(prob), torch.tensor(label),
                                reduction="none")
    mask = (torch.arange(7)[None] < torch.tensor(length)[:, None]).float()
    expected = (tl * mask).sum() / mask.sum()
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_clip_bce_and_grad(rng):
    prob = rng.uniform(0.01, 0.99, size=(4, 8)).astype(np.float32)
    label = (rng.uniform(size=(4, 8)) > 0.7).astype(np.float32)
    got = L.ClipBceLoss()({"clip_sim": j(prob), "label": j(label)})
    tp = torch.tensor(prob, requires_grad=True)
    expected = F.binary_cross_entropy(tp, torch.tensor(label))
    expected.backward()
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)
    g = jax.grad(lambda p: L.ClipBceLoss()({"clip_sim": p,
                                            "label": j(label)}))(j(prob))
    np.testing.assert_allclose(np.asarray(g), tp.grad.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_mil_nce(rng):
    sim = rng.uniform(0.01, 0.99, size=(4, 6)).astype(np.float32)
    label = np.zeros((4, 6), np.float32)
    label[:, :2] = 1
    got = L.MilNceLoss(tau=0.5)({"clip_sim": j(sim), "label": j(label)})
    ts = torch.tensor(sim)
    tl = torch.tensor(label)
    nom = torch.logsumexp(ts * tl / 0.5, dim=1)
    den = torch.logsumexp(ts / 0.5, dim=1)
    np.testing.assert_allclose(float(got), float((den - nom).mean()),
                               rtol=1e-5)


def test_focal_and_symmetric(rng):
    p = rng.uniform(0.05, 0.95, size=(3, 5)).astype(np.float32)
    y = (rng.uniform(size=(3, 5)) > 0.5).astype(np.float32)
    out = {"clip_sim": j(p), "label": j(y)}
    tp, ty = torch.tensor(p), torch.tensor(y)
    focal = (-0.25 * (1 - tp) ** 2 * ty * torch.log(tp)
             - 0.75 * tp**2 * (1 - ty) * torch.log(1 - tp)).mean()
    np.testing.assert_allclose(float(L.FocalClipBceLoss()(out)),
                               float(focal), rtol=1e-5)
    sym = (F.binary_cross_entropy(tp, ty)
           + F.binary_cross_entropy(ty.clamp(1e-3, 1 - 1e-3), tp))
    np.testing.assert_allclose(float(L.SymmetricClipBceLoss()(out)),
                               float(sym), rtol=1e-5)


def test_max_margin_ranking(rng):
    sim = rng.normal(size=(5, 5)).astype(np.float32)
    got = L.MaxMarginRankingLoss(margin=0.4)({"sim": j(sim)})
    # torch reference computation (losses.py:226-264)
    x = torch.tensor(sim)
    n = 5
    x1 = torch.diag(x).unsqueeze(1).expand(n, n).reshape(-1, 1)
    x1 = torch.cat((x1, x1), 0)
    x2 = torch.cat((x.reshape(-1, 1), x.t().reshape(-1, 1)), 0)
    keep = torch.ones(n, n) - torch.eye(n)
    keep_idx = torch.nonzero(
        torch.cat((keep.reshape(-1, 1),
                   keep.t().reshape(-1, 1)), 0).flatten()).flatten()
    mm = F.relu(0.4 - (x1[keep_idx] - x2[keep_idx]))
    np.testing.assert_allclose(float(got), float(mm.mean()), rtol=1e-5)


def test_info_nce(rng):
    sim = rng.normal(size=(4, 4)).astype(np.float32)
    got = L.InfoNceLoss(tau=0.07)({"sim": j(sim)})
    logit = torch.tensor(sim).T / 0.07
    lab = torch.arange(4)
    expected = (F.cross_entropy(logit.T, lab)
                + F.cross_entropy(logit, lab)) / 2
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_max_triplet(rng):
    sim = rng.normal(size=(5, 5)).astype(np.float32)
    got = L.MaxTripletLoss(margin=0.6)({"sim": j(sim)})
    x = torch.tensor(sim)
    n = 5
    d = torch.diag(x).view(n, 1)
    cost_s = F.relu(0.6 + x - d.expand_as(x))
    cost_a = F.relu(0.6 + x - d.t().expand_as(x))
    mask = torch.eye(n, dtype=torch.bool)
    cost_s = cost_s.masked_fill(mask, 0)
    cost_a = cost_a.masked_fill(mask, 0)
    expected = (cost_s.max(1).values.sum() + cost_a.max(0).values.sum()) / n
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_weighted_triplet(rng):
    sim = rng.uniform(0, 1, size=(6, 6)).astype(np.float32)
    got = L.WeightedTripletLoss(margin=0.2)({"sim": j(sim)})

    # torch reference (losses.py:360-411)
    def polyloss(sim_mat, margin=0.2):
        size = sim_mat.size(0)
        label = torch.arange(size)
        loss = []
        for mat in (sim_mat, sim_mat.t()):
            for i in range(size):
                pos = mat[i][i]
                negs = mat[i][label != label[i]]
                negs = negs[negs + margin > pos]
                if len(negs) < 1:
                    continue
                pos_loss = torch.clamp(0.2 * pos**2 - 0.7 * pos + 0.5, min=0)
                neg = max(negs)
                neg_loss = torch.clamp(0.9 * neg**2 - 0.4 * neg + 0.03,
                                       min=0)
                loss.append(pos_loss + neg_loss)
        if not loss:
            return torch.tensor(0.0)
        return sum(loss) / size

    expected = polyloss(torch.tensor(sim))
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_multiple_loss_sum(rng):
    p = rng.uniform(0.05, 0.95, size=(3, 4)).astype(np.float32)
    y = np.ones((3, 4), np.float32)
    out = {"clip_sim": j(p), "label": j(y), "vq_loss": jnp.asarray(0.7)}
    fn = L.MultipleLossSum(names=["clip", "vq_loss"], weights=[1.0, 2.0],
                           clip=L.ClipBceLoss())
    got = float(fn(out))
    expected = float(L.ClipBceLoss()(out)) + 2.0 * 0.7
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_bce_log_clamp_extremes():
    """p exactly 0/1 must not produce inf/nan (torch clamps log at -100)."""
    p = jnp.array([[0.0, 1.0, 0.5]])
    y = jnp.array([[1.0, 0.0, 1.0]])
    val = L.ClipBceLoss()({"clip_sim": p, "label": y})
    assert np.isfinite(float(val))
    tv = F.binary_cross_entropy(torch.tensor([[0.0, 1.0, 0.5]]),
                                torch.tensor([[1.0, 0.0, 1.0]]))
    np.testing.assert_allclose(float(val), float(tv), rtol=1e-5)
