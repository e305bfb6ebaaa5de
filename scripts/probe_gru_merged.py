"""BiGRU restructure probe (real chip): merged recurrent dot + grouped scan.

Current BiGRU = two sequential lax.scans (fwd/bwd), each with TWO
per-step recurrent dots ([B,H]@[H,2H] for r/z and [B,H]@[H,H] for n).
Both are overhead-bound at B=128, H=256 (scripts/probe_gru_unroll.py:
unrolling never helps).  Candidates:

  A (shipped)   : 2 scans x 2 dots/step
  B merged-dot  : 2 scans x 1 dot/step  ([B,H]@[H,3H]; the hn dot does
                  not depend on r, so rz+n fuse into one dot)
  C grouped     : 1 scan x 1 grouped dot/step ('gbh,ghk->gbk' with G=2
                  directions; bwd direction reads flipped input)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(fn, args, iters=20):
    carry = jnp.float32(0.0)
    out, carry = fn(*args, carry)
    float(carry)
    for _ in range(2):
        t0 = time.time()
        for _ in range(iters):
            out, carry = fn(*args, carry)
        float(carry)
        ms = (time.time() - t0) / iters * 1000.0
    return ms


def make_params(rng, d, h):
    ks = jax.random.split(rng, 12)
    p = {}
    for i, name in enumerate(["ir", "iz", "in", "hr", "hz", "hn"]):
        for g in range(2):
            p[f"{name}{g}"] = (jax.random.normal(ks[i * 2 + g],
                                                 ((d if name[0] == "i" else h),
                                                  h),
                                                 jnp.float32) * 0.05)
    p["bi0"] = jnp.zeros((3 * h,), jnp.float32)
    p["bi1"] = jnp.zeros((3 * h,), jnp.float32)
    p["bn0"] = jnp.zeros((h,), jnp.float32)
    p["bn1"] = jnp.zeros((h,), jnp.float32)
    return p


def variant_a(p, x, h):
    """Shipped: 2 scans, 2 dots/step."""

    def one_dir(g, xx):
        wi = jnp.concatenate([p[f"ir{g}"], p[f"iz{g}"], p[f"in{g}"]], 1)
        proj = jnp.einsum("btd,dh->bth", xx, wi) + p[f"bi{g}"]
        wh_rz = jnp.concatenate([p[f"hr{g}"], p[f"hz{g}"]], 1)
        hn_k = p[f"hn{g}"]

        def step(hid, pp):
            rz = jnp.dot(hid, wh_rz)
            r = jax.nn.sigmoid(pp[:, :h] + rz[:, :h])
            z = jax.nn.sigmoid(pp[:, h:2 * h] + rz[:, h:])
            n = jnp.tanh(pp[:, 2 * h:] + r * (jnp.dot(hid, hn_k)
                                              + p[f"bn{g}"]))
            hid = (1 - z) * n + z * hid
            return hid, hid

        _, ys = jax.lax.scan(step, jnp.zeros((xx.shape[0], h)),
                             jnp.swapaxes(proj, 0, 1))
        return jnp.swapaxes(ys, 0, 1)

    fwd = one_dir(0, x)
    bwd = jnp.flip(one_dir(1, jnp.flip(x, 1)), 1)
    return jnp.concatenate([fwd, bwd], -1)


def variant_b(p, x, h):
    """2 scans, ONE [B,H]@[H,3H] dot/step."""

    def one_dir(g, xx):
        wi = jnp.concatenate([p[f"ir{g}"], p[f"iz{g}"], p[f"in{g}"]], 1)
        proj = jnp.einsum("btd,dh->bth", xx, wi) + p[f"bi{g}"]
        wh = jnp.concatenate([p[f"hr{g}"], p[f"hz{g}"], p[f"hn{g}"]], 1)

        def step(hid, pp):
            rzn = jnp.dot(hid, wh)
            r = jax.nn.sigmoid(pp[:, :h] + rzn[:, :h])
            z = jax.nn.sigmoid(pp[:, h:2 * h] + rzn[:, h:2 * h])
            n = jnp.tanh(pp[:, 2 * h:] + r * (rzn[:, 2 * h:] + p[f"bn{g}"]))
            hid = (1 - z) * n + z * hid
            return hid, hid

        _, ys = jax.lax.scan(step, jnp.zeros((xx.shape[0], h)),
                             jnp.swapaxes(proj, 0, 1))
        return jnp.swapaxes(ys, 0, 1)

    fwd = one_dir(0, x)
    bwd = jnp.flip(one_dir(1, jnp.flip(x, 1)), 1)
    return jnp.concatenate([fwd, bwd], -1)


def variant_c(p, x, h):
    """ONE scan over G=2 directions, one grouped dot/step."""
    wi = jnp.stack([
        jnp.concatenate([p["ir0"], p["iz0"], p["in0"]], 1),
        jnp.concatenate([p["ir1"], p["iz1"], p["in1"]], 1),
    ])                                                    # [2, D, 3H]
    bi = jnp.stack([p["bi0"], p["bi1"]])                  # [2, 3H]
    wh = jnp.stack([
        jnp.concatenate([p["hr0"], p["hz0"], p["hn0"]], 1),
        jnp.concatenate([p["hr1"], p["hz1"], p["hn1"]], 1),
    ])                                                    # [2, H, 3H]
    bn = jnp.stack([p["bn0"], p["bn1"]])                  # [2, H]

    xg = jnp.stack([x, jnp.flip(x, 1)])                   # [2, B, T, D]
    proj = jnp.einsum("gbtd,gdh->gbth", xg, wi) + bi[:, None, None]

    def step(hid, pp):                                    # hid [2, B, H]
        rzn = jnp.einsum("gbh,ghk->gbk", hid, wh)
        r = jax.nn.sigmoid(pp[..., :h] + rzn[..., :h])
        z = jax.nn.sigmoid(pp[..., h:2 * h] + rzn[..., h:2 * h])
        n = jnp.tanh(pp[..., 2 * h:] + r * (rzn[..., 2 * h:]
                                            + bn[:, None]))
        hid = (1 - z) * n + z * hid
        return hid, hid

    _, ys = jax.lax.scan(step, jnp.zeros((2, x.shape[0], h)),
                         jnp.moveaxis(proj, 2, 0))        # [T, 2, B, 3H]
    ys = jnp.moveaxis(ys, 0, 2)                           # [2, B, T, H]
    return jnp.concatenate([ys[0], jnp.flip(ys[1], 1)], -1)


def variant_d(p, x, h):
    """C + bf16 input projection (recurrence stays f32)."""
    wi = jnp.stack([
        jnp.concatenate([p["ir0"], p["iz0"], p["in0"]], 1),
        jnp.concatenate([p["ir1"], p["iz1"], p["in1"]], 1),
    ]).astype(jnp.bfloat16)
    bi = jnp.stack([p["bi0"], p["bi1"]])
    wh = jnp.stack([
        jnp.concatenate([p["hr0"], p["hz0"], p["hn0"]], 1),
        jnp.concatenate([p["hr1"], p["hz1"], p["hn1"]], 1),
    ])
    bn = jnp.stack([p["bn0"], p["bn1"]])

    xg = jnp.stack([x, jnp.flip(x, 1)]).astype(jnp.bfloat16)
    proj = jnp.einsum("gbtd,gdh->gbth", xg, wi,
                      preferred_element_type=jnp.float32) + bi[:, None, None]

    def step(hid, pp):
        rzn = jnp.einsum("gbh,ghk->gbk", hid, wh)
        r = jax.nn.sigmoid(pp[..., :h] + rzn[..., :h])
        z = jax.nn.sigmoid(pp[..., h:2 * h] + rzn[..., h:2 * h])
        n = jnp.tanh(pp[..., 2 * h:] + r * (rzn[..., 2 * h:]
                                            + bn[:, None]))
        hid = (1 - z) * n + z * hid
        return hid, hid

    _, ys = jax.lax.scan(step, jnp.zeros((2, x.shape[0], h)),
                         jnp.moveaxis(proj, 2, 0))
    ys = jnp.moveaxis(ys, 0, 2)
    return jnp.concatenate([ys[0], jnp.flip(ys[1], 1)], -1)


def main():
    b, t, d, h = 128, 250, 512, 256
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, t, d), jnp.float32) * 0.1
    p = make_params(jax.random.PRNGKey(1), d, h)

    outs = {}
    for name, v in [("A_shipped", variant_a), ("B_merged", variant_b),
                    ("C_grouped", variant_c), ("D_bf16proj", variant_d)]:
        def fwd(x, c, v=v):
            y = v(p, x + c, h)
            return y, jnp.sum(y[0, 0]).astype(jnp.float32)

        def fwdbwd(x, c, v=v):
            def loss(xx):
                return jnp.sum(v(p, xx, h) ** 2)
            g = jax.grad(loss)(x + c)
            return g, jnp.sum(g[0, 0]).astype(jnp.float32)

        outs[name] = jax.jit(lambda x, v=v: v(p, x, h))(x)
        mf = timeit(jax.jit(fwd), (x,))
        mb = timeit(jax.jit(fwdbwd), (x,))
        print(f"{name:10s}: fwd {mf:6.2f} ms   fwd+bwd {mb:6.2f} ms")

    for name in ("B_merged", "C_grouped"):
        err = float(jnp.max(jnp.abs(outs[name] - outs["A_shipped"])))
        print(f"max |{name} - A| = {err:.2e}")


if __name__ == "__main__":
    main()
