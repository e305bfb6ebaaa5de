"""Shared neural building blocks (flax.linen, NHWC layouts).

TPU notes: convs/pools run NHWC (XLA's native TPU layout); the BiGRU is a
``lax.scan`` over time via ``nn.RNN`` — like the reference, it runs over the
*padded* sequence without packing (reference feeds padded batches straight
into ``nn.GRU``, models/audio_encoder.py:217), so masking happens downstream
in the pooling/loss layer.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

xavier_uniform = nn.initializers.xavier_uniform()


class _FusedBNPool(nn.Module):
    """Train-mode BN -> relu -> dual pool via the Pallas custom VJP
    (ops/pallas/bn_pool.py).  Declares the same param/batch_stats tree
    as ``nn.BatchNorm`` (scale/bias/mean/var) so checkpoints are
    interchangeable with the plain path; updates running stats with
    flax semantics (momentum * ra + (1-momentum) * batch_stat)."""

    pool: tuple
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import os

        from texttoaudiogrounding_tpu.ops.pallas.bn_pool import (
            bn_relu_dual_pool)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        interp = os.environ.get("TTG_PALLAS_INTERPRET") == "1"
        out, mean, var = bn_relu_dual_pool(
            x, scale, bias, pool=self.pool, eps=self.epsilon,
            interpret=interp)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * var
        return out


class ConvBlock(nn.Module):
    """PANNs double-conv block: (conv3x3 → BN → ReLU) x2 → pool.

    Reference: models/panns.py:20-62.  ``pool_type='avg+max'`` adds the two
    pooled maps (the Cnn8Rnn default).

    ``fused`` routes the whole block through the fused Pallas kernel
    (ops/pallas/conv_block.py) with running-stat BN folded into the
    epilogue — the serving path; ``fused="int8"`` additionally runs the
    convs on the int8 MXU path with dynamic activation quantization.
    """

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    def _chan_flag_ok(self, env_name, pool_size, pool_type) -> bool:
        """Shared gate for the channel-list pool-kernel opt-ins: the env
        var holds a channel list (e.g. "128,256,512"); a block routes
        when its out_channels is listed, the pool is the PANNs dual
        avg+max with a supported size, and we are not initializing."""
        import os
        flag = os.environ.get(env_name, "")
        if not flag or pool_type != "avg+max" or self.is_initializing():
            return False
        try:
            chans = {int(v) for v in flag.replace(",", " ").split()}
        except ValueError:
            return False
        return (self.out_channels in chans
                and tuple(pool_size) in ((2, 2), (1, 2)))

    def _pool_vjp_ok(self, pool_size, pool_type) -> bool:
        """TTG_POOL_VJP = channel list opting blocks into the Pallas
        relu+dual-pool custom VJP (training path)."""
        return self._chan_flag_ok("TTG_POOL_VJP", pool_size, pool_type)

    def _bn_pool_ok(self, bn_train, pool_size, pool_type) -> bool:
        """TTG_BN_POOL = channel list opting blocks into the fused
        train-BN+relu+dual-pool custom VJP (ops/pallas/bn_pool.py) —
        the round-5 block1-backward kernel (measured step-level loss;
        parity-tested opt-in)."""
        return bn_train and self._chan_flag_ok(
            "TTG_BN_POOL", pool_size, pool_type)

    def _pool_vjp_shape(self, x, pool_size) -> bool:
        from texttoaudiogrounding_tpu.ops.pallas import dual_pool as dp
        pt, pm = tuple(pool_size)
        _, t, m, c = x.shape
        t2 = t // pt * pt
        if t2 == 0 or m % 2:
            return False
        try:
            if dp._is_packed(x, (pt, pm)):
                dp._pick_tc(t2, 32, pt)
            elif c % 128 == 0:
                dp._pick_tc(t2, m, pt)
            else:
                return False
            return True
        except ValueError:       # no valid chunk (e.g. prime short T)
            return False

    @nn.compact
    def __call__(self, x: jax.Array, *, bn_train: bool,
                 pool_size: Sequence[int] = (2, 2),
                 pool_type: str = "avg+max",
                 fused: bool | str = False) -> jax.Array:
        if (fused and not self.is_initializing() and not bn_train
                and pool_type == "avg+max"):
            from texttoaudiogrounding_tpu.ops.pallas.conv_block import (
                _pick_tc, fold_bn, fused_double_conv_pool)
            quantize = fused == "int8"
            if (x.shape[3] == 1 and self.out_channels == 64
                    and x.shape[2] == 64 and tuple(pool_size) == (2, 2)):
                # Cin=1 block1 pair kernel (conv_block1_pair.py):
                # banded K=192 conv1 dot + register-resident triple-
                # store + one K=768 conv2 dot + in-register dual pool.
                import os
                if os.environ.get("TTG_FUSED_B1", "1") != "0":
                    from texttoaudiogrounding_tpu.ops.pallas. \
                        conv_block1_pair import fused_block1_pair
                    v = self.variables
                    p, bs = v["params"], v["batch_stats"]
                    ab1 = fold_bn(p["bn1"]["scale"], p["bn1"]["bias"],
                                  bs["bn1"]["mean"], bs["bn1"]["var"])
                    ab2 = fold_bn(p["bn2"]["scale"], p["bn2"]["bias"],
                                  bs["bn2"]["mean"], bs["bn2"]["var"])
                    # block1 runs in bf16 inside int8 serving by
                    # default "mixed": int8 conv1 dot feeding a bf16
                    # conv2 — the round-5 on-chip ladder at block1's
                    # geometry (chip_playbook_r5c/e, standalone and
                    # in-model bench): all-int8 12.46 ms / 3929 clips/s
                    # (the y1 requantize epilogue costs more than the
                    # int8 dot-rate gain), bf16 9.97 / 4248, mixed 9.76
                    # / 4269 (conv1's int8 dot gain has NO kernel-side
                    # epilogue: the x quantize is XLA-side and the
                    # weight-scale dequant folds into the BN affine).
                    # TTG_B1_QUANT=0 restores bf16, =1 all-int8.
                    q_env = os.environ.get("TTG_B1_QUANT", "mixed")
                    q1 = False
                    if quantize:
                        q1 = {"1": True, "mixed": "conv1",
                              "conv1": "conv1"}.get(q_env, False)
                    return fused_block1_pair(
                        x[..., 0], p["conv1"]["kernel"], ab1,
                        p["conv2"]["kernel"], ab2, quantize=q1,
                        compute_dtype=self.dtype,
                        tc=int(os.environ.get("TTG_B1_TC", "48")),
                        mode=os.environ.get("TTG_B1_MODE", "triple"))
                ok = False
            elif (x.shape[3] == 64 and self.out_channels % 128 == 0
                    and tuple(pool_size) == (2, 2) and x.shape[2] % 2 == 0):
                # Cin=64 parity-split pair kernel (conv_block_pair.py):
                # the only fused design that beats XLA at this geometry
                # (7.6 ms int8 / 8.4 bf16 vs 10.2 XLA at B=128); the
                # generic kernel's banded dots lose here, so fall back
                # to XLA (not to it) when the pair layout doesn't fit.
                from texttoaudiogrounding_tpu.ops.pallas.conv_block_pair \
                    import _pick_tc_pair, fused_block2_pair
                try:
                    _pick_tc_pair(x.shape[1], x.shape[2] // 2,
                                  cout=self.out_channels,
                                  quantize=quantize,
                                  compute_dtype=self.dtype)
                    ok = True
                except ValueError:
                    ok = False
                if ok:
                    v = self.variables
                    p, bs = v["params"], v["batch_stats"]
                    ab1 = fold_bn(p["bn1"]["scale"], p["bn1"]["bias"],
                                  bs["bn1"]["mean"], bs["bn1"]["var"])
                    ab2 = fold_bn(p["bn2"]["scale"], p["bn2"]["bias"],
                                  bs["bn2"]["mean"], bs["bn2"]["var"])
                    return fused_block2_pair(
                        x, p["conv1"]["kernel"], ab1,
                        p["conv2"]["kernel"], ab2, quantize=quantize,
                        compute_dtype=self.dtype)
            elif x.shape[3] == 64:
                # Cin=64 outside the pair geometry (pool != (2,2), odd
                # M, Cout % 128): the generic kernel's banded dots lose
                # to XLA at this channel count (STATUS.md) — XLA, not it
                ok = False
            else:
                try:
                    _pick_tc(x.shape[1], x.shape[2], x.shape[3],
                             self.out_channels, pool_size[0], pool_size[1],
                             quantize, self.dtype)
                    ok = True
                except ValueError:   # e.g. short clips with prime T
                    ok = False
            if ok:
                v = self.variables
                p, bs = v["params"], v["batch_stats"]
                ab1 = fold_bn(p["bn1"]["scale"], p["bn1"]["bias"],
                              bs["bn1"]["mean"], bs["bn1"]["var"])
                ab2 = fold_bn(p["bn2"]["scale"], p["bn2"]["bias"],
                              bs["bn2"]["mean"], bs["bn2"]["var"])
                import os
                if (os.environ.get("TTG_WINO") == "1"
                        and x.shape[3] >= 128
                        and tuple(pool_size) == (2, 2)
                        and x.shape[2] % 2 == 0):
                    # Winograd F(2,3x3) plane kernel: 2.25x fewer MACs
                    # at identical dot shapes (conv_block_wino.py).
                    # MEASURED DEAD END (2026-08-18, scripts/bench_wino.py):
                    # at the pool-(2,2) analog of blocks 3-4 wino int8 is
                    # 2-3x SLOWER than direct9 (15.0 vs 5.2 / 9.6 vs 4.3 ms,
                    # B=128) — the plane transforms are serialized VPU work
                    # that never overlaps the MXU dots.  The flagship never
                    # even reaches here (its blocks 3-4 pool (1,2)); kernel
                    # kept as a parity-tested experiment.
                    from texttoaudiogrounding_tpu.ops.pallas. \
                        conv_block_wino import (_pick_tpad_tc,
                                                fused_block_wino)
                    try:
                        _pick_tpad_tc(x.shape[1], x.shape[2],
                                      x.shape[3], self.out_channels,
                                      quantize, self.dtype)
                        wino_ok = True
                    except ValueError:  # e.g. bf16 block4 VMEM
                        wino_ok = False
                    if wino_ok:
                        return fused_block_wino(
                            x, p["conv1"]["kernel"], ab1,
                            p["conv2"]["kernel"], ab2,
                            quantize=quantize,
                            compute_dtype=self.dtype)
                return fused_double_conv_pool(
                    x, p["conv1"]["kernel"], ab1, p["conv2"]["kernel"],
                    ab2, tuple(pool_size), quantize=quantize,
                    compute_dtype=self.dtype)
        # dtype threads through BN too: mixed f32 BN between bf16 convs
        # forces dtype converts that cost more than the bf16 win
        pool_vjp = self._pool_vjp_ok(pool_size, pool_type)
        bn_pool = self._bn_pool_ok(bn_train, pool_size, pool_type)
        for name in ("conv1", "conv2"):
            x = nn.Conv(self.out_channels, (3, 3), use_bias=False,
                        padding="SAME", kernel_init=xavier_uniform,
                        dtype=self.dtype, name=name)(x)
            if (name == "conv2" and bn_pool
                    and self._pool_vjp_shape(x, pool_size)):
                # fused train-BN + relu + dual pool custom VJP: one
                # Pallas pass each way + closed-form BN backward —
                # replaces the BN-stat/SelectAndScatter chain that the
                # round-5 bisect measured at ~25 ms of block1's 46.6
                return _FusedBNPool(tuple(pool_size), name="bn2")(x)
            x = nn.BatchNorm(use_running_average=not bn_train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=name.replace("conv", "bn"))(x)
            if (name == "conv2" and pool_vjp
                    and self._pool_vjp_shape(x, pool_size)):
                # Pallas relu+dual-pool with a mask-recompute backward —
                # beats XLA's SelectAndScatter VJP at the Cnn8Rnn block
                # shapes (scripts/probe_pool_vjp.py); identical forward
                # + torch-semantics gradient (tests/test_pallas_dual_pool)
                import os

                from texttoaudiogrounding_tpu.ops.pallas.dual_pool import (
                    dual_pool_relu)
                interp = os.environ.get("TTG_PALLAS_INTERPRET") == "1"
                return dual_pool_relu(x, tuple(pool_size),
                                      interpret=interp)
            x = nn.relu(x)
        window = (1, *pool_size, 1)
        if pool_type == "max":
            x = nn.max_pool(x, window[1:3], strides=window[1:3])
        elif pool_type == "avg":
            x = nn.avg_pool(x, window[1:3], strides=window[1:3])
        elif pool_type == "avg+max":
            x = (nn.avg_pool(x, window[1:3], strides=window[1:3])
                 + nn.max_pool(x, window[1:3], strides=window[1:3]))
        else:
            raise ValueError(f"bad pool_type {pool_type}")
        return x


class CDurBlock(nn.Module):
    """CDur block: BN → conv3x3(no bias) → LeakyReLU(0.1).

    Reference: models/audio_encoder.py:16-22 (note BN comes *first*, over
    the input channels).
    """

    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array, *, bn_train: bool) -> jax.Array:
        x = nn.BatchNorm(use_running_average=not bn_train, momentum=0.9,
                         epsilon=1e-5)(x)
        x = nn.Conv(self.out_channels, (3, 3), use_bias=False, padding="SAME",
                    kernel_init=nn.initializers.kaiming_normal())(x)
        return nn.leaky_relu(x, negative_slope=0.1)


def lp_pool_2d(x: jax.Array, norm_type: float,
               window: Sequence[int]) -> jax.Array:
    """torch ``nn.LPPool2d`` semantics on NHWC: (sum |x|^p over window)^(1/p),
    window == stride, floor division of spatial dims."""
    p = float(norm_type)
    xp = jnp.power(jnp.abs(x), p)
    summed = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add,
        window_dimensions=(1, window[0], window[1], 1),
        window_strides=(1, window[0], window[1], 1), padding="VALID")
    return jnp.power(summed, 1.0 / p)


class _GruParam(nn.Module):
    """One GRU gate's weights, named like flax GRUCell's Dense children
    (``<name>/kernel`` [+ ``/bias``]) so checkpoints are interchangeable."""

    shape: tuple
    use_bias: bool
    recurrent: bool = False

    @nn.compact
    def __call__(self):
        init = (nn.initializers.orthogonal() if self.recurrent
                else nn.initializers.lecun_normal())
        kernel = self.param("kernel", init, self.shape)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.shape[1],)) if self.use_bias else None
        return kernel, bias


class GRUSeq(nn.Module):
    """One GRU direction over a full sequence, input projections hoisted.

    Same recurrence as flax ``GRUCell`` / torch ``nn.GRU`` (r/z/n gates,
    ``h' = (1-z)n + zh``), but the input-side projections for ALL steps are
    one big MXU matmul outside the ``lax.scan`` — the scan body only does
    the [B, H] x [H, 3H] recurrent matmuls.  Parameter tree matches
    ``nn.RNN(nn.GRUCell)`` (``ir/iz/in/hr/hz/hn``), so the torch importer
    and existing checkpoints work unchanged.
    """

    hidden: int
    reverse: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.hidden
        in_dim = x.shape[-1]
        ir_k, ir_b = _GruParam((in_dim, h), True, name="ir")()
        iz_k, iz_b = _GruParam((in_dim, h), True, name="iz")()
        in_k, in_b = _GruParam((in_dim, h), True, name="in")()
        hr_k, _ = _GruParam((h, h), False, recurrent=True, name="hr")()
        hz_k, _ = _GruParam((h, h), False, recurrent=True, name="hz")()
        hn_k, hn_b = _GruParam((h, h), True, recurrent=True, name="hn")()

        # hoisted input projections: [B, T, in] @ [in, 3H] in one matmul
        wi = jnp.concatenate([ir_k, iz_k, in_k], axis=1)
        bi = jnp.concatenate([ir_b, iz_b, in_b])
        proj = jnp.einsum("btd,dh->bth", x.astype(self.dtype),
                          wi.astype(self.dtype),
                          preferred_element_type=jnp.float32) + bi
        wh_rz = jnp.concatenate([hr_k, hz_k], axis=1).astype(
            self.dtype)                                      # [H, 2H]
        hn_kc = hn_k.astype(self.dtype)

        if self.reverse:
            proj = jnp.flip(proj, axis=1)

        def step(hid, p):
            # gates in f32; the hidden state (the recurrent dot operand)
            # carries ``dtype`` so bf16 serving uses bf16 MXU passes
            rz = jnp.dot(hid, wh_rz, preferred_element_type=jnp.float32)
            r = jax.nn.sigmoid(p[:, :h] + rz[:, :h])
            z = jax.nn.sigmoid(p[:, h:2 * h] + rz[:, h:])
            n = jnp.tanh(p[:, 2 * h:]
                         + r * (jnp.dot(hid, hn_kc,
                                        preferred_element_type=jnp.float32)
                                + hn_b))
            hid = ((1 - z) * n + z * hid.astype(jnp.float32))
            return hid.astype(self.dtype), hid

        h0 = jnp.zeros((x.shape[0], h), self.dtype)
        _, ys = jax.lax.scan(step, h0, jnp.swapaxes(proj, 0, 1))
        ys = jnp.swapaxes(ys, 0, 1)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys


class _GruDirParams(nn.Module):
    """Parameter tree of one GRU direction (same layout as ``GRUSeq``)."""

    in_dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        h = self.hidden
        ir_k, ir_b = _GruParam((self.in_dim, h), True, name="ir")()
        iz_k, iz_b = _GruParam((self.in_dim, h), True, name="iz")()
        in_k, in_b = _GruParam((self.in_dim, h), True, name="in")()
        hr_k, _ = _GruParam((h, h), False, recurrent=True, name="hr")()
        hz_k, _ = _GruParam((h, h), False, recurrent=True, name="hz")()
        hn_k, hn_b = _GruParam((h, h), True, recurrent=True, name="hn")()
        wi = jnp.concatenate([ir_k, iz_k, in_k], axis=1)    # [in, 3H]
        bi = jnp.concatenate([ir_b, iz_b, in_b])            # [3H]
        wh = jnp.concatenate([hr_k, hz_k, hn_k], axis=1)    # [H, 3H]
        return wi, bi, wh, hn_b


class BiGRU(nn.Module):
    """Bidirectional GRU over padded sequences, outputs concatenated.

    Equivalent capability to torch ``nn.GRU(bidirectional=True,
    batch_first=True)`` as used at reference models/audio_encoder.py:141.
    Like the reference, runs over the padded sequence without packing.

    Both directions run in ONE ``lax.scan`` with ONE grouped recurrent
    dot per step (``gbh,ghk->gbk`` with G=2; the backward direction reads
    flipped inputs).  Bit-exact vs two sequential per-direction scans and
    ~1 ms faster fwd+bwd at B=128/T=250/H=256 on v5e — the per-step n-gate
    dot does not depend on r, so r/z/n fuse into one [H, 3H] dot
    (measured: scripts/probe_gru_merged.py).  Parameter tree is unchanged
    (``GRUCell_{0,1}/{ir,iz,in,hr,hz,hn}``) so the torch importer and
    existing checkpoints work as before.
    """

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.hidden
        wi0, bi0, wh0, bn0 = _GruDirParams(x.shape[-1], h,
                                           name="GRUCell_0")()
        wi1, bi1, wh1, bn1 = _GruDirParams(x.shape[-1], h,
                                           name="GRUCell_1")()
        dt = self.dtype
        wi = jnp.stack([wi0, wi1]).astype(dt)        # [2, in, 3H]
        bi = jnp.stack([bi0, bi1])                   # [2, 3H] (f32)
        wh = jnp.stack([wh0, wh1]).astype(dt)        # [2, H, 3H]
        bn = jnp.stack([bn0, bn1])                   # [2, H]

        # hoisted input projections for both directions in one matmul
        xg = jnp.stack([x, jnp.flip(x, axis=1)]).astype(dt)  # [2, B, T, in]

        import os
        # f32 (the training path: audio_encoder.py pins gru_dtype=f32 for
        # train) defaults to the Pallas custom-VJP recurrence on TPU —
        # measured 140.3 vs 144.2 ms/step bf16-mixed fwd+bwd+adam at
        # B=128 (912 vs 888 clips/s, scripts/profile_train.py) with
        # trajectory-identical convergence (scripts/ab_gru_convergence.py).
        # bf16 serving keeps the grouped scan (Pallas fwd measured 3814
        # vs 3873 clips/s e2e) unless explicitly opted in.
        flag = os.environ.get("TTG_PALLAS_GRU",
                              "1" if dt == jnp.float32 else "0")
        if flag == "1" and not self.is_initializing():
            from texttoaudiogrounding_tpu.ops.pallas.gru import (
                bigru_pallas, bigru_pallas_trainable,
                bigru_pallas_trainable_v2)
            from texttoaudiogrounding_tpu.ops.pallas.logmel import \
                pallas_supported
            if pallas_supported():
                # scan-fused recurrence: weights + carries stay
                # VMEM-resident across the sequential grid walk.  f32
                # (training) uses the custom-VJP variant whose backward
                # is a reversed-grid Pallas kernel; bf16 serving uses
                # the forward-only kernel.
                variant = os.environ.get("TTG_GRU_BWD", "v1")
                pd = dt
                if dt == jnp.float32 and variant == "bf16":
                    # the bf16-recurrence variant casts EVERY MXU dot's
                    # operands to bf16 (cuDNN-autocast analog) — the
                    # input projection included; accumulation stays f32
                    pd = jnp.bfloat16
                tproj = jnp.einsum("gbtd,gdh->tgbh", xg.astype(pd),
                                   wi.astype(pd),
                                   preferred_element_type=jnp.float32) \
                    + bi[None, :, None]
                bsz, tlen = x.shape[0], x.shape[1]
                tproj = tproj.reshape(tlen, 2 * bsz, 3 * h)
                if dt == jnp.float32:
                    # the round-3 all-in-kernel backward stays default:
                    # both round-4 redesigns measured SLOWER standalone
                    # (v2 dcols-scratch 6.00, v3 einsum-hoist 5.04 vs
                    # 4.41 ms — the per-step drznn output write + the
                    # post-walk dWh einsum cost more than the in-kernel
                    # dW dots they remove; scripts/probe_gru_bwd_r4.py)
                    if variant == "v2":
                        ys = bigru_pallas_trainable_v2(tproj, wh, bn)
                    elif variant == "v3":
                        from texttoaudiogrounding_tpu.ops.pallas.gru \
                            import bigru_pallas_trainable_v3
                        ys = bigru_pallas_trainable_v3(tproj, wh, bn)
                    elif variant == "bf16":
                        # bf16 recurrence + bf16 backward dots, f32
                        # carry/accumulators (the serving forward's
                        # numerics; cuDNN-autocast analog)
                        from texttoaudiogrounding_tpu.ops.pallas.gru \
                            import bigru_pallas_trainable_bf16
                        ys = bigru_pallas_trainable_bf16(tproj, wh, bn)
                    else:
                        ys = bigru_pallas_trainable(tproj, wh, bn)
                else:
                    ys = bigru_pallas(tproj, wh, bn, dtype=dt)
                ys = jnp.moveaxis(ys.reshape(tlen, 2, bsz, h), 0, 2)
                return jnp.concatenate(
                    [ys[0], jnp.flip(ys[1], axis=1)], axis=-1)

        proj = jnp.einsum("gbtd,gdh->gbth", xg, wi,
                          preferred_element_type=jnp.float32) \
            + bi[:, None, None]

        def step(hid, pp):                           # hid [2, B, H]
            # gates in f32; the hidden state (the recurrent dot operand)
            # carries ``dtype`` so bf16 serving uses bf16 MXU passes
            rzn = jnp.einsum("gbh,ghk->gbk", hid, wh,
                             preferred_element_type=jnp.float32)
            r = jax.nn.sigmoid(pp[..., :h] + rzn[..., :h])
            z = jax.nn.sigmoid(pp[..., h:2 * h] + rzn[..., h:2 * h])
            n = jnp.tanh(pp[..., 2 * h:]
                         + r * (rzn[..., 2 * h:] + bn[:, None]))
            hid = (1 - z) * n + z * hid.astype(jnp.float32)
            return hid.astype(dt), hid

        h0 = jnp.zeros((2, x.shape[0], h), dt)
        _, ys = jax.lax.scan(step, h0, jnp.moveaxis(proj, 2, 0))
        ys = jnp.moveaxis(ys, 0, 2)                  # [2, B, T, H]
        return jnp.concatenate([ys[0], jnp.flip(ys[1], axis=1)], axis=-1)


class GRU(nn.Module):
    """Unidirectional or bidirectional multi-layer GRU (torch nn.GRU shape)."""

    hidden: int
    num_layers: int = 1
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            if self.bidirectional:
                x = BiGRU(self.hidden, name=f"layer{i}")(x)
            else:
                x = GRUSeq(self.hidden, name=f"layer{i}")(x)
        return x


class RNNSeq(nn.Module):
    """One vanilla (Elman, tanh) RNN direction over a full sequence —
    torch ``nn.RNN`` semantics: ``h' = tanh(W_ih x + b_ih + W_hh h +
    b_hh)``.  Input projections for all steps are hoisted into one MXU
    matmul; the scan body only does the [B, H] x [H, H] recurrent dot.
    Reference reachable via ``RnnEncoder(rnn_type="RNN")``
    (models/text_encoder.py:106 does ``getattr(nn, rnn_type)``)."""

    hidden: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.hidden
        i_k, i_b = _GruParam((x.shape[-1], h), True, name="ih")()
        h_k, h_b = _GruParam((h, h), True, recurrent=True, name="hh")()
        proj = jnp.einsum("btd,dh->bth", x, i_k,
                          preferred_element_type=jnp.float32) + i_b
        if self.reverse:
            proj = jnp.flip(proj, axis=1)

        def step(hid, p):
            hid = jnp.tanh(p + jnp.dot(
                hid, h_k, preferred_element_type=jnp.float32) + h_b)
            return hid, hid

        h0 = jnp.zeros((x.shape[0], h), jnp.float32)
        _, ys = jax.lax.scan(step, h0, jnp.swapaxes(proj, 0, 1))
        ys = jnp.swapaxes(ys, 0, 1)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys


class RNN(nn.Module):
    """Uni/bidirectional multi-layer vanilla RNN (torch nn.RNN shape)."""

    hidden: int
    num_layers: int = 1
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            fwd = RNNSeq(self.hidden, name=f"fwd{i}")(x)
            if self.bidirectional:
                bwd = RNNSeq(self.hidden, reverse=True, name=f"bwd{i}")(x)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        return x


class LSTM(nn.Module):
    hidden: int
    num_layers: int = 1
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden),
                         name=f"fwd{i}")(x)
            if self.bidirectional:
                bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                             keep_order=True, name=f"bwd{i}")(x)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        return x


def spec_augment(rng: jax.Array, x: jax.Array, time_drop_width: int = 64,
                 time_stripes_num: int = 2, freq_drop_width: int = 8,
                 freq_stripes_num: int = 2) -> jax.Array:
    """SpecAugment: zero random time/freq stripes per sample.

    Same drop law as torchlibrosa ``SpecAugmentation`` used at reference
    models/audio_encoder.py:126-131 (per stripe: width ~ U[0, drop_width),
    begin ~ U[0, T - width)), but vectorized over the batch as boolean masks
    rather than a python loop over samples.

    x: [B, T, M] log-mel.
    """
    b, t, m = x.shape
    keys = jax.random.split(rng, 4)

    def stripe_mask(key_d, key_b, size, num, total):
        d = jax.random.randint(key_d, (b, num), 0, size)
        lo = jax.random.randint(key_b, (b, num), 0,
                                jnp.maximum(total - d, 1))
        idx = jnp.arange(total)[None, None, :]
        hit = (idx >= lo[..., None]) & (idx < (lo + d)[..., None])
        return ~jnp.any(hit, axis=1)  # [B, total] True=keep

    tmask = stripe_mask(keys[0], keys[1], time_drop_width, time_stripes_num, t)
    fmask = stripe_mask(keys[2], keys[3], freq_drop_width, freq_stripes_num, m)
    return x * tmask[:, :, None] * fmask[:, None, :]


def do_mixup(x: jax.Array, mixup_lambda: jax.Array) -> jax.Array:
    """Mix even-indexed samples with odd-indexed ones; halves the batch.

    Reference: utils/train_util.py:73-88.
    """
    lam = mixup_lambda.astype(x.dtype)
    lam = lam.reshape(lam.shape + (1,) * (x.ndim - 1))
    return x[0::2] * lam[0::2] + x[1::2] * lam[1::2]


class PositionalEncoding(nn.Module):
    """Sinusoidal PE + dropout (reference models/text_encoder.py:128-144)."""

    dropout: float
    max_len: int = 100

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        d_model = x.shape[-1]
        pos = jnp.arange(self.max_len)[:, None].astype(jnp.float32)
        div = jnp.exp(jnp.arange(0, d_model, 2).astype(jnp.float32)
                      * -(jnp.log(10000.0) / d_model))
        pe = jnp.zeros((self.max_len, d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
        pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
        x = x + pe[None, :x.shape[1]]
        return nn.Dropout(self.dropout, deterministic=not train)(x)
