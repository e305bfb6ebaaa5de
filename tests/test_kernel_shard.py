"""Pallas kernels under a sharded mesh (parallel/kernel_shard.py).

A pallas_call has no GSPMD sharding rule, so multi-chip serving used to
force operand replication unless the fused kernels were disabled.  These
tests pin the fix — kernel entries shard_map themselves over the active
kernel mesh's data axis (interpret mode, 8-device CPU mesh):

- every routed kernel (logmel, direct9 block, pair block, BiGRU fwd)
  produces bit-identical outputs sharded vs plain;
- the custom-VJP BiGRU's gradients survive the shard_map transpose —
  the replicated ``wh``/``bn`` cotangents are psummed over the axis;
- non-divisible batches fall back to the plain call;
- the full serving path (GroundingPredictor(mesh=...) with
  ``TTG_FUSED_CONV`` + ``TTG_PALLAS_INTERPRET=1``) matches the
  single-device predictor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texttoaudiogrounding_tpu.parallel.kernel_shard import (
    active_kernel_mesh,
    kernel_mesh,
    wrap_calls,
)
from texttoaudiogrounding_tpu.parallel.mesh import get_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _mesh():
    return get_mesh(jax.devices()[:8], axis_names=("data",), shape=(8,))


def _block_case(b, t, m, cin, cout, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, t, m, cin)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05,
                     jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, cout, cout)) * 0.05,
                     jnp.float32)
    ab1 = (jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32),
           jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32))
    ab2 = (jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32),
           jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32))
    return x, w1, ab1, w2, ab2


def test_context_manager_noops_on_trivial_meshes():
    assert active_kernel_mesh() is None
    with kernel_mesh(None):
        assert active_kernel_mesh() is None
    with kernel_mesh(get_mesh(jax.devices()[:1])):
        assert active_kernel_mesh() is None  # size-1 axis
    with kernel_mesh(_mesh()):
        assert active_kernel_mesh() is not None
    assert active_kernel_mesh() is None


def test_direct9_block_sharded_matches_plain():
    from texttoaudiogrounding_tpu.ops.pallas.conv_block import (
        fused_double_conv_pool,
    )
    x, w1, ab1, w2, ab2 = _block_case(8, 8, 8, 128, 128)
    kw = dict(quantize=False, compute_dtype=jnp.float32, interpret=True)
    plain = np.asarray(fused_double_conv_pool(x, w1, ab1, w2, ab2,
                                              (2, 2), **kw))
    with kernel_mesh(_mesh()):
        sharded = np.asarray(jax.jit(
            lambda *a: fused_double_conv_pool(*a, (2, 2), **kw))(
                x, w1, ab1, w2, ab2))
    np.testing.assert_array_equal(sharded, plain)


def test_direct9_int8_sharded_close_and_batch_equivariant():
    """int8 mode: the per-CLIP dynamic input scale makes the kernel
    batch-equivariant (eager sharded == plain bit-exact); under jit the
    scale's max-reduction fuses differently, so allow ±2 int8 steps."""
    from texttoaudiogrounding_tpu.ops.pallas.conv_block import (
        fused_double_conv_pool,
    )
    x, w1, ab1, w2, ab2 = _block_case(8, 8, 8, 128, 128)
    kw = dict(quantize=True, compute_dtype=jnp.float32, interpret=True)
    plain = np.asarray(fused_double_conv_pool(x, w1, ab1, w2, ab2,
                                              (2, 2), **kw),
                       np.float32)
    single = np.asarray(fused_double_conv_pool(x[:1], w1, ab1, w2, ab2,
                                               (2, 2), **kw),
                        np.float32)
    np.testing.assert_array_equal(plain[:1], single)  # equivariance
    with kernel_mesh(_mesh()):
        eager = np.asarray(fused_double_conv_pool(x, w1, ab1, w2, ab2,
                                                  (2, 2), **kw),
                           np.float32)
        np.testing.assert_array_equal(eager, plain)
        sharded = np.asarray(jax.jit(
            lambda *a: fused_double_conv_pool(*a, (2, 2), **kw))(
                x, w1, ab1, w2, ab2), np.float32)
    np.testing.assert_allclose(sharded, plain, atol=0.08, rtol=0.02)


def test_pair_block_sharded_matches_plain():
    from texttoaudiogrounding_tpu.ops.pallas.conv_block_pair import (
        fused_block2_pair,
    )
    x, w1, ab1, w2, ab2 = _block_case(8, 8, 8, 64, 128, seed=1)
    kw = dict(quantize=False, tc=8, compute_dtype=jnp.float32,
              interpret=True)
    plain = np.asarray(fused_block2_pair(x, w1, ab1, w2, ab2, **kw))
    with kernel_mesh(_mesh()):
        sharded = np.asarray(jax.jit(
            lambda *a: fused_block2_pair(*a, **kw))(x, w1, ab1, w2, ab2))
    np.testing.assert_array_equal(sharded, plain)


def test_logmel_sharded_matches_plain():
    from texttoaudiogrounding_tpu.ops.frontend import LogMelConfig
    from texttoaudiogrounding_tpu.ops.pallas.logmel import (
        fused_log_mel_spectrogram,
    )
    cfg = LogMelConfig()
    rng = np.random.default_rng(2)
    wav = jnp.asarray(rng.normal(size=(8, 32000)) * 0.1, jnp.float32)
    plain = np.asarray(fused_log_mel_spectrogram(wav, cfg,
                                                 interpret=True))
    with kernel_mesh(_mesh()):
        sharded = np.asarray(jax.jit(
            lambda w: fused_log_mel_spectrogram(w, cfg, interpret=True))(
                wav))
    np.testing.assert_array_equal(sharded, plain)


def test_bigru_forward_sharded_matches_plain():
    from texttoaudiogrounding_tpu.ops.pallas.gru import bigru_pallas
    t, b, h = 10, 16, 32
    rng = np.random.default_rng(3)
    proj = jnp.asarray(rng.normal(size=(t, 2 * b, 3 * h)), jnp.float32)
    wh = jnp.asarray(rng.normal(size=(2, h, 3 * h)) * 0.1, jnp.float32)
    bn = jnp.asarray(rng.normal(size=(2, h)) * 0.1, jnp.float32)
    plain = np.asarray(bigru_pallas(proj, wh, bn, interpret=True))
    with kernel_mesh(_mesh()):
        sharded = np.asarray(jax.jit(
            lambda *a: bigru_pallas(*a, interpret=True))(proj, wh, bn))
    np.testing.assert_array_equal(sharded, plain)


def test_bigru_trainable_gradients_survive_shard_map():
    """The shard_map transpose must psum the replicated ``wh``/``bn``
    cotangents over the data axis; dproj shards are independent."""
    from texttoaudiogrounding_tpu.ops.pallas.gru import (
        bigru_pallas_trainable,
    )
    t, b, h = 8, 16, 32
    rng = np.random.default_rng(4)
    proj = jnp.asarray(rng.normal(size=(t, 2 * b, 3 * h)), jnp.float32)
    wh = jnp.asarray(rng.normal(size=(2, h, 3 * h)) * 0.1, jnp.float32)
    bn = jnp.asarray(rng.normal(size=(2, h)) * 0.1, jnp.float32)

    def loss(proj, wh, bn):
        return jnp.sum(
            jnp.sin(bigru_pallas_trainable(proj, wh, bn,
                                           interpret=True)))

    g_plain = jax.grad(loss, argnums=(0, 1, 2))(proj, wh, bn)
    with kernel_mesh(_mesh()):
        g_shard = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(proj, wh, bn)
    for name, a, b_ in zip(("dproj", "dwh", "dbn"), g_plain, g_shard):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=1e-5, atol=1e-6,
            err_msg=name)

    # the round-4 backward redesign shards identically (its post-walk
    # dWh einsum runs inside the per-shard function, so the transpose
    # still psums the replicated cotangents)
    from texttoaudiogrounding_tpu.ops.pallas.gru import (
        bigru_pallas_trainable_v2,
    )

    def loss2(proj, wh, bn):
        return jnp.sum(
            jnp.sin(bigru_pallas_trainable_v2(proj, wh, bn,
                                              interpret=True)))

    with kernel_mesh(_mesh()):
        g2 = jax.jit(jax.grad(loss2, argnums=(0, 1, 2)))(proj, wh, bn)
    for name, a, b_ in zip(("dproj", "dwh", "dbn"), g_plain, g2):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=1e-5, atol=1e-6,
            err_msg=name)


def test_non_divisible_batch_falls_back_to_plain():
    from texttoaudiogrounding_tpu.ops.pallas.conv_block import (
        fused_double_conv_pool,
    )
    x, w1, ab1, w2, ab2 = _block_case(3, 8, 8, 128, 128, seed=5)
    kw = dict(quantize=False, compute_dtype=jnp.float32, interpret=True)
    plain = np.asarray(fused_double_conv_pool(x, w1, ab1, w2, ab2,
                                              (2, 2), **kw))
    with kernel_mesh(_mesh()):   # B=3 doesn't divide 8 -> plain call
        got = np.asarray(fused_double_conv_pool(x, w1, ab1, w2, ab2,
                                                (2, 2), **kw))
    np.testing.assert_array_equal(got, plain)


def test_wrap_calls_restores_context():
    calls = []

    def probe():
        calls.append(active_kernel_mesh() is not None)

    wrap_calls(probe, _mesh())()
    probe()
    assert calls == [True, False]
    # trivial meshes return the function unwrapped
    assert wrap_calls(probe, None) is probe
    assert wrap_calls(probe, get_mesh(jax.devices()[:1])) is probe


@pytest.mark.parametrize("b1_quant", ["1", "0", "mixed"])
def test_mesh_serving_with_fused_kernels_matches_single(
        monkeypatch, b1_quant):
    """Full serving path: GroundingPredictor(mesh=...) with the fused
    int8 conv kernels + Pallas GRU routed (interpret mode via
    ``TTG_PALLAS_INTERPRET=1``) reproduces the single-device plain-XLA
    predictions within fused-serving tolerance.  ``b1_quant="0"`` pins
    the TTG_B1_QUANT=0 production combo (bf16 block1 inside int8
    serving — the round-5 on-chip winner); ``"mixed"`` pins the int8
    conv1 + bf16 conv2 block1 variant."""
    from texttoaudiogrounding_tpu.data.tokenizer import DictTokenizer
    from texttoaudiogrounding_tpu.data.vocabulary import Vocabulary
    from texttoaudiogrounding_tpu.inference import GroundingPredictor
    from texttoaudiogrounding_tpu.models import (BiEncoder, Cnn8Rnn,
                                                 EmbeddingAgg)
    from texttoaudiogrounding_tpu.models.match import DotProduct

    def build(dtype):
        model = BiEncoder(
            audio_encoder=Cnn8Rnn(sample_rate=32000, dtype=dtype),
            text_encoder=EmbeddingAgg(vocab_size=100, embed_dim=32),
            match_fn=DotProduct(), shared_dim=32, add_proj=True)
        return model

    init_batch = {"waveform": np.zeros((1, 32000), np.float32),
                  "waveform_len": np.array([32000]),
                  "text": np.zeros((1, 4), np.int32),
                  "text_len": np.array([4])}
    variables = build(jnp.float32).init(
        {"params": jax.random.PRNGKey(0)}, init_batch, train=False)
    vocab = Vocabulary()
    for w in ["<pad>", "<unk>", "a", "dog", "man", "speaking", "barks"]:
        vocab.add_word(w)
    tok = DictTokenizer(vocabulary=vocab)

    rng_np = np.random.default_rng(6)
    audio = rng_np.normal(size=(8, 32000)).astype(np.float32) * 0.1
    lens = np.full((8,), 32000)
    text = ["a dog barks"] * 8

    plain = GroundingPredictor(build(jnp.float32), variables, tok)
    p_plain = plain.predict(audio, lens, text)

    monkeypatch.setenv("TTG_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("TTG_FUSED_CONV", "int8")
    monkeypatch.setenv("TTG_B1_QUANT", b1_quant)
    sharded = GroundingPredictor(build(jnp.bfloat16), variables, tok,
                                 mesh=_mesh())
    p_shard = sharded.predict(audio, lens, text)
    assert p_shard.shape == p_plain.shape
    # int8/bf16 fused serving tolerance (STATUS.md parity-at-scale table)
    assert np.max(np.abs(p_shard - p_plain)) < 0.05


def test_bn_pool_vjp_sharded_grads_match():
    """bn_relu_dual_pool under the kernel mesh: fwd AND the full
    gradient set (x, scale, bias — incl. the psummed stat-grad
    partials) match the unsharded op."""
    from texttoaudiogrounding_tpu.ops.pallas.bn_pool import (
        bn_relu_dual_pool)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 8, 64, 64)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32)
    bias = jnp.asarray(rng.normal(size=64) * 0.1, jnp.float32)

    def f(x, s, b):
        out, _, _ = bn_relu_dual_pool(x, s, b, pool=(2, 2),
                                      interpret=True)
        return jnp.sum(out ** 2)

    ref, ref_g = jax.value_and_grad(f, argnums=(0, 1, 2))(x, scale, bias)
    with kernel_mesh(_mesh()):
        got, got_g = jax.value_and_grad(f, argnums=(0, 1, 2))(
            x, scale, bias)
    # sharded loss-sum reduction order differs (psum tree): ~3e-6 rel
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    for gg, rg in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rg),
                                   rtol=1e-5, atol=1e-5)
