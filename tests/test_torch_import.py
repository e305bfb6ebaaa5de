"""torch→flax checkpoint import: numerical parity against live torch
modules (GRU gate mapping, conv/BN layout, full-tree merge)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.models.layers import BiGRU, ConvBlock
from texttoaudiogrounding_tpu.training.torch_import import (
    _bn,
    _conv,
    _gru_cell,
    import_bigru,
    merge_into_variables,
)


def test_bigru_parity(rng):
    """Bidirectional GRU over a padded sequence must match torch exactly
    (gate mapping incl. the b_ir + b_hr bias fold)."""
    torch.manual_seed(0)
    tgru = tnn.GRU(8, 4, bidirectional=True, batch_first=True)
    tgru.eval()
    sd = {f"rnn.{k}": v for k, v in tgru.state_dict().items()}

    x = rng.normal(size=(3, 7, 8)).astype(np.float32)
    with torch.no_grad():
        t_out, _ = tgru(torch.tensor(x))

    model = BiGRU(4)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x))
    params = import_bigru(sd, "rnn")
    merged = merge_into_variables(variables, {"params": params})
    j_out = model.apply(merged, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_conv_block_parity(rng):
    """ConvBlock conv+BN import must match a torch double-conv block in
    eval mode (running stats used)."""

    class TorchBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 8, 3, padding=1, bias=False)
            self.bn1 = tnn.BatchNorm2d(8)
            self.conv2 = tnn.Conv2d(8, 8, 3, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(8)

        def forward(self, x):
            x = torch.relu(self.bn1(self.conv1(x)))
            x = torch.relu(self.bn2(self.conv2(x)))
            a = torch.nn.functional.avg_pool2d(x, 2)
            m = torch.nn.functional.max_pool2d(x, 2)
            return a + m

    torch.manual_seed(1)
    tblock = TorchBlock()
    # non-trivial running stats
    tblock.bn1.running_mean.normal_()
    tblock.bn1.running_var.uniform_(0.5, 2.0)
    tblock.eval()
    sd = tblock.state_dict()

    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)  # NCHW
    with torch.no_grad():
        t_out = tblock(torch.tensor(x))

    model = ConvBlock(8)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x_nhwc,
                           bn_train=False)
    params = {"conv1": _conv(sd, "conv1"), "conv2": _conv(sd, "conv2")}
    stats = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    params["bn2"], stats["bn2"] = _bn(sd, "bn2")
    merged = merge_into_variables(
        variables, {"params": params, "batch_stats": stats})
    j_out = model.apply(merged, x_nhwc, bn_train=False)
    np.testing.assert_allclose(np.asarray(j_out),
                               t_out.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_full_cnn8rnn_import_structure(rng):
    """A synthetic torch-style Cnn8Rnn state dict must merge completely
    (no skipped keys) into our Cnn8Rnn variables."""
    from texttoaudiogrounding_tpu.models import Cnn8Rnn
    from texttoaudiogrounding_tpu.training.torch_import import \
        import_cnn8rnn

    tr = np.random.default_rng(0)
    sd = {}

    def bn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = tr.normal(size=c).astype(np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    bn("bn0", 64)
    chans = [(1, 64), (64, 128), (128, 256), (256, 512)]
    for i, (cin, cout) in enumerate(chans, 1):
        sd[f"conv_block{i}.conv1.weight"] = tr.normal(
            size=(cout, cin, 3, 3)).astype(np.float32)
        sd[f"conv_block{i}.conv2.weight"] = tr.normal(
            size=(cout, cout, 3, 3)).astype(np.float32)
        bn(f"conv_block{i}.bn1", cout)
        bn(f"conv_block{i}.bn2", cout)
    sd["fc1.weight"] = tr.normal(size=(512, 512)).astype(np.float32)
    sd["fc1.bias"] = np.zeros(512, np.float32)
    for suffix in ("", "_reverse"):
        sd[f"rnn.weight_ih_l0{suffix}"] = tr.normal(
            size=(768, 512)).astype(np.float32) * 0.01
        sd[f"rnn.weight_hh_l0{suffix}"] = tr.normal(
            size=(768, 256)).astype(np.float32) * 0.01
        sd[f"rnn.bias_ih_l0{suffix}"] = np.zeros(768, np.float32)
        sd[f"rnn.bias_hh_l0{suffix}"] = np.zeros(768, np.float32)

    model = Cnn8Rnn(sample_rate=32000)
    batch = {"waveform": jnp.zeros((1, 32000)),
             "waveform_len": jnp.array([32000])}
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    imported = import_cnn8rnn(sd)
    skipped = []
    merged = merge_into_variables(variables, imported,
                                  log_fn=lambda m: skipped.append(m))
    assert not skipped, skipped
    out = model.apply(merged, batch)
    assert np.isfinite(np.asarray(out["embedding"])).all()


def test_export_bigru_torch_parity(rng):
    """flax→torch BiGRU export: strict-loads into ``nn.GRU`` and matches
    the flax forward exactly (the inverse bias split is algebraically
    identical), and round-trips through import_bigru bit-exactly."""
    from texttoaudiogrounding_tpu.training.torch_import import \
        export_bigru

    x = rng.normal(size=(3, 7, 8)).astype(np.float32)
    model = BiGRU(4)
    variables = model.init({"params": jax.random.PRNGKey(7)},
                           jnp.asarray(x))
    sd = export_bigru(
        jax.tree.map(np.asarray, variables["params"]), "rnn")

    tgru = tnn.GRU(8, 4, bidirectional=True, batch_first=True)
    tgru.load_state_dict({k[len("rnn."):]: torch.as_tensor(v)
                          for k, v in sd.items()}, strict=True)
    tgru.eval()
    with torch.no_grad():
        t_out, _ = tgru(torch.tensor(x))
    j_out = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-5, atol=1e-6)

    back = import_bigru(sd, "rnn")
    jax.tree.map(np.testing.assert_array_equal, back,
                 jax.tree.map(np.asarray, variables["params"]))


def test_export_cnn8rnn_roundtrip_and_pth(rng, tmp_path):
    """flax→torch Cnn8Rnn export round-trips through import_cnn8rnn
    bit-exactly (covers every mapped leaf, no merge skips) and survives
    the reference ``.pth`` container format on disk."""
    from texttoaudiogrounding_tpu.models import Cnn8Rnn
    from texttoaudiogrounding_tpu.training.torch_import import (
        export_cnn8rnn,
        import_cnn8rnn,
        load_torch_state_dict,
        save_torch_checkpoint,
    )

    model = Cnn8Rnn(sample_rate=32000)
    batch = {"waveform": jnp.asarray(
                 rng.normal(size=(1, 32000)).astype(np.float32)),
             "waveform_len": jnp.array([32000])}
    variables = model.init({"params": jax.random.PRNGKey(3)}, batch)
    # non-trivial running stats so the BN export is exercised
    variables = jax.tree.map(np.asarray, variables)
    for block in variables["batch_stats"].values():
        for stats in (block.values()
                      if "mean" not in block else [block]):
            stats["mean"] = rng.normal(
                size=stats["mean"].shape).astype(np.float32)
            stats["var"] = rng.uniform(
                0.5, 2.0, size=stats["var"].shape).astype(np.float32)

    sd = export_cnn8rnn(variables)
    path = tmp_path / "model.pth"
    save_torch_checkpoint(path, sd)
    loaded = load_torch_state_dict(path)

    back = import_cnn8rnn(loaded)
    skipped = []
    merged = merge_into_variables(variables, back,
                                  log_fn=lambda m: skipped.append(m))
    assert not skipped, skipped
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        merged, variables)


def test_export_biencoder_roundtrip(rng):
    """BiEncoder(Cnn8Rnn + EmbeddingAgg + projections) exports to the
    reference state-dict names and round-trips bit-exactly."""
    from texttoaudiogrounding_tpu.models import Cnn8Rnn
    from texttoaudiogrounding_tpu.models.audio_text_model import BiEncoder
    from texttoaudiogrounding_tpu.models.match import DotProduct
    from texttoaudiogrounding_tpu.models.text_encoder import EmbeddingAgg
    from texttoaudiogrounding_tpu.training.torch_import import (
        export_biencoder,
        import_biencoder,
    )

    model = BiEncoder(audio_encoder=Cnn8Rnn(sample_rate=32000),
                      text_encoder=EmbeddingAgg(vocab_size=50,
                                                embed_dim=256),
                      match_fn=DotProduct(), shared_dim=512,
                      add_proj=True)
    batch = {"waveform": jnp.asarray(
                 rng.normal(size=(1, 32000)).astype(np.float32)),
             "waveform_len": jnp.array([32000]),
             "text": jnp.zeros((1, 4), jnp.int32),
             "text_len": jnp.array([4])}
    variables = jax.tree.map(
        np.asarray,
        model.init({"params": jax.random.PRNGKey(5)}, batch, train=False))

    sd = export_biencoder(variables)
    assert "audio_encoder.conv_block1.conv1.weight" in sd
    assert "text_encoder.embedding.core.weight" in sd
    assert "audio_proj.weight" in sd and "text_proj.weight" in sd

    back = import_biencoder(sd)
    skipped = []
    merged = merge_into_variables(variables, back,
                                  log_fn=lambda m: skipped.append(m))
    assert not skipped, skipped
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        merged, variables)
