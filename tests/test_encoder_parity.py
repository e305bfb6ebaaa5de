"""Full Cnn8Rnn pipeline parity vs a live torch replica (eval mode).

The torch module mirrors the reference structure and state-dict names
(models/audio_encoder.py:89-232, models/panns.py:20-62) and consumes the
same log-mel features our frontend produces; its weights are imported into
our flax encoder via training.torch_import.  This pins the whole chain:
bn0-over-mel → 4 ConvBlocks (avg+max) → mel-mean → fc1+ReLU → BiGRU.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.models import Cnn8Rnn
from texttoaudiogrounding_tpu.ops.frontend import (
    cnn8rnn_mel_config,
    log_mel_spectrogram_numpy,
)
from texttoaudiogrounding_tpu.training.torch_import import (
    import_cnn8rnn,
    merge_into_variables,
)


class TorchConvBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.bn2 = tnn.BatchNorm2d(cout)

    def forward(self, x, pool_size):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        return (tF.avg_pool2d(x, pool_size)
                + tF.max_pool2d(x, pool_size))


class TorchCnn8Rnn(tnn.Module):
    """Reference-shaped encoder from log-mel onward."""

    def __init__(self):
        super().__init__()
        self.bn0 = tnn.BatchNorm2d(64)
        self.conv_block1 = TorchConvBlock(1, 64)
        self.conv_block2 = TorchConvBlock(64, 128)
        self.conv_block3 = TorchConvBlock(128, 256)
        self.conv_block4 = TorchConvBlock(256, 512)
        self.fc1 = tnn.Linear(512, 512)
        self.rnn = tnn.GRU(512, 256, bidirectional=True, batch_first=True)

    def forward(self, mel):  # mel: [B, T, 64]
        x = mel.unsqueeze(1)              # [B, 1, T, M]
        x = self.bn0(x.transpose(1, 3)).transpose(1, 3)
        x = self.conv_block1(x, (2, 2))
        x = self.conv_block2(x, (2, 2))
        x = self.conv_block3(x, (1, 2))
        x = self.conv_block4(x, (1, 2))
        x = torch.mean(x, dim=3).transpose(1, 2)   # [B, T/4, 512]
        x = torch.relu(self.fc1(x))
        x, _ = self.rnn(x)
        return x


def test_full_encoder_parity(rng):
    torch.manual_seed(0)
    tmodel = TorchCnn8Rnn()
    # non-trivial BN running stats
    for module in tmodel.modules():
        if isinstance(module, tnn.BatchNorm2d):
            module.running_mean.normal_(0, 0.5)
            module.running_var.uniform_(0.5, 1.5)
    tmodel.eval()

    n = 32000
    wav = (rng.normal(size=(2, n)) * 0.1).astype(np.float32)
    cfg = cnn8rnn_mel_config(32000)
    mel = log_mel_spectrogram_numpy(wav, cfg).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.tensor(mel)).numpy()

    model = Cnn8Rnn(sample_rate=32000)
    batch = {"waveform": jnp.asarray(wav),
             "waveform_len": jnp.array([n, n])}
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    imported = import_cnn8rnn(
        {k: v for k, v in tmodel.state_dict().items()})
    skipped = []
    merged = merge_into_variables(variables, imported,
                                  log_fn=lambda m: skipped.append(m))
    assert not skipped, skipped
    out = model.apply(merged, batch)
    j_out = np.asarray(out["embedding"])

    assert j_out.shape == t_out.shape
    # frontends agree to ~1e-5 dB; conv/BN/GRU chains amplify slightly
    np.testing.assert_allclose(j_out, t_out, rtol=1e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(out["length"]), [25, 25])
