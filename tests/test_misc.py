"""SWA, multi-host feed helper, audio export tools."""

import numpy as np
import jax.numpy as jnp

from texttoaudiogrounding_tpu.training.swa import SWAState
from texttoaudiogrounding_tpu.training.train_state import TrainState


def _state(value):
    return TrainState(params={"w": jnp.full((3,), float(value))},
                      batch_stats={"m": jnp.full((2,), float(value))},
                      opt_state=None, step=0)


def test_swa_averages_params_and_stats():
    swa = SWAState.create(_state(0.0))
    for v in (1.0, 2.0, 3.0):
        swa = swa.update(_state(v))
    np.testing.assert_allclose(np.asarray(swa.params["w"]), 2.0)
    np.testing.assert_allclose(np.asarray(swa.batch_stats["m"]), 2.0)
    assert int(swa.n_averaged) == 3
    out = swa.as_train_state(_state(9.0))
    np.testing.assert_allclose(np.asarray(out.params["w"]), 2.0)


def test_global_batch_from_local_single_process(rng):
    import jax

    from texttoaudiogrounding_tpu.parallel.mesh import (
        get_mesh,
        global_batch_from_local,
    )
    mesh = get_mesh()
    batch = {"x": rng.normal(size=(8, 4)).astype(np.float32),
             "meta": ["a"] * 8}
    out = global_batch_from_local(batch, mesh)
    np.testing.assert_allclose(np.asarray(out["x"]), batch["x"])
    assert out["meta"] == batch["meta"]


def test_write_audio_roundtrip(tmp_path, rng):
    import h5py
    from scipy.io import wavfile

    from texttoaudiogrounding_tpu.tools.pack_waveform import write_audio

    wav = (rng.normal(size=16000) * 0.1).astype(np.float32)
    with h5py.File(tmp_path / "w.h5", "w") as hf:
        hf["Yx.wav"] = wav
    with open(tmp_path / "w.csv", "w") as f:
        f.write("audio_id\thdf5_path\n")
        f.write(f"Yx.wav\t{tmp_path / 'w.h5'}\n")
    write_audio(str(tmp_path / "w.csv"), str(tmp_path / "out"))
    sr, data = wavfile.read(tmp_path / "out" / "Yx.wav")
    assert sr == 32000
    np.testing.assert_allclose(data / 32767.0, wav, atol=1e-4)
