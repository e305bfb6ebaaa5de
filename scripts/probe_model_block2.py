"""Real-model serving time with block2 pair kernel on/off (real chip).

Patches audio_encoder._fused_conv_modes between jit traces to isolate
the block2 routing delta inside the full flagship forward.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("TTG_FUSED_CONV", "int8")

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


def main():
    from __graft_entry__ import _example_batch, _flagship_model
    from texttoaudiogrounding_tpu.models import audio_encoder

    model = _flagship_model(serving=True)
    batch = _example_batch(batch_size=128)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    jbatch = jax.device_put(batch)

    orig = audio_encoder._fused_conv_modes

    for name, modes in [
        ("b2 XLA  (r2 default)", (False, False, "int8", "int8")),
        ("b2 pair int8        ", (False, "int8", "int8", "int8")),
        ("b2 pair only        ", (False, "int8", False, False)),
        ("all XLA             ", (False, False, False, False)),
    ]:
        audio_encoder._fused_conv_modes = lambda d, t, _m=modes: _m

        def fwd(variables, batch, carry):
            b = dict(batch)
            b["waveform"] = b["waveform"] + carry
            out = model.apply(variables, b, train=False)
            return out["frame_sim"], out["frame_sim"][0, 0] * 0.0

        ms = timeit(jax.jit(fwd), (variables, jbatch))
        print(f"{name}: {ms:7.2f} ms  ({128 / ms * 1000:6.1f} clips/s)")
    audio_encoder._fused_conv_modes = orig


if __name__ == "__main__":
    main()
