from texttoaudiogrounding_tpu.ops.pallas.logmel import (
    fused_log_mel_spectrogram,
    pallas_supported,
)

__all__ = ["fused_log_mel_spectrogram", "pallas_supported"]
