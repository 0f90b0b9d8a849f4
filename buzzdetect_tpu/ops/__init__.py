from buzzdetect_tpu.ops.resample import resample  # noqa: F401
from buzzdetect_tpu.ops.frontend import (  # noqa: F401
    FrontendConfig, log_mel_spectrogram, log_mel_patches, pad_waveform,
    padded_length, num_stft_frames, num_patches)
