from sonicscribe_tpu.audio.wav import read_wav, write_wav  # noqa: F401
from sonicscribe_tpu.audio.resample import resample  # noqa: F401
from sonicscribe_tpu.audio.mel import MelConfig, log_mel_spectrogram  # noqa: F401
