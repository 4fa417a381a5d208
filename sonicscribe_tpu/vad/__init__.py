from sonicscribe_tpu.vad.model import EnergyVad, SileroVad  # noqa: F401
from sonicscribe_tpu.vad.segments import SpeechTimestamp, get_speech_timestamps  # noqa: F401
from sonicscribe_tpu.vad.gate import VadGate, VadGateConfig  # noqa: F401
