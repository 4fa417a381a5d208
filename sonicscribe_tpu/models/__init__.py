from sonicscribe_tpu.models.config import (  # noqa: F401
    AudioEncoderConfig,
    DecoderConfig,
    GlmAsrConfig,
    nano,
    tiny,
)
