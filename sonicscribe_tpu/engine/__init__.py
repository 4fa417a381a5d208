from sonicscribe_tpu.engine.transcriber import Transcriber  # noqa: F401
