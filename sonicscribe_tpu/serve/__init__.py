from sonicscribe_tpu.serve.app import build_app, main  # noqa: F401
