from sonicscribe_tpu.ops.quant import matmul, quantize_params_int8  # noqa: F401
