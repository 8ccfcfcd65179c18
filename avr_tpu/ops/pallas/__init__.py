from avr_tpu.ops.pallas.gather import gather_bilinear  # noqa: F401
