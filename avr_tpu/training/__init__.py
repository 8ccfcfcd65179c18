from avr_tpu.training.loss import loss_fn, LossParams  # noqa: F401
