"""On-device profiling: trace capture helpers and xplane analysis.

The reference's only tracing is ``record_function`` annotations
(``/root/reference/models.py:71,255,455,548,749``); the TPU framework
mirrors those boundaries with ``jax.named_scope`` (see
``avr_tpu/models/pixelnerf.py``) and adds what the reference lacks — an
offline analyzer for the traces ``jax.profiler`` captures, so kernel work
targets measured device time instead of wall-clock guesses.

``xplane_pb2`` is generated from ``xplane.proto`` (a minimal mirror of the
public tsl xplane schema) because the installed tensorboard profile plugin
cannot decode current traces in this environment.
"""

from avr_tpu.profiling.analyze import op_breakdown, print_breakdown  # noqa: F401
