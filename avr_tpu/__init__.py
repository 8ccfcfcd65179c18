"""avr_tpu — a TPU-native differentiable volume-rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``yankeesong/adaptive-volume-rendering`` (see SURVEY.md): an
image-conditioned PixelNeRF-style radiance field rendered by three
differentiable renderers (classic coarse/fine volume rendering, an LSTM
ray-marcher, and the adaptive epsilon-band renderer), trained on SRN-style
HDF5 scene datasets.

Design stance (TPU-first, not a port):
  * pure-functional: parameters and conditioning are explicit pytrees,
    randomness threads explicit PRNG keys,
  * everything hot compiles under ``jax.jit`` with static shapes,
  * sequential ray-march steps are ``lax.scan`` bodies,
  * multi-chip scaling via ``jax.sharding.Mesh`` (axes ``data``/``rays``)
    with XLA collectives over ICI — no hand-rolled comm,
  * bf16 compute / fp32 accumulation where it matters,
  * Pallas TPU kernels for the gather-heavy hot ops.
"""

__version__ = "0.1.0"

from avr_tpu.config import Conf, parse_conf, parse_conf_string  # noqa: F401
