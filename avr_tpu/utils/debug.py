"""Numerical debugging helpers (the framework's sanitizer layer).

The reference's only tools are ``torch.autograd.set_detect_anomaly`` and a
NaN->1e-6 loss guard (SURVEY.md §5).  TPU-native equivalents:

  * :func:`enable_nan_debugging` — ``jax.config.jax_debug_nans`` (every
    jitted function re-runs op-by-op on NaN and points at the culprit),
  * :func:`checked` — wrap a function with ``jax.experimental.checkify``
    to surface NaN/inf/OOB errors as real Python exceptions from compiled
    code,
  * Pallas kernels accept ``interpret=True`` for op-by-op kernel
    debugging (see ``avr_tpu/ops/pallas``).
"""

from __future__ import annotations

from typing import Callable

import jax

__all__ = ["enable_nan_debugging", "checked"]


def enable_nan_debugging(enabled: bool = True) -> None:
    jax.config.update("jax_debug_nans", enabled)


def checked(fn: Callable, *, errors=None) -> Callable:
    """Wrap ``fn`` so float/index errors raise instead of propagating NaNs.

    Usage::

        safe_step = checked(train_step)
        state, metrics = safe_step(state, ...)   # raises on NaN/inf/OOB
    """
    from jax.experimental import checkify

    if errors is None:
        errors = checkify.float_checks | checkify.index_checks

    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
