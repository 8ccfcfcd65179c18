"""Regression tests for the round-4 order-dependent flake (VERDICT weak #1).

Mechanism (round-5 bisect, 3-step reproduction):
  1. test_cli_and_eval's module-scoped ``trained`` fixture runs the train
     CLI, which sets ``jax_default_prng_impl='rbg'`` process-wide;
  2. pytest instantiates module-scoped fixtures BEFORE function-scoped
     autouse ones, so the old isolation fixture snapshotted the leaked
     'rbg' as the value to "restore" — the leak became permanent;
  3. under rbg, RngBitGenerator draws are partition-dependent, so
     test_parallel's single-chip-vs-2x4-mesh agreement test genuinely
     diverged (confirmed: the test fails in ISOLATION with rbg forced,
     passes with threefry).  It was never fp tolerance noise.

conftest now resets the impl on both sides of every test; these tests
pin that behaviour.  They must run in this order (pytest preserves
in-file definition order).
"""

import jax

from tests.conftest import _SESSION_PRNG_IMPL


def test_a_simulate_cli_prng_leak():
    """Deliberately leak a non-default PRNG impl (what cli.train.main
    does when invoked from a module-scoped fixture)."""
    jax.config.update("jax_default_prng_impl", "rbg")
    assert jax.config.jax_default_prng_impl == "rbg"


def test_b_leak_is_gone_before_the_next_test():
    """The autouse isolation fixture must have reset the impl at setup."""
    assert jax.config.jax_default_prng_impl == _SESSION_PRNG_IMPL
