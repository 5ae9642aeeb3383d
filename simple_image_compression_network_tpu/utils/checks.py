"""Static validation — the HLS pragma-discipline analog (SURVEY.md §5).

The reference guards shape/divisibility preconditions with CASSERT_DATAFLOW
(bnn-library.h:55) and asserts race-freedom with DEPENDENCE pragmas; here the
equivalents are chex-style static asserts run at trace time, plus a
determinism check for collective/sharded computations (re-run and compare —
XLA TPU reductions are deterministic, so any mismatch indicates a real race
or nondeterministic lowering).
"""

from __future__ import annotations

from typing import Callable, Sequence

import chex
import jax
import numpy as np


def assert_divisible(value: int, by: int, what: str = "dim") -> None:
    if value % by:
        raise ValueError(f"{what}={value} must be divisible by {by} "
                         f"(CASSERT_DATAFLOW analog)")


def assert_feature_map(x, channels: int | None = None) -> None:
    """Feature maps are rank-4 (N, X, Y, C)."""
    chex.assert_rank(x, 4)
    if channels is not None:
        chex.assert_axis_dimension(x, 3, channels)


def assert_int8_wire(x) -> None:
    chex.assert_type(x, [np.int8, np.uint8])


def assert_deterministic(fn: Callable, *args, runs: int = 2) -> None:
    """Run `fn` repeatedly and require bit-identical outputs."""
    ref = jax.tree.map(np.asarray, fn(*args))
    for _ in range(runs - 1):
        out = jax.tree.map(np.asarray, fn(*args))
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
            np.testing.assert_array_equal(a, b)
