"""Exactness of the Pallas per-replica gather kernel (interpret mode on CPU)
against ``jnp.take_along_axis`` — the reference semantics used everywhere in
``sse/cluster.py::_take0_fast``."""

import jax.numpy as jnp
import numpy as np
import pytest

from isingmontecarlo_tpu.ops.take_kernel import take0


@pytest.mark.parametrize(
    "C,E,R",
    [
        (7, 5, 3),          # tiny, heavy padding in every axis
        (128, 128, 8),      # exactly one digit plane
        (129, 200, 64),     # H = 2 boundary
        (1500, 2100, 64),   # mid-size, E != C
        (5152, 5152, 64),   # the 32^2 label application shape
        (300, 40, 130),     # R above one replica block
    ],
)
def test_take0_matches_take_along_axis(C, E, R):
    rng = np.random.default_rng(C * 1000 + E + R)
    table = rng.integers(0, min(C, 1 << 14), size=(C, R), dtype=np.int32)
    idx = rng.integers(0, C, size=(E, R), dtype=np.int32)
    got = np.asarray(take0(jnp.asarray(table), jnp.asarray(idx),
                           interpret=True))
    want = np.take_along_axis(table, idx, axis=0)
    np.testing.assert_array_equal(got, want)


def test_take0_max_values_exact():
    """Values and indices at the 2^14-1 extreme stay exact through the bf16
    digit planes."""
    C, E, R = 16384, 64, 4
    rng = np.random.default_rng(0)
    table = rng.integers(0, 1 << 14, size=(C, R), dtype=np.int32)
    table[-1] = (1 << 14) - 1
    idx = rng.integers(0, C, size=(E, R), dtype=np.int32)
    idx[0] = C - 1
    got = np.asarray(take0(jnp.asarray(table), jnp.asarray(idx),
                           interpret=True))
    np.testing.assert_array_equal(got, np.take_along_axis(table, idx, axis=0))
