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


@pytest.mark.parametrize("digits,vmax", [(3, 1 << 21), (4, 1 << 24)])
def test_take0_extra_digits(digits, vmax):
    """digits=3/4 packing planes stay exact up to the f32 integer cap."""
    C, E, R = 517, 300, 12
    rng = np.random.default_rng(digits)
    table = rng.integers(0, vmax, size=(C, R), dtype=np.int32)
    table[0] = vmax - 1
    idx = rng.integers(0, C, size=(E, R), dtype=np.int32)
    got = np.asarray(take0(jnp.asarray(table), jnp.asarray(idx),
                           interpret=True, digits=digits))
    want = np.take_along_axis(table, idx, axis=0)
    np.testing.assert_array_equal(got, want)


def test_bond_fetch_multi_packed_matches_plain():
    """The packed multi-table fetch (one take0 with extra digit planes)
    must be bit-identical to per-table fetches, including sentinel-width
    tables like the diagonal prep's (v0, v1, cls) triple."""
    from isingmontecarlo_tpu.sse.tables import bond_fetch_multi

    rng = np.random.default_rng(7)
    NB, M, R = 3072, 700, 16
    sent = 1024
    v0 = rng.integers(0, sent + 1, size=NB).astype(np.int32)
    v1 = rng.integers(0, sent + 1, size=NB).astype(np.int32)
    cls = rng.integers(0, 3, size=NB).astype(np.int32)
    idx = jnp.asarray(rng.integers(0, NB, size=(M, R)).astype(np.int32))
    tabs = [jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(cls)]
    got = bond_fetch_multi(tabs, idx, [sent, sent, 2], on_tpu=True)
    want = bond_fetch_multi(tabs, idx, [sent, sent, 2], on_tpu=False)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
