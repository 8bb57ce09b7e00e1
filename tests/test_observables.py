"""State-observable estimators (analysis/observables.py): exact values on
hand-built states and physics sanity on sampled SSE trajectories."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.analysis import (
    binder_cumulant,
    magnetization,
    magnetization_squared,
    spin_spin_correlation,
    structure_factor,
)
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph


class TestExactSmallCases:
    def test_magnetization(self):
        s = jnp.array([[True, True, False, True], [False, False, False, False]])
        m = np.asarray(magnetization(s))
        assert np.allclose(m, [2.0, -4.0])
        assert np.allclose(np.asarray(magnetization_squared(s)), [4.0, 16.0])

    def test_binder_limits(self):
        # All-aligned states: m is constant -> <m^4> = <m^2>^2 -> U4 = 2/3.
        s = jnp.ones((10, 2, 6), bool)
        u = np.asarray(binder_cumulant(s))
        assert np.allclose(u, 2.0 / 3.0, atol=1e-6)

    def test_correlation_aligned_ring(self):
        s = jnp.ones((1, 1, 8), bool)
        c = np.asarray(spin_spin_correlation(s))
        assert np.allclose(c, 1.0, atol=1e-6)
        sq = np.asarray(structure_factor(s))
        # All weight in the q=0 bin: S(0) = N.
        assert sq[0] == pytest.approx(8.0, abs=1e-5)
        assert np.allclose(sq[1:], 0.0, atol=1e-5)

    def test_correlation_neel(self):
        # Alternating spins: C[d] = (-1)^d.
        s = jnp.asarray((np.arange(8) % 2 == 0))[None, None, :]
        c = np.asarray(spin_spin_correlation(s))
        assert np.allclose(c, [1, -1, 1, -1, 1, -1, 1, -1], atol=1e-6)


class TestPhysicsSanity:
    def test_ferromagnetic_chain_orders_at_low_T(self):
        g = QmcIsingGraph(
            lattice.chain(8, j=-1.0), transverse=0.3, replicas=32, seed=3
        )
        states, _ = g.timesteps_sample(120, beta=6.0)
        tail = jnp.asarray(states[len(states) // 2:])
        m2 = float(np.mean(np.asarray(magnetization_squared(tail)))) / 64.0
        assert m2 > 0.6, m2  # strongly ordered
        c = np.asarray(spin_spin_correlation(tail))
        assert c[1] > 0.5 and c[4] > 0.4
        u = np.asarray(binder_cumulant(tail))
        assert np.mean(u) > 0.5  # near the ordered-limit 2/3
