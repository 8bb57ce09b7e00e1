"""RVB update tests — mirrors the reference's crash-test strategy
(``tests/check_rvb_crash.rs``: verify after *every* timestep on periodic and
frustrated lattices across seeds; ``tests/longitudinal_crash.rs``: the same
with h != 0) plus physics assertions against exact diagonalization.
"""

import itertools

import numpy as np
import pytest

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import QmcIsingGraph
from tests.test_sse import exact_tfim_energy


class TestRvbCrash:
    """Seeded soak + verify oracle (check_rvb_crash.rs:310-313 pattern)."""

    @pytest.mark.parametrize("seed", [0, 1])
    def test_3x3_periodic(self, seed):
        edges = lattice.square(3, 3, j=1.0)
        g = QmcIsingGraph(edges, transverse=1.0, replicas=16, seed=seed)
        g.set_run_rvb(True, updates_per_timestep=5)
        for _ in range(8):
            g.timestep(1.0)
            assert g.verify(), "worldline integrity broken by RVB"

    def test_4x4_frustrated(self):
        edges = lattice.frustrated_square(4, 4, j=1.0)
        g = QmcIsingGraph(edges, transverse=2.0, replicas=16, seed=3)
        g.set_run_rvb(True, updates_per_timestep=5)
        for _ in range(8):
            g.timestep(1.0)
            assert g.verify()

    @pytest.mark.parametrize("seed,h", list(itertools.product([0, 1], [0.3, -0.4])))
    def test_longitudinal(self, seed, h):
        """longitudinal_crash.rs pattern: h != 0 freezes longitudinal-op
        clusters; RVB must still preserve worldline integrity and positive
        weights."""
        edges = lattice.square(3, 3, j=1.0)
        g = QmcIsingGraph(
            edges, transverse=1.0, longitudinal=h, replicas=16, seed=seed
        )
        g.set_run_rvb(True, updates_per_timestep=5)
        for _ in range(8):
            g.timestep(1.0)
            assert g.verify()

    def test_single_rvb_sweep_and_rate(self):
        edges = lattice.square(3, 3, j=1.0)
        g = QmcIsingGraph(edges, transverse=1.0, replicas=16, seed=7)
        for _ in range(5):
            g.timestep(1.0)
        succ, counted = g.single_rvb_sweep(4)
        assert g.verify()
        assert counted == 4 * 16
        assert 0 <= succ <= counted
        assert 0.0 <= g.rvb_success_rate() <= 1.0


class TestRvbPhysics:
    def test_energy_matches_ed_with_rvb(self):
        """RVB must not bias the stationary distribution: <E> on a 4-site ring
        with RVB enabled matches exact diagonalization."""
        edges = lattice.chain(4, j=1.0)
        beta, gamma = 1.5, 1.0
        exact = exact_tfim_energy(edges, gamma, 0.0, beta, 4)
        # Generous fixed cutoff: avoids mid-run regrowth recompiles.
        g = QmcIsingGraph(edges, transverse=gamma, cutoff=96, replicas=128, seed=11)
        g.set_run_rvb(True, updates_per_timestep=2)
        g.timesteps(48, beta, chunk=48)  # equilibrate
        e = g.timesteps(192, beta, chunk=48)
        mean = float(np.mean(np.asarray(e)))
        sem = float(np.std(np.asarray(e)) / np.sqrt(e.shape[0]))
        assert mean == pytest.approx(exact, abs=max(5 * sem, 0.15)), (
            f"RVB-biased energy: {mean} vs exact {exact} (sem {sem})"
        )

    def test_energy_matches_ed_with_rvb_longitudinal(self):
        edges = lattice.chain(4, j=1.0)
        beta, gamma, h = 1.5, 1.0, 0.4
        exact = exact_tfim_energy(edges, gamma, h, beta, 4)
        g = QmcIsingGraph(
            edges, transverse=gamma, longitudinal=h, cutoff=96, replicas=128,
            seed=13,
        )
        g.set_run_rvb(True, updates_per_timestep=2)
        g.timesteps(48, beta, chunk=48)
        e = g.timesteps(192, beta, chunk=48)
        mean = float(np.mean(np.asarray(e)))
        sem = float(np.std(np.asarray(e)) / np.sqrt(e.shape[0]))
        assert mean == pytest.approx(exact, abs=max(5 * sem, 0.15)), (
            f"RVB-biased energy: {mean} vs exact {exact} (sem {sem})"
        )
