"""Parallel tempering + autocorrelation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.analysis import (
    bond_autocorrelation,
    fft_autocorrelation,
    spin_autocorrelation,
)
from isingmontecarlo_tpu.parallel import TemperingContainer, tempering_step


class TestTemperingStep:
    def test_preserves_beta_multiset(self):
        betas = jnp.asarray(np.random.RandomState(0).uniform(0.1, 2.0, 16), jnp.float32)
        n = jnp.asarray(np.random.RandomState(1).randint(0, 50, 16), jnp.int32)
        perm, swaps = tempering_step(n, betas, jax.random.key(0), 0)
        nb = betas[perm]
        assert sorted(np.asarray(nb).tolist()) == sorted(np.asarray(betas).tolist())

    def test_equal_n_always_swaps(self):
        # (beta_a/beta_b)^0 = 1: every pair swaps.
        betas = jnp.asarray([0.5, 1.0, 1.5, 2.0], jnp.float32)
        n = jnp.zeros(4, jnp.int32)
        perm, swaps = tempering_step(n, betas, jax.random.key(1), 0)
        nb = betas[perm]
        assert int(swaps) == 2
        np.testing.assert_allclose(np.asarray(nb), [1.0, 0.5, 2.0, 1.5])

    def test_odd_parity_pairs(self):
        betas = jnp.asarray([0.5, 1.0, 1.5, 2.0], jnp.float32)
        n = jnp.zeros(4, jnp.int32)
        perm, swaps = tempering_step(n, betas, jax.random.key(2), 1)
        nb = betas[perm]
        assert int(swaps) == 1
        np.testing.assert_allclose(np.asarray(nb), [0.5, 1.5, 1.0, 2.0])

    def test_large_n_gap_blocks_swap(self):
        # Cold chain with many ops vs hot chain with none: p ~ (bh/bc)^(nc) << 1.
        betas = jnp.asarray([0.1, 10.0], jnp.float32)
        n = jnp.asarray([0, 200], jnp.int32)
        swaps = 0
        for s in range(20):
            _, sw = tempering_step(n, betas, jax.random.key(s), 0)
            swaps += int(sw)
        assert swaps == 0


class TestTemperingContainer:
    def test_ensemble_runs_and_orders(self):
        edges = lattice.frustrated_square(4, 4)
        tc = TemperingContainer(
            edges, transverse=1.0, betas=[0.2, 0.5, 1.0, 2.0],
            replicas_per_beta=2, seed=0,
        )
        states, betas = tc.timesteps_sample(20, swap_freq=2, sampling_freq=5)
        assert states.shape[0] == 4
        assert tc.verify()
        # Cold replicas should carry more ops than hot ones.
        by_t, bs = tc.states_by_temperature()
        n = np.asarray(tc.graph.get_n())
        order = np.argsort(np.asarray(tc.betas))
        n_sorted = n[order]
        assert n_sorted[-2:].mean() > n_sorted[:2].mean()

    def test_swaps_happen(self):
        edges = lattice.chain(6, j=1.0)
        tc = TemperingContainer(
            edges, transverse=1.0, betas=[0.8, 0.9, 1.0, 1.1], seed=1
        )
        tc.timesteps(10)
        for _ in range(10):
            tc.tempering_step()
        assert tc.total_swaps > 0


class TestAutocorrelations:
    def test_white_noise_decorrelates(self):
        x = np.random.RandomState(0).randn(256, 8)
        ac = np.asarray(fft_autocorrelation(x))
        assert abs(ac[0] - 1.0) < 1e-5
        assert np.all(np.abs(ac[5:50]) < 0.2)

    def test_ess_white_noise_near_total(self):
        from isingmontecarlo_tpu.analysis import effective_sample_size

        x = np.random.RandomState(1).randn(512, 4)
        ess = effective_sample_size(x)
        assert 0.6 * 512 * 4 < ess <= 1.3 * 512 * 4

    def test_ess_correlated_series_small(self):
        from isingmontecarlo_tpu.analysis import (
            effective_sample_size,
            integrated_autocorrelation_time,
        )

        # AR(1) with rho = 0.9: tau = (1+rho)/(1-rho) = 19.
        rng = np.random.RandomState(2)
        T = 4096
        x = np.zeros(T)
        for t in range(1, T):
            x[t] = 0.9 * x[t - 1] + rng.randn()
        tau = integrated_autocorrelation_time(x)
        assert 10 < tau < 30, tau
        assert effective_sample_size(x) < T / 8

    def test_slow_signal_correlates(self):
        t = np.arange(128)
        x = np.sin(2 * np.pi * t / 128.0)[:, None] + 0.01 * np.random.RandomState(1).randn(128, 4)
        ac = np.asarray(fft_autocorrelation(x))
        assert ac[1] > 0.9

    def test_spin_and_bond_shapes(self):
        states = np.random.RandomState(2).rand(64, 4, 6) > 0.5
        ac = np.asarray(spin_autocorrelation(states))
        assert ac.shape == (64,)
        edges = np.array([[0, 1], [1, 2], [2, 3]])
        ej = np.array([1.0, -1.0, 1.0])
        acb = np.asarray(bond_autocorrelation(states, edges, ej))
        assert acb.shape == (64,)
        assert abs(acb[0] - 1.0) < 1e-4


class TestContainerAccessors:
    """Small surface items (``tempering_container.rs:211-238``)."""

    def test_iter_graph_swaps(self):
        from isingmontecarlo_tpu import lattice
        from isingmontecarlo_tpu.parallel import TemperingContainer

        tc = TemperingContainer(
            lattice.chain(4, j=1.0), 1.0, betas=[0.5, 1.0, 2.0], seed=4
        )
        tc.timesteps(4)
        assert tc.num_graphs() == 3
        seen = []
        tc.iter_over_states(lambda s, b: seen.append((s.shape, b)))
        assert len(seen) == 3 and seen[0][0] == (4,)
        assert {b for _, b in seen} == {0.5, 1.0, 2.0}
        g, betas = tc.graph_ref()
        assert g is tc.graph and len(betas) == 3
        before = tc.get_total_swaps()
        tc.tempering_step()
        assert tc.get_total_swaps() >= before
