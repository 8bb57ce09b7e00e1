"""Heterogeneous-Hamiltonian parallel tempering tests (reference
``tempering_traits.rs:117-155`` relative weights, ``swap_on_chunks``
acceptance)."""

import numpy as np
import pytest

import jax.numpy as jnp

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.parallel import TemperingContainer
from isingmontecarlo_tpu.parallel.tempering import tempering_step


class TestHeteroSwapMath:
    def test_identical_params_always_swap(self):
        import jax

        n = jnp.asarray([5, 9, 3, 7], jnp.int32)
        betas = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)
        perm, swaps = tempering_step(n, betas, jax.random.key(0), 0)
        assert int(swaps) == 2  # both pairs accept (log p = 0 => p = 1)
        assert sorted(np.asarray(perm).tolist()) == [0, 1, 2, 3]

    def test_class_term_blocks_bad_swaps(self):
        import jax

        n = jnp.asarray([10, 10], jnp.int32)
        betas = jnp.asarray([1.0, 1.0], jnp.float32)
        # replica 1 has 10 transverse ops; its multiplier under replica 0's
        # label is 1e-6 => log p very negative => never swap.
        n_class = jnp.asarray([[0, 0, 0], [0, 10, 0]], jnp.int32)
        log_c = jnp.log(jnp.asarray([[1.0, 1e-6, 1.0], [1.0, 1.0, 1.0]]))
        perm, swaps = tempering_step(
            n, betas, jax.random.key(0), 0, n_class, log_c
        )
        assert int(swaps) == 0
        assert np.asarray(perm).tolist() == [0, 1]


class TestHeteroContainer:
    def test_transverse_ladder_runs_and_swaps(self):
        edges = lattice.chain(6, j=1.0)
        tc = TemperingContainer(
            edges,
            transverse=1.0,
            betas=[1.0, 1.0, 1.0, 1.0],
            transverse_scales=[0.6, 0.9, 1.2, 1.5],
            seed=5,
        )
        tc.timesteps(10)
        total = 0
        for _ in range(6):
            tc.timesteps(3)
            total += tc.tempering_step()
        assert tc.verify()
        assert total > 0, "field ladder should exchange sometimes"
        # Labels stay a permutation of the original ladder.
        got = sorted(np.asarray(tc.scales[:, 1], np.float64).tolist())
        np.testing.assert_allclose(got, [0.6, 0.9, 1.2, 1.5], rtol=1e-6)

    def test_heatbath_hetero_ladder(self):
        """Heat-bath diagonal updates with per-replica bond-weight tables
        (the reference's per-graph ``BondWeights`` under distinct
        Hamiltonians, ``heatbath.rs:10-61`` + ``tempering_traits.rs``)."""
        edges = lattice.chain(6, j=1.0)
        tc = TemperingContainer(
            edges,
            transverse=1.0,
            betas=[1.0, 1.0, 1.0],
            transverse_scales=[0.7, 1.0, 1.4],
            seed=11,
        )
        tc.set_enable_heatbath(True)
        tc.timesteps(8)
        total = 0
        for _ in range(5):
            tc.timesteps(3)
            total += tc.tempering_step()
        assert tc.verify()
        got = sorted(np.asarray(tc.scales[:, 1], np.float64).tolist())
        np.testing.assert_allclose(got, [0.7, 1.0, 1.4], rtol=1e-6)

    def test_heatbath_hetero_matches_ed(self):
        """Per-replica heat-bath tables must sample each replica's own
        Hamiltonian: check <E> per rung against exact diagonalization with
        swaps disabled."""
        L, beta = 4, 1.5
        edges = lattice.chain(L, j=1.0)
        scales = [0.5, 1.5]
        tc = TemperingContainer(
            edges,
            transverse=1.0,
            betas=[beta, beta],
            replicas_per_beta=24,
            transverse_scales=scales,
            seed=21,
        )
        tc.set_enable_heatbath(True)
        tc.timesteps(60)

        # measure energies per replica over sweeps
        from isingmontecarlo_tpu.sse import opstring as _ops

        # Per-replica energy offset sum|J| + N * G * scale (qmc_ising.rs:97-99
        # with the replica's own transverse field).
        scale_per_rep = np.asarray(tc.scales[:, 1], np.float64)
        sum_j = sum(abs(j) for _, j in edges)
        offset_r = sum_j + L * 1.0 * scale_per_rep

        es = []
        for _ in range(80):
            tc.timesteps(1)
            n = np.asarray(_ops.op_count(tc.graph.sse.ops), np.float64)
            es.append(-n / beta + offset_r)
        e = np.mean(es, axis=0)  # [R]

        def ed_energy(g):
            H = np.zeros((2**L, 2**L))
            for s in range(2**L):
                for (a, b), j in edges:
                    za = 1 - 2 * ((s >> a) & 1)
                    zb = 1 - 2 * ((s >> b) & 1)
                    H[s, s] += j * za * zb
                for i in range(L):
                    H[s ^ (1 << i), s] += -g
            w = np.linalg.eigvalsh(H)
            z = np.exp(-beta * (w - w[0]))
            return float((w * z).sum() / z.sum())

        for g in scales:
            sel = np.isclose(scale_per_rep, g)
            got = float(np.mean(e[sel]))
            want = ed_energy(g)
            assert abs(got - want) < 0.25, (g, got, want)

    def test_homogeneous_path_unchanged(self):
        edges = lattice.chain(4, j=1.0)
        tc = TemperingContainer(edges, 1.0, betas=[0.5, 1.0, 2.0], seed=3)
        tc.timesteps(5)
        tc.tempering_step()
        assert tc.verify()
        assert sorted(np.round(np.asarray(tc.betas), 4).tolist()) == [
            0.5, 1.0, 2.0,
        ]

    def test_hetero_ladder_sharded_over_mesh(self):
        import jax
        from jax.sharding import Mesh

        devs = np.array(jax.devices()[:8])
        tc = TemperingContainer(
            lattice.chain(4, j=1.0), 1.0,
            betas=[1.0] * 8, replicas_per_beta=2,
            transverse_scales=[0.6, 0.8, 0.9, 1.0, 1.1, 1.2, 1.4, 1.6],
            seed=2,
        )
        tc.shard_over(Mesh(devs, axis_names=("replicas",)))
        tc.timesteps(4)
        tc.tempering_step()
        tc.timesteps(2)
        assert tc.verify()
        got = sorted(np.asarray(tc.scales[:, 1], np.float64).tolist())
        np.testing.assert_allclose(
            got, sorted([0.6, 0.8, 0.9, 1.0, 1.1, 1.2, 1.4, 1.6] * 2), rtol=1e-6
        )

    def test_per_replica_autocorrelations(self):
        edges = lattice.chain(4, j=1.0)
        tc = TemperingContainer(edges, 1.0, betas=[0.5, 2.0], seed=9)
        ac = tc.calculate_variable_autocorrelations(12, swap_freq=3)
        assert ac.shape == (2, 12)
        assert ac[0, 0] == pytest.approx(1.0, abs=2e-2)
