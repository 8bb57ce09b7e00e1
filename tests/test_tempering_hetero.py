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
        got = sorted(np.asarray(tc.class_scales[:, 1], np.float64).tolist())
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
        got = sorted(np.asarray(tc.class_scales[:, 1], np.float64).tolist())
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
        scale_per_rep = np.asarray(tc.class_scales[:, 1], np.float64)
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
        got = sorted(np.asarray(tc.class_scales[:, 1], np.float64).tolist())
        np.testing.assert_allclose(
            got, sorted([0.6, 0.8, 0.9, 1.0, 1.1, 1.2, 1.4, 1.6] * 2), rtol=1e-6
        )

    def test_per_replica_autocorrelations(self):
        edges = lattice.chain(4, j=1.0)
        tc = TemperingContainer(edges, 1.0, betas=[0.5, 2.0], seed=9)
        ac = tc.calculate_variable_autocorrelations(12, swap_freq=3)
        assert ac.shape == (2, 12)
        assert ac[0, 0] == pytest.approx(1.0, abs=2e-2)


def _disorder_edges(pattern):
    """4-site ring with per-bond |J| pattern."""
    base = lattice.chain(4, j=1.0)
    return [(e, j * p) for (e, j), p in zip(base, pattern)]


class TestPerBondDisorder:
    """Per-bond coupling disorder — the reference's Ising relative_weight
    walks every *bond* (``tempering_traits.rs:117-155``); the label-swap
    container represents it with per-bond multipliers."""

    def test_disordered_ladder_accepted_and_stationary(self):
        """Two different |J| disorder realizations temper against each other;
        per-label mean energies must match dense ED for each realization —
        this validates both the per-bond diagonal sampling under swapped
        labels and the per-bond swap acceptance."""
        import jax

        from isingmontecarlo_tpu.sse.ising import QmcIsingGraph
        from tests.test_sse import exact_tfim_energy

        beta = 1.0
        pat_a = [0.7, 1.3, 1.0, 1.0]
        pat_b = [1.3, 0.7, 1.0, 1.0]  # same sum|J| => same energy offset
        e_a = _disorder_edges(pat_a)
        e_b = _disorder_edges(pat_b)
        from isingmontecarlo_tpu.parallel import tempering as pt

        tc = pt.new_with_rng(seed=4)
        tc.add_qmc_stepper(
            QmcIsingGraph(e_a, transverse=1.0, replicas=24, seed=1), beta
        )
        tc.add_qmc_stepper(
            QmcIsingGraph(e_b, transverse=1.0, replicas=24, seed=2), beta
        )
        tc.timesteps(50)
        assert tc.hetero

        from isingmontecarlo_tpu.sse import opstring as _ops

        es = []
        labels = []
        for i in range(150):
            tc.timesteps(1)
            if i % 2 == 0:
                tc.tempering_step()
            n = np.asarray(_ops.op_count(tc.graph.sse.ops), np.float64)
            es.append(-n / beta + tc.graph.model.offset)
            # label = scale of edge bond 0 (1.0 for pattern a, 1.3/0.7 for b)
            labels.append(np.asarray(tc.scales[:, 0], np.float64))
        assert tc.get_total_swaps() > 0, "disorder ladder should swap"
        assert tc.verify()
        es = np.stack(es)
        labels = np.stack(labels)
        is_a = np.isclose(labels, 1.0)
        mean_a = float(es[is_a].mean())
        mean_b = float(es[~is_a].mean())
        ed_a = exact_tfim_energy(e_a, 1.0, 0.0, beta, 4)
        ed_b = exact_tfim_energy(e_b, 1.0, 0.0, beta, 4)
        # patterns are a relabeling of each other => ed_a == ed_b; the real
        # check is that sampling under swapped labels stays stationary.
        assert mean_a == pytest.approx(ed_a, abs=0.15)
        assert mean_b == pytest.approx(ed_b, abs=0.15)

    def test_edge_listing_order_canonicalized(self):
        """Identical edge sets listed in different orders must be accepted
        (matched by canonical (min,max) keys, not zip order)."""
        from isingmontecarlo_tpu.parallel import tempering as pt
        from isingmontecarlo_tpu.sse.ising import QmcIsingGraph

        e1 = [((0, 1), 1.0), ((1, 2), 0.5), ((2, 0), 1.0)]
        e2 = [((2, 1), 0.75), ((1, 0), 1.5), ((0, 2), 1.5)]  # shuffled+flipped
        tc = pt.new_with_rng(seed=0)
        tc.add_qmc_stepper(QmcIsingGraph(e1, transverse=1.0, seed=0), 1.0)
        tc.add_qmc_stepper(QmcIsingGraph(e2, transverse=1.0, seed=1), 1.0)
        tc.timesteps(3)
        assert tc.hetero
        # scale of e1's second edge (1,2): 0.75/0.5 = 1.5
        np.testing.assert_allclose(np.asarray(tc.scales)[1, 1], 1.5, rtol=1e-6)

    def test_scales_path_rejects_sign_flip(self):
        """The pure label-swap (positive-scale) representation cannot absorb
        a sign flip — `_relative_bond_scales` must say so and point at the
        signed path (which the container now takes automatically)."""
        from isingmontecarlo_tpu.parallel.tempering import (
            _relative_bond_scales,
        )
        from isingmontecarlo_tpu.sse.ising import QmcIsingGraph

        e1 = _disorder_edges([1.0, 1.0, 1.0, 1.0])
        e2 = _disorder_edges([-1.0, 1.0, 1.0, 1.0])
        g1 = QmcIsingGraph(e1, transverse=1.0, seed=0)
        g2 = QmcIsingGraph(e2, transverse=1.0, seed=1)
        with pytest.raises(ValueError, match="sign"):
            _relative_bond_scales(g1, g2)

    def test_transverse_sign_flip_rejected(self):
        """A transverse-field sign flip has no substate-permutation label
        (the transverse table is substate-constant) — still an error, as in
        the reference's zero/nonzero weight-support mismatch."""
        from isingmontecarlo_tpu.parallel import tempering as pt
        from isingmontecarlo_tpu.sse.ising import QmcIsingGraph

        e1 = _disorder_edges([1.0, 1.0, 1.0, 1.0])
        tc = pt.new_with_rng(seed=0)
        tc.add_qmc_stepper(QmcIsingGraph(e1, transverse=1.0, seed=0), 1.0)
        with pytest.raises(ValueError):
            tc.add_qmc_stepper(QmcIsingGraph(e1, transverse=-1.0, seed=1), 1.0)


class TestGenericOpWalkSwap:
    """The OpWeights fallback (``tempering_traits.rs:163-196``): op-walking
    relative weights + manager/state payload swap for Hamiltonian pairs with
    no label-swap representation."""

    def test_log_relative_weight_matches_bond_count_formula(self):
        """For scale-related Hamiltonians the op-walk product must equal
        prod_b c_b^count(b) — cross-checked through bond counters."""
        from isingmontecarlo_tpu.sse import opstring as _ops
        from isingmontecarlo_tpu.sse.ising import QmcIsingGraph
        from isingmontecarlo_tpu.sse.model import tfim_model

        edges = lattice.chain(4, j=1.0)
        g = QmcIsingGraph(edges, transverse=0.8, replicas=8, seed=3)
        g.timesteps(20, 1.0)
        model_b = tfim_model([(e, 1.5 * j) for e, j in edges], 1.6)
        logw, is_zero = _ops.log_relative_weight(
            g.sse.ops, g.model, model_b
        )
        bc = np.asarray(
            _ops.bond_counts(g.sse.ops, g.model.nbonds), np.float64
        )
        log_c = np.concatenate(
            [np.full(4, np.log(1.5)), np.full(4, np.log(2.0))]
        )
        np.testing.assert_allclose(
            np.asarray(logw, np.float64), bc @ log_c, rtol=1e-4, atol=1e-4
        )
        assert not np.any(np.asarray(is_zero))

    def test_swap_qmc_steppers_stationary_vs_ed(self):
        """Sign-flipped-bond pair (not label-swappable): payload swaps via
        op-walk acceptance must leave each graph stationary under its OWN
        Hamiltonian — checked against dense ED."""
        import jax

        from isingmontecarlo_tpu.parallel.tempering import swap_qmc_steppers
        from isingmontecarlo_tpu.sse import opstring as _ops
        from isingmontecarlo_tpu.sse.ising import QmcIsingGraph
        from tests.test_sse import exact_tfim_energy

        beta = 1.0
        e_a = _disorder_edges([1.0, 1.0, 1.0, 1.0])
        e_b = _disorder_edges([-1.0, 1.0, 1.0, 1.0])  # one frustrated bond
        g_a = QmcIsingGraph(e_a, transverse=1.0, replicas=24, seed=5)
        g_b = QmcIsingGraph(e_b, transverse=1.0, replicas=24, seed=6)
        g_a.timesteps(40, beta)
        g_b.timesteps(40, beta)

        key = jax.random.key(7)
        swaps = 0
        es_a, es_b = [], []
        for i in range(120):
            g_a.timesteps(1, beta)
            g_b.timesteps(1, beta)
            if i % 2 == 0:
                key, sub = jax.random.split(key)
                swaps += swap_qmc_steppers(g_a, beta, g_b, beta, sub)
            na = np.asarray(_ops.op_count(g_a.sse.ops), np.float64)
            nb = np.asarray(_ops.op_count(g_b.sse.ops), np.float64)
            es_a.append(-na / beta + g_a.model.offset)
            es_b.append(-nb / beta + g_b.model.offset)
        assert swaps > 0, "op-walk swaps should sometimes accept"
        assert g_a.verify() and g_b.verify()
        ed_a = exact_tfim_energy(e_a, 1.0, 0.0, beta, 4)
        ed_b = exact_tfim_energy(e_b, 1.0, 0.0, beta, 4)
        assert float(np.mean(es_a)) == pytest.approx(ed_a, abs=0.15)
        assert float(np.mean(es_b)) == pytest.approx(ed_b, abs=0.15)


class TestSignedContainer:
    """Mixed-sign Hamiltonians inside ONE TemperingContainer
    (``tempering_traits.rs:163-196``): sign flips become per-replica
    substate-XOR labels; swaps use the fused op-resolved acceptance."""

    def test_log_weight_delta_matches_op_walk(self):
        """The label-space delta (base table + XOR masks) must equal the
        explicit two-model op walk for a sign-flipped edge pattern."""
        import jax.numpy as jnp

        from isingmontecarlo_tpu.sse import opstring as _ops
        from isingmontecarlo_tpu.sse.ising import QmcIsingGraph
        from isingmontecarlo_tpu.sse.model import tfim_model

        e_a = _disorder_edges([1.0, 1.0, 1.0, 1.0])
        e_b = _disorder_edges([-1.0, 1.0, -1.0, 1.0])
        g = QmcIsingGraph(e_a, transverse=1.0, replicas=8, seed=3)
        g.timesteps(20, 1.0)
        model_b = tfim_model(e_b, 1.0)
        want, want_zero = _ops.log_relative_weight(
            g.sse.ops, g.model, model_b
        )
        nb = g.model.nbonds
        ones = jnp.ones((8, nb), jnp.float32)
        zeros = jnp.zeros((8, nb), jnp.int32)
        xor_b = zeros.at[:, 0].set(1).at[:, 2].set(1)
        got, blocked = _ops.log_weight_delta(
            g.sse.ops, g.model, ones, zeros, ones, xor_b
        )
        # ferromagnetic ground-state-adjacent strings can have zero weight
        # under the flipped bonds — both paths must agree on that too
        np.testing.assert_array_equal(
            np.asarray(blocked), np.asarray(want_zero)
        )
        ok = ~np.asarray(blocked)
        np.testing.assert_allclose(
            np.asarray(got)[ok], np.asarray(want)[ok], rtol=1e-4, atol=1e-4
        )

    def test_signed_ladder_accepted_and_stationary(self):
        """±J disorder realizations temper in ONE container: per-label mean
        energies must match dense ED for each realization (validates the
        bond_xor sweep path, label permutation, and op-resolved swaps)."""
        from isingmontecarlo_tpu.parallel import tempering as pt
        from isingmontecarlo_tpu.sse import opstring as _ops
        from isingmontecarlo_tpu.sse.ising import QmcIsingGraph
        from tests.test_sse import exact_tfim_energy

        beta = 1.0
        e_a = _disorder_edges([1.0, 1.0, 1.0, 1.0])
        e_b = _disorder_edges([-1.0, 1.0, 1.0, 1.0])  # frustrated ring
        tc = pt.new_with_rng(seed=8)
        tc.add_qmc_stepper(
            QmcIsingGraph(e_a, transverse=1.0, replicas=24, seed=1), beta
        )
        tc.add_qmc_stepper(
            QmcIsingGraph(e_b, transverse=1.0, replicas=24, seed=2), beta
        )
        tc.timesteps(50)
        assert tc.xors is not None

        es, labels = [], []
        for i in range(150):
            tc.timesteps(1)
            if i % 2 == 0:
                tc.tempering_step()
            n = np.asarray(_ops.op_count(tc.graph.sse.ops), np.float64)
            es.append(-n / beta + tc.graph.model.offset)
            labels.append(np.asarray(tc.xors[:, 0], np.int64))
        assert tc.get_total_swaps() > 0, "signed ladder should swap"
        assert tc.verify()
        es = np.stack(es)
        labels = np.stack(labels)
        is_a = labels == 0
        ed_a = exact_tfim_energy(e_a, 1.0, 0.0, beta, 4)
        ed_b = exact_tfim_energy(e_b, 1.0, 0.0, beta, 4)
        assert float(es[is_a].mean()) == pytest.approx(ed_a, abs=0.15)
        assert float(es[~is_a].mean()) == pytest.approx(ed_b, abs=0.15)

    def test_signed_ladder_fused_chunk_sampling(self):
        """The one-jit run/swap/sample chunk must carry the XOR labels
        through swaps (timesteps_sample path) and stay stationary."""
        from isingmontecarlo_tpu.parallel import tempering as pt
        from isingmontecarlo_tpu.sse.ising import QmcIsingGraph

        beta = 1.0
        e_a = _disorder_edges([1.0, 1.0, 1.0, 1.0])
        e_b = _disorder_edges([-1.0, 1.0, 1.0, 1.0])
        tc = pt.new_with_rng(seed=13)
        tc.add_qmc_stepper(
            QmcIsingGraph(e_a, transverse=1.0, replicas=8, seed=3), beta
        )
        tc.add_qmc_stepper(
            QmcIsingGraph(e_b, transverse=1.0, replicas=8, seed=4), beta
        )
        states, bet = tc.timesteps_sample(24, swap_freq=2, chunk=8)
        assert states.shape[0] == 24 and states.shape[1] == 16
        assert tc.verify()
        # XOR labels remain a permutation of the original ladder
        x0 = np.sort(np.asarray(tc.xors[:, 0]))
        np.testing.assert_array_equal(x0, np.r_[np.zeros(8), np.ones(8)])
