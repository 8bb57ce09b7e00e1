"""API-surface parity tests: debug introspection, checkpoint/resume,
autocorrelation entry points, IntoQmc conversion, single-step variants.

Reference parity targets: ``src/sse/qmc_debug.rs``, the ``serialize`` feature
(``qmc_ising.rs:1000-1159``), ``QmcAutoCorrelations``
(``autocorrelations.rs:6-97``), ``IntoQmc`` (``qmc_ising.rs:934-976``) with
its equivalence test (``tests/convert_test.rs``).
"""

import numpy as np
import pytest

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import QmcIsingGraph
from isingmontecarlo_tpu.sse import debug as sse_debug


def small_graph(replicas=8, seed=0, h=0.0):
    return QmcIsingGraph(
        lattice.chain(4, j=1.0), transverse=1.0, longitudinal=h,
        replicas=replicas, seed=seed,
    )


class TestDebug:
    def test_counts_sum_to_n(self):
        g = small_graph()
        for _ in range(10):
            g.timestep(1.5)
        diag, off = g.count_diagonal_and_off()
        n = np.asarray(g.get_n())
        assert np.array_equal(np.asarray(diag) + np.asarray(off), n)
        const = np.asarray(g.count_constant_ops())
        assert np.all(const <= n)
        assert np.all(const >= 0)

    def test_worldline_printer(self):
        g = small_graph(replicas=2)
        for _ in range(5):
            g.timestep(1.0)
        text = sse_debug.debug_print_diagonal(
            g.sse.ops, g.sse.state, g.model, replica=0
        )
        lines = text.splitlines()
        assert lines[0] == "=" * g.nvars
        assert set(lines[1]) <= {"0", "1"}
        assert len(lines) == 2 + g.cutoff
        # Identity rows are all '|'; op rows carry digits at their variables.
        n_op_rows = sum(1 for l in lines[2:] if not l.startswith("|" * g.nvars))
        assert n_op_rows == int(np.asarray(g.get_n())[0])


class TestCheckpoint:
    def test_roundtrip_resume_deterministic(self, tmp_path):
        g = small_graph(replicas=4, seed=11)
        for _ in range(8):
            g.timestep(1.2)
        path = str(tmp_path / "ckpt.npz")
        g.save(path)

        g2 = QmcIsingGraph.load(path)
        assert np.array_equal(np.asarray(g.sse.state), np.asarray(g2.sse.state))
        assert np.array_equal(
            np.asarray(g.sse.ops.bond), np.asarray(g2.sse.ops.bond)
        )
        # Resuming both produces identical trajectories (same key).
        for _ in range(4):
            g.timestep(1.2)
            g2.timestep(1.2)
        assert np.array_equal(np.asarray(g.sse.state), np.asarray(g2.sse.state))
        assert g2.verify()

    def test_strip_rng_reseeds(self, tmp_path):
        g = small_graph(replicas=4, seed=11)
        for _ in range(5):
            g.timestep(1.0)
        path = str(tmp_path / "ckpt.npz")
        g.save(path, strip_rng=True)
        g2 = QmcIsingGraph.load(path, seed=99)
        assert g2.verify()
        g2.timestep(1.0)
        assert g2.verify()

    def test_tempering_roundtrip(self, tmp_path):
        from isingmontecarlo_tpu import checkpoint as ckpt
        from isingmontecarlo_tpu.parallel import TemperingContainer

        tc = TemperingContainer(
            lattice.chain(4, j=1.0), 1.0, betas=[0.5, 1.0, 2.0], seed=3
        )
        tc.timesteps(5)
        tc.tempering_step()
        path = str(tmp_path / "temper.npz")
        ckpt.save_tempering(path, tc)
        tc2 = ckpt.load_tempering(path)
        assert np.allclose(np.asarray(tc.betas), np.asarray(tc2.betas))
        assert tc2.total_swaps == tc.total_swaps
        assert tc2.verify()
        tc2.timesteps(2)
        tc2.tempering_step()

    def test_signed_tempering_roundtrip(self, tmp_path):
        """±J (signed) ladders checkpoint their sign-pattern labels."""
        from isingmontecarlo_tpu import checkpoint as ckpt
        from isingmontecarlo_tpu.parallel import tempering as pt
        from isingmontecarlo_tpu.sse.ising import QmcIsingGraph

        base = lattice.chain(4, j=1.0)
        flip = [(e, -j if i == 0 else j) for i, (e, j) in enumerate(base)]
        tc = pt.new_with_rng(seed=6)
        tc.add_qmc_stepper(QmcIsingGraph(base, 1.0, replicas=4, seed=1), 1.0)
        tc.add_qmc_stepper(QmcIsingGraph(flip, 1.0, replicas=4, seed=2), 1.0)
        tc.timesteps(5)
        tc.tempering_step()
        path = str(tmp_path / "signed.npz")
        ckpt.save_tempering(path, tc)
        tc2 = ckpt.load_tempering(path)
        assert tc2.xors is not None
        np.testing.assert_array_equal(
            np.asarray(tc.xors), np.asarray(tc2.xors)
        )
        assert tc2.verify()  # needs the labels: flipped lanes hold
        tc2.timesteps(2)     # zero-base-weight ops
        tc2.tempering_step()


class TestAutocorrelations:
    def test_variable_autocorrelation_shape_and_norm(self):
        g = small_graph(replicas=8, seed=5)
        ac = g.calculate_variable_autocorrelation(32, beta=1.0)
        assert ac.shape == (32,)
        assert ac[0] == pytest.approx(1.0, abs=1e-4)
        assert np.all(np.abs(ac) <= 1.0 + 1e-4)

    def test_bond_autocorrelation_runs(self):
        g = small_graph(replicas=8, seed=6)
        ac = g.calculate_bond_autocorrelation(16, beta=1.0, sampling_freq=2)
        assert ac.shape == (8,)
        # Bonds whose satisfaction never changes normalize to 0, so the
        # average lag-0 value lies in (0, 1].
        assert 0.0 < ac[0] <= 1.0 + 1e-4

    def test_spin_product_autocorrelation(self):
        g = small_graph(replicas=8, seed=7)
        ac = g.calculate_spin_product_autocorrelation(
            16, beta=1.0, var_products=[[0, 1], [1, 2]]
        )
        assert ac.shape == (16,)


class TestIntoQmc:
    @pytest.mark.parametrize("h", [0.0, 0.3])
    def test_convert_preserves_opstring_validity(self, h):
        g = small_graph(replicas=8, seed=21, h=h)
        for _ in range(10):
            g.timestep(1.5)
        assert g.verify()
        q = g.into_qmc()
        # Same bond layout -> op string transfers verbatim and stays valid.
        assert q.verify()
        assert np.array_equal(np.asarray(q.get_n()), np.asarray(g.get_n()))

    def test_convert_then_step_statistical_equivalence(self):
        """Mirror of ``tests/convert_test.rs``: both engines sample the same
        distribution. Exact shared-RNG equality is impossible across RNG
        designs (SURVEY.md section 7 'Hard parts' #3), so compare <E>."""
        beta, t = 1.0, 150
        g = small_graph(replicas=64, seed=2)
        q = g.into_qmc()
        e_ising = float(np.mean(np.asarray(g.timesteps(t, beta))))
        e_qmc = float(np.mean(np.asarray(q.timesteps(t, beta))))
        # Offsets differ by construction (the generic engine does not fold the
        # transverse-field offset); compare via the op-count estimator with
        # each engine's own offset removed.
        de_ising = e_ising - g.model.offset
        de_qmc = e_qmc - q.model.offset
        assert de_ising == pytest.approx(de_qmc, rel=0.15, abs=0.5)


class TestFreeConstructorsAndSwap:
    def test_new_qmc_functions(self):
        from isingmontecarlo_tpu.sse import new_qmc, new_qmc_from_graph
        from isingmontecarlo_tpu import GraphState

        g = new_qmc(lattice.chain(4, j=1.0), 1.0, 0.0, cutoff=16, replicas=4)
        g.timestep(1.0)
        assert g.verify()
        cg = GraphState.new(lattice.chain(4, j=1.0), [0.0] * 4, replicas=4)
        q = new_qmc_from_graph(cg, 1.0)
        assert np.array_equal(np.asarray(q.sse.state), np.asarray(cg.state_ref()))

    def test_hamiltonian_accessor(self):
        g = small_graph()
        ne = len(g.edges)
        # two-site bond 0, J=1: aligned |J|-J=0, anti-aligned |J|+J=2.
        assert g.hamiltonian(0, [True, True], [True, True]) == pytest.approx(0.0)
        assert g.hamiltonian(0, [True, False], [True, False]) == pytest.approx(2.0)
        # transverse bond: always gamma.
        assert g.hamiltonian(ne, [True, False], [False, False]) == pytest.approx(1.0)

    def test_swap_manager_and_state(self):
        a = small_graph(seed=1)
        b = small_graph(seed=2)
        for _ in range(4):
            a.timestep(1.0)
            b.timestep(1.0)
        na, nb = np.asarray(a.get_n()), np.asarray(b.get_n())
        assert a.can_swap_managers(b)
        a.swap_manager_and_state(b)
        assert np.array_equal(np.asarray(a.get_n()), nb)
        assert np.array_equal(np.asarray(b.get_n()), na)
        assert a.verify() and b.verify()


class TestMeshSharding:
    def test_tempering_shard_over_virtual_mesh(self):
        import jax
        from jax.sharding import Mesh

        from isingmontecarlo_tpu.parallel import TemperingContainer

        devs = np.array(jax.devices()[:8])
        mesh = Mesh(devs, axis_names=("replicas",))
        tc = TemperingContainer(
            lattice.chain(4, j=1.0), 1.0,
            betas=[0.5, 1.0, 1.5, 2.0], replicas_per_beta=4, seed=1,
        )
        tc.shard_over(mesh)
        tc.timesteps(3)
        tc.tempering_step()
        assert tc.verify()


class TestSingleSteps:
    def test_single_diagonal_and_cluster_steps(self):
        g = small_graph(replicas=8, seed=31)
        for _ in range(5):
            g.single_diagonal_step(1.5)
            assert g.verify()
        for _ in range(5):
            g.single_cluster_step()
            assert g.verify()

    def test_set_cutoff_grows(self):
        g = small_graph()
        m0 = g.cutoff
        g.set_cutoff(m0 + 32)
        assert g.cutoff == m0 + 32
        assert g.verify()


class TestGenericQmcSurface:
    """Individual update moves and accessors of the generic engine
    (``qmc_runner.rs:108-346``)."""

    def _qmc(self, do_loops=False):
        from isingmontecarlo_tpu.sse.runner import Qmc

        q = Qmc(4, replicas=8, seed=5, do_loop_updates=do_loops)
        ising = np.array([1.0, 0.0, 0.0, 1.0])
        for (a, b) in [(0, 1), (1, 2), (2, 3), (3, 0)]:
            q.make_diagonal_interaction_and_offset(ising, [a, b])
        for v in range(4):
            q.make_interaction(np.full((2, 2), 0.7), [v])
        return q

    def test_individual_moves_keep_worldlines_valid(self):
        q = self._qmc()
        for _ in range(4):
            q.diagonal_update(1.5)
            assert q.verify()
        q.cluster_update()
        assert q.verify()
        q.loop_update()
        assert q.verify()
        q.flip_free_bits()
        assert q.verify()

    def test_cluster_update_rejected_without_edges(self):
        from isingmontecarlo_tpu.sse.runner import Qmc

        q = Qmc(2, replicas=2, seed=1)
        q.make_diagonal_interaction(np.array([1.0, 0.2, 0.2, 1.0]), [0, 1])
        assert not q.should_do_cluster_update()
        with pytest.raises(ValueError):
            q.cluster_update()

    def test_accessors(self):
        q = self._qmc(do_loops=True)
        assert q.should_do_loop_update() and not q.should_do_heatbath()
        q.set_do_heatbath(True)
        assert q.should_do_heatbath()
        bonds = q.get_bonds()
        assert len(bonds) == 8 and bonds[0].vars == [0, 1]
        assert q.get_offset() == pytest.approx(q.model.offset)
        m0 = q.get_cutoff()
        q.set_cutoff(m0 + 16)
        assert q.get_cutoff() == m0 + 16
        s = q.clone_state()
        assert s.shape == (8, 4) and s.dtype == bool
        assert np.array_equal(q.into_vec(), s)
        assert q.verify()


class TestInteractionSurface:
    """The ``Interaction`` object surface (``qmc_runner.rs:561-699``)."""

    def test_at_and_properties(self):
        from isingmontecarlo_tpu.sse.runner import Qmc

        q = Qmc(3, replicas=2, seed=2)
        # Asymmetric diagonal 2-site bond.
        q.make_diagonal_interaction(np.array([1.0, 0.25, 0.5, 1.0]), [0, 1])
        # Constant 1-site matrix (cluster edge).
        q.make_interaction(np.full((2, 2), 0.7), [2])
        diag, const = q.get_bonds()

        assert not diag.is_constant() and not diag.is_constant_diag()
        # First var most significant: inputs (v0=1, v1=0) -> index 0b10 = 2.
        assert diag.at([True, False], [True, False]) == pytest.approx(0.5)
        assert diag.at([False, True], [False, True]) == pytest.approx(0.25)
        assert diag.at([True, False], [False, True]) == 0.0
        assert not diag.sym_under_ising()

        assert const.is_constant() and const.is_constant_diag()
        assert const.at([True], [False]) == pytest.approx(0.7)
        assert const.sym_under_ising()

        with pytest.raises(ValueError):
            diag.at([True], [True])

    def test_symmetric_ising_bond(self):
        from isingmontecarlo_tpu.sse.runner import Interaction

        sym = Interaction(np.array([1.0, 0.0, 0.0, 1.0]), [0, 1])
        assert sym.sym_under_ising() and sym.diagonal


class TestHamInfoAndManager:
    def test_haminfo_eq_ignores_longitudinal(self):
        from isingmontecarlo_tpu.sse.ising import HamInfo

        g1 = small_graph(replicas=2, h=0.0)
        g2 = small_graph(replicas=2, h=0.5)
        i1, i2 = g1.make_haminfo(), g2.make_haminfo()
        assert isinstance(i1, HamInfo)
        # PartialEq compares edges + transverse only (qmc_ising.rs:898-902).
        assert i1 == i2
        g3 = QmcIsingGraph(
            lattice.chain(4, j=1.0), transverse=2.0, replicas=2, seed=0
        )
        assert i1 != g3.make_haminfo()

    def test_manager_ref_and_into_vec(self):
        g = small_graph(replicas=2)
        g.timestep(1.0)
        ops = g.get_manager_ref()
        assert ops is g.get_manager_mut()
        assert ops.cutoff == g.get_cutoff()
        v = g.into_vec()
        assert v.shape == (2, 4) and np.array_equal(v, g.clone_state())

        from isingmontecarlo_tpu.sse.runner import Qmc

        q = Qmc.new_with_state(3, np.array([True, False, True]), replicas=4)
        q.make_diagonal_interaction_and_offset(
            np.array([1.0, 0.0, 0.0, 1.0]), [0, 1]
        )
        assert np.array_equal(
            q.clone_state(), np.tile([True, False, True], (4, 1))
        )
        assert q.get_manager_ref().cutoff == q.get_cutoff()


class TestGenericQmcCheckpoint:
    """serde coverage of the generic engine (``qmc_runner.rs:25``)."""

    def test_roundtrip_resume_deterministic(self, tmp_path):
        from isingmontecarlo_tpu.sse.runner import Qmc

        def build(seed):
            q = Qmc(4, replicas=8, seed=seed, do_loop_updates=True)
            for (a, b) in [(0, 1), (1, 2), (2, 3), (3, 0)]:
                q.make_diagonal_interaction_and_offset(
                    np.array([1.0, 0.0, 0.0, 1.0]), [a, b]
                )
            for v in range(4):
                q.make_interaction(np.full((2, 2), 0.8), [v])
            return q

        q = build(13)
        q.timesteps(15, 1.2)
        path = str(tmp_path / "qmc.npz")
        q.save(path)
        q2 = Qmc.load(path)
        assert q2.nvars == 4 and q2.do_loop_updates
        assert q2.get_offset() == pytest.approx(q.get_offset())
        assert np.array_equal(q2.clone_state(), q.clone_state())
        assert np.array_equal(
            np.asarray(q2._sse.ops.bond), np.asarray(q._sse.ops.bond)
        )
        # Identical resumed trajectories (same key).
        q.timesteps(5, 1.2)
        q2.timesteps(5, 1.2)
        assert np.array_equal(q.clone_state(), q2.clone_state())
        assert q2.verify()

    def test_strip_rng_reseeds(self, tmp_path):
        from isingmontecarlo_tpu.sse.runner import Qmc

        q = Qmc(3, replicas=4, seed=2)
        q.make_diagonal_interaction_and_offset([1.0, 0.0, 0.0, 1.0], [0, 1])
        q.make_interaction(np.full((2, 2), 0.5), [2])
        q.timesteps(8, 1.0)
        path = str(tmp_path / "qmc.npz")
        q.save(path, strip_rng=True)
        q2 = Qmc.load(path, seed=77)
        assert q2.verify()
        q2.timesteps(4, 1.0)
        assert q2.verify()


class TestIncrementalTempering:
    """``TemperingContainer::new`` + ``add_qmc_stepper``
    (``tempering_container.rs:53-74``) and the module constructors
    (``:36-44``)."""

    def _graphs(self, n=4, seed=0, transverse=1.0):
        return [
            QmcIsingGraph(lattice.chain(4, j=1.0), transverse=transverse,
                          replicas=1, seed=seed + i)
            for i in range(n)
        ]

    def test_incremental_build_runs_and_swaps(self):
        from isingmontecarlo_tpu.parallel import tempering as pt

        tc = pt.TemperingContainer.new(seed=3)
        gs = self._graphs(4)
        gs[0].timesteps(5, 1.0)  # one pre-grown graph: cutoffs sync on build
        for i, g in enumerate(gs):
            tc.add_qmc_stepper(g, 0.5 + i)
        assert tc.num_graphs() == 4
        assert not tc.hetero
        tc.timesteps(10)
        for _ in range(20):
            tc.tempering_step()
        assert tc.verify()
        assert tc.get_total_swaps() >= 0
        states, betas = tc.states_by_temperature()
        assert states.shape == (4, 4) and betas.shape == (4,)

    def test_incremental_heterogeneous_scales(self):
        from isingmontecarlo_tpu.parallel import tempering as pt

        tc = pt.new_with_rng(seed=1)
        tc.set_enable_heatbath(True)  # deferred until materialization
        base = QmcIsingGraph(lattice.chain(4, j=1.0), transverse=1.0, seed=0)
        hot = QmcIsingGraph(lattice.chain(4, j=2.0), transverse=0.5, seed=1)
        tc.add_qmc_stepper(base, 1.0)
        tc.add_qmc_stepper(hot, 1.0)
        tc.timesteps(5)
        assert tc.hetero
        sc = np.asarray(tc.class_scales)
        np.testing.assert_allclose(sc[0], [1.0, 1.0, 1.0])
        np.testing.assert_allclose(sc[1], [2.0, 0.5, 1.0], rtol=1e-6)
        tc.tempering_step()
        assert tc.verify()

    def test_incompatible_graphs_rejected(self):
        from isingmontecarlo_tpu.parallel import tempering as pt

        tc = pt.TemperingContainer.new()
        tc.add_qmc_stepper(
            QmcIsingGraph(lattice.chain(4, j=1.0), transverse=1.0), 1.0
        )
        with pytest.raises(ValueError):
            tc.add_qmc_stepper(
                QmcIsingGraph(lattice.chain(6, j=1.0), transverse=1.0), 2.0
            )
        # sign-flipped couplings are now ACCEPTED (signed substate-XOR
        # labels, the op-resolved swap path); a transverse-field sign flip
        # has no such representation and stays rejected
        edges = lattice.chain(4, j=1.0)
        edges[0] = (edges[0][0], -1.0)
        tc.add_qmc_stepper(QmcIsingGraph(edges, transverse=1.0), 2.0)
        with pytest.raises(ValueError):
            tc.add_qmc_stepper(
                QmcIsingGraph(lattice.chain(4, j=1.0), transverse=-1.0), 2.0
            )
        # zero-base scaling is rejected too
        with pytest.raises(ValueError):
            tc.add_qmc_stepper(
                QmcIsingGraph(lattice.chain(4, j=1.0), transverse=1.0,
                              longitudinal=0.3), 2.0
            )
        with pytest.raises(ValueError):
            pt.TemperingContainer.new().timesteps(1)  # empty container

    def test_rng_key_accessor(self):
        from isingmontecarlo_tpu.parallel import tempering as pt
        import jax

        tc = pt.new_thread_rng()
        tc.add_qmc_stepper(
            QmcIsingGraph(lattice.chain(4, j=1.0), transverse=1.0), 1.0
        )
        tc.timesteps(2)
        tc.rng_key = jax.random.key(9)  # rng_mut, tempering_container.rs:236
        before = tc.rng_key
        tc.tempering_step()
        assert not np.array_equal(
            jax.random.key_data(before), jax.random.key_data(tc.rng_key)
        )


class TestSmallParityHelpers:
    def test_new_from_ops_verifies(self):
        from isingmontecarlo_tpu.sse import opstring as _ops

        g = small_graph(replicas=1)
        # Hand-built string: a diagonal two-site op on bond 0 (vars 0, 1 —
        # anti-aligned, so the J=+1 weight |J|+J is positive) and a
        # transverse (constant) op on var 2 (bond nedges + 2).
        s = np.zeros((1, 4), bool)
        s[0, 1] = True
        nedges = len(g.edges)
        ops = _ops.new_from_ops(
            8,
            [
                (1, 0, (False, True), (False, True)),
                (4, nedges + 2, (False,), (False,)),
            ],
            max_legs=g.model.max_legs,
        )
        assert int(np.asarray(_ops.op_count(ops))[0]) == 2
        assert bool(np.asarray(_ops.verify(ops, np.asarray(s), g.model))[0])

    def test_state_mut_commits(self):
        g = small_graph(replicas=2)
        with g.state_mut() as s:
            s[:, :] = False
            s[0, 1] = True
        out = g.clone_state()
        assert out[0, 1] and not out[1, 1] and not out[0, 0]

    def test_is_valid_cluster_edge(self):
        from isingmontecarlo_tpu.sse import cluster as _cl

        assert bool(_cl.is_valid_cluster_edge(True, 1))
        assert not bool(_cl.is_valid_cluster_edge(False, 1))
        assert not bool(_cl.is_valid_cluster_edge(True, 2))

    def test_contiguous_bits_distribution(self):
        import jax
        from isingmontecarlo_tpu.sse.rvb import contiguous_bits

        n = np.asarray(contiguous_bits(jax.random.key(0), (20000,)))
        assert n.min() >= 0 and n.max() <= 64
        # P(n=0) = 1/2, mean = 1
        assert abs((n == 0).mean() - 0.5) < 0.02
        assert abs(n.mean() - 1.0) < 0.05

    def test_graph_state_with_rng(self):
        import jax
        from isingmontecarlo_tpu.classical.graph_state import GraphState

        edges = [((0, 1), 1.0), ((1, 2), 1.0)]
        s = np.zeros((1, 3), bool)
        g = GraphState.new_with_state_and_rng(s, edges, [0.0] * 3,
                                              jax.random.key(5))
        g.run_timesteps(3, 1.0)
        assert g.get_state().shape == (1, 3)
