"""SSE engine tests.

Oracles (mirroring the reference's strategy, SURVEY.md section 4):

- ``verify()``: worldline integrity after every kind of update
  (``op_container.rs:137-159`` semantics) across seeds — the reference's
  crash-test pattern (``tests/check_rvb_crash.rs`` etc.).
- Exact diagonalization: thermal energy of small TFIM systems must match the
  SSE estimator to statistical tolerance. The estimator convention is
  ``E = -<n>/beta + offset`` with ``H = sum J s^z s^z - G sum s^x - h sum s^z``
  (weights of ``qmc_ising.rs:863-888``).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import (
    QmcIsingGraph,
    Qmc,
    opstring,
    tfim_model,
)


def exact_tfim_energy(edges, gamma, h, beta, nvars):
    """<H> at inverse temperature beta by dense diagonalization.

    H = sum_ij J sz_i sz_j - gamma sum_i sx_i - h sum_i sz_i,
    sz = diag(1, -1) with spin true -> +1.
    """
    dim = 1 << nvars
    H = np.zeros((dim, dim))
    # basis: bit v of index = spin of var v (1 = up)
    for idx in range(dim):
        sz = [1.0 if (idx >> v) & 1 else -1.0 for v in range(nvars)]
        H[idx, idx] = sum(j * sz[a] * sz[b] for (a, b), j in edges) - h * sum(sz)
        for v in range(nvars):
            H[idx ^ (1 << v), idx] += -gamma
    w, _ = np.linalg.eigh(H)
    w = w - w.min()
    z = np.exp(-beta * w)
    return float((w * z).sum() / z.sum()) + float(np.linalg.eigvalsh(H).min())


class TestVerifyOracle:
    @pytest.mark.parametrize("seed,beta", list(itertools.product([0, 1], [0.5, 2.0])))
    def test_verify_after_timesteps(self, seed, beta):
        edges = lattice.square(3, 3, j=1.0)
        g = QmcIsingGraph(edges, transverse=1.0, replicas=16, seed=seed)
        assert g.verify()
        for _ in range(10):
            g.timestep(beta)
            assert g.verify(), "worldline integrity broken"

    def test_verify_with_longitudinal(self):
        edges = lattice.square(3, 3, j=1.0)
        g = QmcIsingGraph(edges, transverse=1.0, longitudinal=0.7, replicas=16, seed=3)
        for _ in range(10):
            g.timestep(1.0)
            assert g.verify()

    def test_verify_heatbath(self):
        edges = lattice.square(3, 3, j=1.0)
        g = QmcIsingGraph(edges, transverse=1.0, replicas=16, seed=4)
        g.set_enable_heatbath(True)
        for _ in range(10):
            g.timestep(1.0)
            assert g.verify()

    def test_n_grows_with_beta(self):
        edges = lattice.chain(8, j=1.0)
        g_hot = QmcIsingGraph(edges, transverse=1.0, replicas=32, seed=5)
        g_cold = QmcIsingGraph(edges, transverse=1.0, replicas=32, seed=5)
        for _ in range(20):
            g_hot.timestep(0.2)
            g_cold.timestep(2.0)
        assert float(jnp.mean(g_cold.get_n())) > float(jnp.mean(g_hot.get_n()))


class TestPhysics:
    def test_single_site_pure_transverse(self):
        # H = -G sx for one site: E(beta) = -G tanh(beta G).
        edges = [((0, 1), 0.0)]  # two decoupled sites
        beta, gamma = 1.5, 1.0
        g = QmcIsingGraph(edges, transverse=gamma, replicas=1024, seed=6)
        g.timesteps(60, beta)  # equilibrate
        e = np.asarray(g.timesteps(200, beta))
        expected = 2 * (-gamma * np.tanh(beta * gamma))
        assert abs(e.mean() - expected) < 0.05, (e.mean(), expected)

    def test_tfim_chain_matches_exact_diag(self):
        L, beta, gamma = 4, 2.0, 1.0
        edges = lattice.chain(L, j=1.0, periodic=True)
        exact = exact_tfim_energy(edges, gamma, 0.0, beta, L)
        g = QmcIsingGraph(edges, transverse=gamma, replicas=512, seed=7)
        g.timesteps(80, beta)
        e = np.asarray(g.timesteps(300, beta))
        se = e.std() / np.sqrt(len(e))
        assert abs(e.mean() - exact) < max(4 * se, 0.06), (e.mean(), exact, se)

    def test_tfim_longitudinal_matches_exact_diag(self):
        L, beta, gamma, h = 3, 1.5, 0.8, 0.6
        edges = lattice.chain(L, j=1.0, periodic=False)
        exact = exact_tfim_energy(edges, gamma, h, beta, L)
        g = QmcIsingGraph(edges, transverse=gamma, longitudinal=h, replicas=512, seed=8)
        g.timesteps(80, beta)
        e = np.asarray(g.timesteps(300, beta))
        se = e.std() / np.sqrt(len(e))
        assert abs(e.mean() - exact) < max(4 * se, 0.08), (e.mean(), exact, se)

    def test_heatbath_same_physics(self):
        L, beta, gamma = 4, 1.0, 1.0
        edges = lattice.chain(L, j=1.0, periodic=True)
        exact = exact_tfim_energy(edges, gamma, 0.0, beta, L)
        g = QmcIsingGraph(edges, transverse=gamma, replicas=512, seed=9)
        g.set_enable_heatbath(True)
        g.timesteps(80, beta)
        e = np.asarray(g.timesteps(250, beta))
        se = e.std() / np.sqrt(len(e))
        assert abs(e.mean() - exact) < max(4 * se, 0.08), (e.mean(), exact, se)


class TestSampling:
    def test_timesteps_sample_shapes(self):
        edges = lattice.chain(6, j=1.0)
        g = QmcIsingGraph(edges, transverse=1.0, replicas=8, seed=10)
        states, e = g.timesteps_sample(20, 1.0, sampling_freq=5)
        assert states.shape == (4, 8, 6)
        assert e.shape == (8,)

    def test_imaginary_time_states(self):
        edges = lattice.chain(4, j=1.0)
        g = QmcIsingGraph(edges, transverse=1.0, replicas=4, seed=11)
        g.timesteps(10, 1.0)
        st = g.imaginary_time_states()
        assert st.shape == (g.cutoff, 4, 4)
        # Worldline periodicity: final propagated state equals p=0 state.
        m = tfim_model(g.edges, g.transverse, g.longitudinal)
        vars_ = opstring.op_vars(g.sse.ops, m)
        assert bool(jnp.all(st[0] == g.sse.state))

    def test_bond_counts(self):
        edges = lattice.chain(4, j=1.0)
        g = QmcIsingGraph(edges, transverse=1.0, replicas=8, seed=12)
        g.timesteps(10, 1.0)
        counts = opstring.bond_counts(g.sse.ops, g.model.nbonds)
        assert bool(jnp.all(counts.sum(axis=1) == g.get_n()))

    def test_imaginary_time_fold_streams_without_materializing(self):
        """The streaming fold (``qmc_stepper.rs:165-167``) must agree with a
        fold over the materialized trajectory."""
        edges = lattice.chain(4, j=1.0)
        g = QmcIsingGraph(edges, transverse=1.0, replicas=4, seed=13)
        g.timesteps(10, 1.0)
        st = np.asarray(g.imaginary_time_states(), np.float64)  # [M, R, N]
        want = st.sum(axis=0)
        got = g.imaginary_time_fold(
            lambda acc, s: acc + s.astype(jnp.float32),
            jnp.zeros(g.sse.state.shape, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(got, np.float64), want)

    def test_timesteps_sample_iter_zip_generic(self):
        """Qmc.timesteps_sample_iter_zip (``qmc_stepper.rs:97-130`` blanket
        impl): folds stop when the zipped iterable is exhausted."""
        from isingmontecarlo_tpu.sse.runner import Qmc

        q = Qmc(3, replicas=4, seed=4)
        q.make_diagonal_interaction_and_offset([-1.0, 1.0, 1.0, -1.0], [0, 1])
        q.make_interaction([[0.7, 0.7], [0.7, 0.7]], [2])
        seen = []
        q.timesteps_sample_iter_zip(
            12, 1.0, 2, ["a", "b", "c"],
            lambda z, s: seen.append((z, s.shape)),
        )
        assert [z for z, _ in seen] == ["a", "b", "c"]
        assert all(shape == (4, 3) for _, shape in seen)


class TestGenericQmc:
    def test_tfim_via_interactions_matches_ising_graph(self):
        # The convert_test.rs analog: the generic engine with TFIM weight
        # matrices must reproduce the TFIM thermal energy statistically.
        # SSE with weights W_b samples H = -sum_b W_b as an operator, so
        # E_est(offset=0) = <H_TFIM> - (sum|J| + N*Gamma).
        L, beta, gamma = 4, 1.0, 1.0
        edges = lattice.chain(L, j=1.0, periodic=True)
        exact = exact_tfim_energy(edges, gamma, 0.0, beta, L)
        std_offset = sum(abs(j) for _, j in edges) + L * gamma

        q = Qmc(L, replicas=512, seed=13)
        for (a, b), j in edges:
            # Diagonal weights |J| -+ J: entries indexed (reference bit
            # order) up-up, up-down, down-up, down-down.
            q.make_diagonal_interaction(
                [abs(j) - j, abs(j) + j, abs(j) + j, abs(j) - j], [a, b]
            )
        for v in range(L):
            q.make_interaction(np.full((2, 2), gamma), [v])
        q.timesteps(60, beta)  # warmup
        total_n = jnp.zeros((512,), jnp.float32)
        for _ in range(200):
            q.timestep(beta)
            total_n = total_n + q.get_n()
        e = np.asarray(-(total_n / 200) / beta) + std_offset
        se = e.std() / np.sqrt(len(e))
        assert q.verify()
        assert abs(e.mean() - exact) < max(4 * se, 0.1), (e.mean(), exact, se)

    def test_directed_loop_xxz_matches_exact_diag(self):
        # Exchange interaction (off-diagonal, no constant ops): only the
        # directed-loop update can create off-diagonal ops here
        # (directed_loop.rs semantics). Compare E = -<n>/beta to dense diag
        # of H = -sum_b W_b.
        W = np.array(
            [
                [0.5, 0, 0, 0],
                [0, 1.0, 0.7, 0],
                [0, 0.7, 1.0, 0],
                [0, 0, 0, 0.5],
            ]
        )
        L, beta = 3, 1.2
        q = Qmc(L, replicas=256, seed=0, do_loop_updates=True)
        for a in range(L - 1):
            q.make_interaction(W, [a, a + 1])
        assert not q.has_cluster_edges
        for _ in range(30):
            q.timestep(beta)
        assert q.verify()
        total_n = jnp.zeros((256,), jnp.float32)
        for _ in range(120):
            q.timestep(beta)
            total_n = total_n + q.get_n()
        e = np.asarray(-(total_n / 120) / beta)
        assert q.verify()

        dim = 1 << L
        H = np.zeros((dim, dim))
        for a in range(L - 1):
            for idx in range(dim):
                for jdx in range(dim):
                    if (idx | (1 << a) | (1 << (a + 1))) != (
                        jdx | (1 << a) | (1 << (a + 1))
                    ):
                        continue
                    ia, ib = (idx >> a) & 1, (idx >> (a + 1)) & 1
                    ja, jb = (jdx >> a) & 1, (jdx >> (a + 1)) & 1
                    H[jdx, idx] += -W[(ja << 1) | jb, (ia << 1) | ib]
        w = np.linalg.eigvalsh(H)
        z = np.exp(-beta * (w - w.min()))
        exact = float(((w - w.min()) * z).sum() / z.sum()) + w.min()
        se = e.std() / np.sqrt(len(e))
        assert abs(e.mean() - exact) < max(4 * se, 0.08), (e.mean(), exact, se)

    def test_loop_cap_revert_unbiased(self):
        """The capped-walk revert deviation (``loops.py``; the reference
        walks forever, ``directed_loop.rs:177-301``) must not bias the
        stationary distribution: force a small cap so reverts actually fire,
        then check the energy still matches dense ED. A directed loop and
        its reversal traverse the same ops, so 'closes within the cap' is
        symmetric between a move and its inverse."""
        W = np.array(
            [
                [0.5, 0, 0, 0],
                [0, 1.0, 0.7, 0],
                [0, 0.7, 1.0, 0],
                [0, 0, 0, 0.5],
            ]
        )
        L, beta = 3, 1.2
        q = Qmc(L, replicas=256, seed=2, do_loop_updates=True)
        q.set_loop_cap(16)  # default is 4*K*M + 16; force frequent reverts
        for a in range(L - 1):
            q.make_interaction(W, [a, a + 1])
        for _ in range(40):
            q.timestep(beta)
        q.total_loop_reverts = q.total_loop_updates = 0
        total_n = jnp.zeros((256,), jnp.float32)
        for _ in range(150):
            q.timestep(beta)
            total_n = total_n + q.get_n()
        assert q.verify()
        rate = q.loop_revert_rate()
        assert 0.005 < rate < 0.95, f"cap must actually fire (rate={rate})"
        e = np.asarray(-(total_n / 150) / beta)

        dim = 1 << L
        H = np.zeros((dim, dim))
        for a in range(L - 1):
            for idx in range(dim):
                for jdx in range(dim):
                    if (idx | (1 << a) | (1 << (a + 1))) != (
                        jdx | (1 << a) | (1 << (a + 1))
                    ):
                        continue
                    ia, ib = (idx >> a) & 1, (idx >> (a + 1)) & 1
                    ja, jb = (jdx >> a) & 1, (jdx >> (a + 1)) & 1
                    H[jdx, idx] += -W[(ja << 1) | jb, (ia << 1) | ib]
        w = np.linalg.eigvalsh(H)
        z = np.exp(-beta * (w - w.min()))
        exact = float(((w - w.min()) * z).sum() / z.sum()) + w.min()
        se = e.std() / np.sqrt(len(e))
        assert abs(e.mean() - exact) < max(4 * se, 0.08), (
            e.mean(), exact, se, rate,
        )

    def test_symmetry_detection(self):
        q = Qmc(2, replicas=2, seed=14)
        q.make_diagonal_interaction([1.0, 2.0, 2.0, 1.0], [0, 1])
        assert not q.breaks_ising_symmetry
        q2 = Qmc(2, replicas=2, seed=15)
        q2.make_diagonal_interaction([1.0, 2.0, 2.0, 3.0], [0, 1])
        assert q2.breaks_ising_symmetry

    def test_cluster_edge_detection(self):
        q = Qmc(2, replicas=2, seed=16)
        q.make_interaction(np.full((2, 2), 0.5), [0])
        assert q.has_cluster_edges


class TestColdStartGrowth:
    """Regression: with NO explicit cutoff, the stepping drivers must grow
    the op string per step during the initial phase (the reference grows
    after every timestep, ``qmc_ising.rs:786``). Before the growth-phase fix
    a cold cutoff stayed truncated for whole fused chunks and biased the
    energy estimator high by O(1) per site."""

    def test_default_cutoff_energy_unbiased(self):
        edges = lattice.chain(8, j=1.0, periodic=True)
        beta, gamma = 1.4, 1.1
        exact = exact_tfim_energy(edges, gamma, 0.0, beta, 8)
        g = QmcIsingGraph(edges, transverse=gamma, replicas=96, seed=21)
        g.timesteps(40, beta, chunk=20)
        e = np.asarray(g.timesteps(200, beta, chunk=50))
        sem = e.std() / np.sqrt(len(e))
        assert g.cutoff >= 48, g.cutoff  # actually grew from the floor of 8
        assert e.mean() == pytest.approx(exact, abs=max(5 * sem, 0.2)), (
            e.mean(), exact,
        )

    def test_generic_qmc_default_cutoff(self):
        edges = lattice.chain(6, j=1.0, periodic=True)
        beta, gamma = 1.2, 0.9
        exact = exact_tfim_energy(edges, gamma, 0.0, beta, 6)
        g = QmcIsingGraph(edges, transverse=gamma, replicas=64, seed=22)
        q = g.into_qmc()
        q.timesteps(40, beta, chunk=20)
        e = np.asarray(q.timesteps(200, beta, chunk=50))
        sem = e.std() / np.sqrt(len(e))
        assert e.mean() == pytest.approx(exact, abs=max(5 * sem, 0.25)), (
            e.mean(), exact,
        )


class TestJordanWigner:
    def test_chain_matches_free_fermions(self):
        """L=24 periodic TFIM chain vs the Jordan-Wigner free-fermion
        finite-temperature energy (antiperiodic momenta / even-parity
        sector; corrections exponentially small at this size) — an exact
        oracle beyond dense-ED sizes."""
        L, beta, gamma = 24, 1.5, 1.0
        ks = (2 * np.arange(L) + 1) * np.pi / L
        eps = 2.0 * np.sqrt(1.0 + gamma**2 - 2.0 * gamma * np.cos(ks))
        exact = float(-(eps / 2.0 * np.tanh(beta * eps / 2.0)).sum())
        edges = lattice.chain(L, j=-1.0, periodic=True)
        g = QmcIsingGraph(edges, transverse=gamma, replicas=128, seed=31)
        g.timesteps(50, beta, chunk=25)
        e = np.asarray(g.timesteps(200, beta, chunk=50))
        sem = e.std() / np.sqrt(len(e))
        assert g.verify()
        assert e.mean() == pytest.approx(exact, abs=max(5 * sem, 0.25)), (
            e.mean(), exact,
        )


class TestClusterEvery:
    """``cluster_every`` thinning (a fixed schedule of detailed-balance
    updates) must sample the same distribution as the reference composition
    and keep worldlines valid."""

    def test_thinned_matches_reference_composition(self):
        from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

        edges = lattice.bench_two_d_periodic(4)

        def run(k, seed):
            g = QmcIsingGraph(edges, transverse=1.0, replicas=64, seed=seed)
            g.sse, _, _, _ = multi_sweep(
                g.sse, jnp.float32(1.0), g.model, 20
            )
            g._maybe_grow()
            g.sse, ns, _, _ = multi_sweep(
                g.sse, jnp.float32(1.0), g.model, 120, cluster_every=k
            )
            assert g.verify()
            return float(jnp.mean(ns[40:]))

        n1 = run(1, 3)
        n3 = run(3, 4)
        assert abs(n1 - n3) / n1 < 0.05, (n1, n3)

    def test_set_cluster_every_public_path(self):
        from isingmontecarlo_tpu.sse.ising import QmcIsingGraph

        g = QmcIsingGraph(
            lattice.bench_two_d_periodic(4), transverse=1.0, replicas=16,
            seed=5,
        )
        g.set_cluster_every(2)
        e = g.timesteps(40, 1.0)
        assert g.verify()
        assert e.shape == (16,)
