"""Classical engine tests.

Mirrors the reference's test strategy (SURVEY.md section 4): seeded soaks with
physics oracles — known ground states at high beta, exact finite-size
observables at moderate beta, statistical tolerances over replica batches.
"""

import jax
import jax.numpy as jnp
import numpy as np

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.classical import GraphState, cluster, metropolis, worm


def exact_chain_energy_per_bond(beta: float, j: float) -> float:
    """Free-boundary 1D Ising chain: E/bond = -|J| tanh(beta |J|)."""
    return -abs(j) * np.tanh(beta * abs(j))


class TestEnergy:
    def test_ferromagnet_ground_state_energy(self):
        edges = lattice.square(4, 4, j=-1.0)  # J<0: aligned favored
        g = GraphState.new(edges, [0.0] * 16, replicas=3, seed=1)
        g.set_state(np.ones(16, dtype=bool))
        e = np.asarray(g.get_energy())
        assert np.allclose(e, -len(edges))

    def test_bias_energy_sign(self):
        # E_bias = -h sigma (graph.rs:442-444): all-up with h>0 lowers energy.
        g = GraphState.new([((0, 1), 0.0)], [2.0, 2.0], replicas=1, seed=0)
        g.set_state(np.ones(2, dtype=bool))
        assert np.allclose(np.asarray(g.get_energy()), -4.0)

    def test_magnetization(self):
        g = GraphState.new([((0, 1), 1.0)], [0.0, 0.0], replicas=1, seed=0)
        g.set_state(np.array([True, False]))
        assert np.allclose(np.asarray(g.get_magnetization()), 0.0)


class TestMetropolis:
    def test_high_beta_reaches_ground_state(self):
        L = 4
        edges = lattice.square(L, L, j=-1.0)
        tables = metropolis.build_tables(edges, [0.0] * (L * L))
        spins = jax.random.bernoulli(jax.random.key(2), 0.5, (8, L * L))
        spins, _ = metropolis.metropolis_run(
            spins, jax.random.key(3), 10.0, tables, 100
        )
        e = np.asarray(metropolis.energy(spins, tables))
        assert np.mean(e) < -0.9 * len(edges)

    def test_chain_energy_matches_exact(self):
        L, beta = 32, 0.7
        edges = lattice.chain(L, j=1.0, periodic=False)
        tables = metropolis.build_tables(edges, [0.0] * L)
        spins = jax.random.bernoulli(jax.random.key(4), 0.5, (256, L))
        spins, _ = metropolis.metropolis_run(
            spins, jax.random.key(5), beta, tables, 200
        )
        _, es = metropolis.metropolis_run(
            spins, jax.random.key(6), beta, tables, 200, measure=True
        )
        e_mean = float(jnp.mean(es)) / (L - 1)
        exact = exact_chain_energy_per_bond(beta, 1.0)
        assert abs(e_mean - exact) < 0.02, (e_mean, exact)

    def test_per_replica_beta(self):
        L = 4
        edges = lattice.square(L, L, j=-1.0)
        tables = metropolis.build_tables(edges, [0.0] * (L * L))
        spins = jax.random.bernoulli(jax.random.key(0), 0.5, (2, L * L))
        betas = jnp.array([0.05, 5.0])
        spins, _ = metropolis.metropolis_run(
            spins, jax.random.key(1), betas, tables, 200
        )
        e = np.asarray(metropolis.energy(spins, tables))
        assert e[1] < -0.9 * len(edges)
        assert e[0] > -0.7 * len(edges)


class TestCheckerboard:
    def test_matches_graph_version_statistics(self):
        # The [R, L, L] fast path must agree with the general graph engine on
        # mean energy at the same temperature.
        L, beta, R = 8, 0.35, 128
        edges = lattice.square(L, L, j=-1.0)
        tables = metropolis.build_tables(edges, [0.0] * (L * L))
        spins_g = jax.random.bernoulli(jax.random.key(1), 0.5, (R, L * L))
        spins_l = jax.random.bernoulli(jax.random.key(2), 0.5, (R, L, L))

        spins_g, _ = metropolis.metropolis_run(
            spins_g, jax.random.key(3), beta, tables, 150
        )
        _, eg = metropolis.metropolis_run(
            spins_g, jax.random.key(4), beta, tables, 250, measure=True
        )

        @jax.jit
        def lat_run(spins, key):
            def body(carry, _):
                spins, key = carry
                key, sub = jax.random.split(key)
                spins = metropolis.checkerboard_sweep(spins, sub, beta, -1.0, 0.0)
                return (spins, key), metropolis.lattice_energy(spins, -1.0, 0.0)

            return jax.lax.scan(body, (spins, key), None, length=400)

        (_, _), el = lat_run(spins_l, jax.random.key(5))
        eg_mean = float(jnp.mean(eg))
        el_mean = float(jnp.mean(el[150:]))
        assert abs(eg_mean - el_mean) < 0.02 * L * L, (eg_mean, el_mean)


class TestCompactColorLayout:
    def test_split_merge_roundtrip(self):
        from isingmontecarlo_tpu.ops.checkerboard import merge_colors, split_colors

        rng = np.random.default_rng(0)
        s = rng.integers(0, 2, (3, 8, 8)).astype(bool)
        eo = split_colors(jnp.asarray(s))
        assert eo.shape == (3, 2, 8, 4)
        assert np.array_equal(np.asarray(merge_colors(eo)), s)

    def test_compact_neighbor_sums_match_full_field(self):
        # The Pallas kernel computes neighbor sums on compacted (L, L/2)
        # color planes via rolls of the other plane + a row-parity select.
        # Verify that formula against brute-force full-field neighbor sums.
        L = 8
        rng = np.random.default_rng(7)
        sf = rng.integers(0, 2, (L, L)).astype(np.float32) * 2 - 1

        def split(f):
            e = np.empty((L, L // 2), f.dtype)
            o = np.empty((L, L // 2), f.dtype)
            for y in range(L):
                for k in range(L // 2):
                    e[y, k] = f[y, 2 * k + (y & 1)]
                    o[y, k] = f[y, 2 * k + 1 - (y & 1)]
            return e, o

        full_nsum = (
            np.roll(sf, 1, 0) + np.roll(sf, -1, 0)
            + np.roll(sf, 1, 1) + np.roll(sf, -1, 1)
        )
        want_e, want_o = split(full_nsum)
        e, o = split(sf)
        row_even = (np.arange(L) % 2 == 0)[:, None]
        nsum_e = (
            np.roll(o, 1, 0) + np.roll(o, -1, 0) + o
            + np.where(row_even, np.roll(o, 1, 1), np.roll(o, -1, 1))
        )
        nsum_o = (
            np.roll(e, 1, 0) + np.roll(e, -1, 0) + e
            + np.where(row_even, np.roll(e, -1, 1), np.roll(e, 1, 1))
        )
        assert np.array_equal(nsum_e, want_e)
        assert np.array_equal(nsum_o, want_o)


class TestEdgeFlips:
    def test_preserves_detailed_balance_on_chain(self):
        L, beta = 16, 0.6
        edges = lattice.chain(L, j=1.0, periodic=False)
        tables = metropolis.build_tables(edges, [0.0] * L)
        spins = jax.random.bernoulli(jax.random.key(1), 0.5, (256, L))

        @jax.jit
        def run(spins, key):
            def body(carry, _):
                spins, key = carry
                key, s1, s2 = jax.random.split(key, 3)
                spins = metropolis.spin_flip_sweep(spins, s1, beta, tables)
                spins = metropolis.edge_flip_sweep(spins, s2, beta, tables)
                return (spins, key), metropolis.energy(spins, tables)

            return jax.lax.scan(body, (spins, key), None, length=300)

        (_, _), es = run(spins, jax.random.key(2))
        e_mean = float(jnp.mean(es[120:]))
        exact = (L - 1) * exact_chain_energy_per_bond(beta, 1.0)
        assert abs(e_mean - exact) < 0.3, (e_mean, exact)


class TestWorm:
    def test_worm_preserves_coupling_energy_exactly(self):
        # A worm is an initial flip + a zero-dE walk + a closing move that
        # cancels the initial energy change (or a full revert on failure), so
        # with h=0 the energy is preserved *exactly* (graph.rs:179-318).
        L, beta = 12, 0.5
        edges = lattice.chain(L, j=1.0, periodic=True)
        tables = metropolis.build_tables(edges, [0.0] * L)
        spins = jax.random.bernoulli(jax.random.key(4), 0.5, (64, L))
        key = jax.random.key(10)
        for _ in range(10):
            e_before = np.asarray(metropolis.energy(spins, tables))
            key, sub = jax.random.split(key)
            spins = worm.worm_sweep(spins, sub, beta, tables)
            e_after = np.asarray(metropolis.energy(spins, tables))
            np.testing.assert_allclose(e_before, e_after, atol=1e-4)

    def test_worm_moves_between_ground_states(self):
        # High-beta frustrated triangle ring: worms must move between
        # degenerate ground states (the role exercised by the reference's
        # worm tests on triangle/chain lattices, graph.rs:455-648).
        edges = [((0, 1), 1.0), ((1, 2), 1.0), ((2, 0), 1.0)]
        tables = metropolis.build_tables(edges, [0.0, 0.0, 0.0])
        # Ground states of the AFM triangle: any state with exactly one
        # unsatisfied bond (6 of 8 states). Start in one.
        spins = jnp.broadcast_to(
            jnp.array([[True, False, False]]), (64, 3)
        )
        seen = set()
        key = jax.random.key(11)
        for _ in range(20):
            key, sub = jax.random.split(key)
            spins = worm.worm_sweep(spins, sub, 50.0, tables)
            for row in np.asarray(spins):
                seen.add(tuple(row))
        assert len(seen) > 1, "worm never moved between degenerate states"

    def test_worm_terminates_on_frustrated_triangle(self):
        edges = [((0, 1), 1.0), ((1, 2), 1.0), ((2, 0), 1.0)]
        tables = metropolis.build_tables(edges, [0.0, 0.0, 0.0])
        key = jax.random.key(7)
        spins = jax.random.bernoulli(key, 0.5, (32, 3))
        for i in range(5):
            key, sub = jax.random.split(key)
            spins = worm.worm_sweep(spins, sub, 2.0, tables)
        assert spins.shape == (32, 3)


class TestClusters:
    def test_swendsen_wang_equilibrium(self):
        L, beta = 16, 0.6
        edges = lattice.chain(L, j=-1.0, periodic=False)
        tables = metropolis.build_tables(edges, [0.0] * L)
        spins = jax.random.bernoulli(jax.random.key(8), 0.5, (256, L))
        spins, _ = cluster.swendsen_wang_run(
            spins, jax.random.key(9), beta, tables, 60
        )
        _, es = cluster.swendsen_wang_run(
            spins, jax.random.key(10), beta, tables, 150, measure=True
        )
        e_mean = float(jnp.mean(es))
        exact = (L - 1) * exact_chain_energy_per_bond(beta, 1.0)
        assert abs(e_mean - exact) < 0.3, (e_mean, exact)

    def test_wolff_runs(self):
        L = 8
        edges = lattice.square(L, L, j=-1.0)
        tables = metropolis.build_tables(edges, [0.0] * (L * L))
        spins = jnp.ones((4, L * L), bool)
        out = cluster.wolff_sweep(spins, jax.random.key(9), 1.0, tables)
        assert out.shape == spins.shape

    def test_sw_respects_biases(self):
        # Ferromagnetic ring + strong +h bias: aligned clusters flip toward
        # the field (per-cluster Metropolis factor) and stay there.
        L = 8
        edges = [((i, (i + 1) % L), -0.5) for i in range(L)]
        tables = metropolis.build_tables(edges, [3.0] * L)
        spins = jnp.zeros((16, L), bool)
        spins, _ = cluster.swendsen_wang_run(
            spins, jax.random.key(11), 2.0, tables, 30
        )
        m = float(jnp.mean(metropolis.magnetization(spins)))
        assert m > 0.5 * L, m


class TestGraphStateSurface:
    """Small reference-parity surface items (``graph.rs:17-31, 91-119,
    339-347, 409-412``)."""

    def test_should_flip(self):
        key = jax.random.key(0)
        de = jnp.array([-1.0, 0.0, 1e9])
        acc = GraphState.should_flip(key, 1.0, de)
        assert bool(acc[0]) and bool(acc[1]) and not bool(acc[2])
        # Statistical check at dE=1, beta=1: accept rate ~ exp(-1).
        keys = jax.random.split(jax.random.key(1), 400)
        hits = sum(
            bool(GraphState.should_flip(k, 1.0, 1.0)) for k in keys
        )
        assert abs(hits / 400 - np.exp(-1.0)) < 0.08

    def test_do_spin_flip_and_get_state(self):
        L = 6
        edges = [((i, (i + 1) % L), -1.0) for i in range(L)]
        g = GraphState.new(edges, [0.0] * L, replicas=8, seed=3)
        e0 = float(jnp.mean(g.get_energy()))
        for _ in range(30):
            g.do_spin_flip(3.0)
        assert float(jnp.mean(g.get_energy())) <= e0
        s = g.get_state()
        assert s.shape == (8, L) and s.dtype == bool
        assert np.array_equal(s, g.clone_state())

    def test_repr_matches_debug_format(self):
        g = GraphState.new(
            [((0, 1), -1.0)], [0.0, 0.0], replicas=2, seed=0
        )
        lines = repr(g).splitlines()
        assert len(lines) == 2
        bits, energy = lines[0].split("\t")
        assert set(bits) <= {"0", "1"} and len(bits) == 2
        float(energy)


class TestWormBiasConvention:
    def test_worm_biased_matches_exact_enumeration(self):
        """h != 0 worm validation (the round-1 deviation stress ask): the
        worm's close-time bias Metropolis test uses the physical energy
        change of the net flip (``worm.py`` module docstring; the reference
        evaluates the negation, ``graph.rs:303-306``). On a 3-site chain
        with per-site biases the full move composition must sample the
        exact Boltzmann distribution over all 8 states — a sign error in
        the worm accept would skew this visibly (worms fire on ~1/3 of
        steps)."""
        edges = [((0, 1), 1.0), ((1, 2), 1.0)]
        biases = [0.3, -0.2, 0.5]
        beta = 0.8
        R = 512
        g = GraphState.new(edges, biases, replicas=R, seed=3)

        # Exact distribution from the engine's own energy function.
        probe = GraphState.new(edges, biases, replicas=1, seed=0)
        e_exact = np.zeros(8)
        for s in range(8):
            probe.set_state(np.array([[bool(s >> v & 1) for v in range(3)]]))
            e_exact[s] = float(np.asarray(probe.get_energy())[0])
        w = np.exp(-beta * (e_exact - e_exact.min()))
        p_exact = w / w.sum()

        g.run_timesteps(60, beta)  # burn-in
        counts = np.zeros(8)
        nsteps = 240
        for _ in range(nsteps):
            g.do_time_step(beta)
            st = np.asarray(g.state_ref())  # bool[R, 3]
            idx = st[:, 0] + 2 * st[:, 1] + 4 * st[:, 2]
            counts += np.bincount(idx, minlength=8)
        p_emp = counts / counts.sum()
        # ~123k correlated samples; 0.02 absolute is ~10x the wrong-sign skew
        # detection threshold measured by flipping the convention by hand.
        np.testing.assert_allclose(p_emp, p_exact, atol=0.02)

    def test_worm_fires_and_reverts_consistently_with_bias(self):
        """Worm-only stepping at h != 0 keeps the coupling energy exactly
        conserved per accepted worm (zero-dE walks) while the bias term
        fluctuates — a structural check that the bias accept gates whole
        net-flips, not partial paths."""
        edges = [((0, 1), 1.0), ((1, 2), 1.0), ((2, 0), 1.0)]
        biases = [0.4, 0.0, -0.3]
        beta = 1.0
        g = GraphState.new(edges, biases, replicas=64, seed=8)
        for _ in range(40):
            spins_before = np.asarray(g.state_ref())
            g.spins = worm.worm_sweep(g.spins, g._split(), beta, g.tables)
            spins_after = np.asarray(g.state_ref())
            # coupling-only energy must be unchanged by a worm sweep
            def coupling_e(st):
                e = np.zeros(st.shape[0])
                for (a, b), j in edges:
                    sa = 2.0 * st[:, a] - 1
                    sb = 2.0 * st[:, b] - 1
                    e += j * sa * sb
                return e
            np.testing.assert_allclose(
                coupling_e(spins_before), coupling_e(spins_after), atol=1e-5
            )
