"""2D exact-diagonalization cross-checks (3x3 periodic lattices, 512-dim
Hilbert space): the strongest statistical oracles for the full update stack —
periodic wrap-around, frustration, longitudinal fields, heat-bath, and RVB
all validated against dense ED."""

import numpy as np
import pytest

import jax.numpy as jnp

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import QmcIsingGraph
from tests.test_sse import exact_tfim_energy


def exact_tfim_msq(edges, gamma, h, beta, nvars):
    """Thermal <(sum_i s^z_i)^2> by dense diagonalization."""
    dim = 1 << nvars
    H = np.zeros((dim, dim))
    msq = np.zeros(dim)
    for idx in range(dim):
        sz = [1.0 if (idx >> v) & 1 else -1.0 for v in range(nvars)]
        H[idx, idx] = sum(j * sz[a] * sz[b] for (a, b), j in edges) - h * sum(sz)
        msq[idx] = sum(sz) ** 2
        for v in range(nvars):
            H[idx ^ (1 << v), idx] += -gamma
    w, V = np.linalg.eigh(H)
    z = np.exp(-beta * (w - w.min()))
    # <M^2> = sum_n z_n <n|M^2|n> / Z with M^2 diagonal in the sz basis.
    msq_eig = np.einsum("in,i,in->n", V, msq, V)
    return float((msq_eig * z).sum() / z.sum())


def run_energy(g, beta, warm=60, steps=240, chunk=60):
    g.timesteps(warm, beta, chunk=chunk)
    e = np.asarray(g.timesteps(steps, beta, chunk=chunk))
    return e.mean(), e.std() / np.sqrt(len(e))


class Test2DEnergy:
    def test_3x3_periodic_ferromagnet(self):
        edges = lattice.square(3, 3, j=-1.0)
        beta, gamma = 1.0, 1.0
        exact = exact_tfim_energy(edges, gamma, 0.0, beta, 9)
        g = QmcIsingGraph(edges, gamma, cutoff=128, replicas=128, seed=3)
        mean, sem = run_energy(g, beta)
        assert mean == pytest.approx(exact, abs=max(5 * sem, 0.25)), (mean, exact)

    def test_3x3_frustrated(self):
        edges = lattice.frustrated_square(3, 3, j=1.0)
        beta, gamma = 1.0, 1.2
        exact = exact_tfim_energy(edges, gamma, 0.0, beta, 9)
        g = QmcIsingGraph(edges, gamma, cutoff=128, replicas=128, seed=4)
        mean, sem = run_energy(g, beta)
        assert mean == pytest.approx(exact, abs=max(5 * sem, 0.25)), (mean, exact)

    def test_3x3_longitudinal_heatbath(self):
        edges = lattice.square(3, 3, j=1.0)
        beta, gamma, h = 0.8, 1.0, 0.5
        exact = exact_tfim_energy(edges, gamma, h, beta, 9)
        g = QmcIsingGraph(
            edges, gamma, longitudinal=h, cutoff=128, replicas=128, seed=5
        )
        g.set_enable_heatbath(True)
        mean, sem = run_energy(g, beta)
        assert mean == pytest.approx(exact, abs=max(5 * sem, 0.25)), (mean, exact)

    def test_3x3_with_rvb(self):
        edges = lattice.square(3, 3, j=1.0)
        beta, gamma, h = 1.0, 1.0, 0.3
        exact = exact_tfim_energy(edges, gamma, h, beta, 9)
        g = QmcIsingGraph(
            edges, gamma, longitudinal=h, cutoff=128, replicas=96, seed=6
        )
        g.set_run_rvb(True, updates_per_timestep=3)
        mean, sem = run_energy(g, beta, warm=40, steps=160, chunk=40)
        assert g.verify()
        assert mean == pytest.approx(exact, abs=max(5 * sem, 0.3)), (mean, exact)


class Test4x3Energy:
    def test_4x3_periodic(self):
        """12-spin (4096-dim) dense-ED oracle: non-square periodic lattice,
        so the two wrap directions have different lengths — exercises the
        segment-contracted cluster labeling beyond the 3x3 cases."""
        edges = lattice.square(4, 3, j=-1.0)
        beta, gamma = 0.9, 1.1
        exact = exact_tfim_energy(edges, gamma, 0.0, beta, 12)
        g = QmcIsingGraph(edges, gamma, cutoff=160, replicas=128, seed=8)
        mean, sem = run_energy(g, beta, warm=50, steps=200, chunk=50)
        assert g.verify()
        assert mean == pytest.approx(exact, abs=max(5 * sem, 0.3)), (mean, exact)


def lanczos_tfim_energy(edges, gamma, beta, nvars, k=64):
    """Low-temperature thermal energy by sparse Lanczos (scipy ``eigsh``)
    over the lowest ``k`` eigenstates, with a rigorous truncation check:
    the neglected states' Boltzmann weight is bounded by
    ``dim * exp(-beta * (w[k-1] - w[0]))``, asserted < 1e-6."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.linalg import eigsh

    dim = 1 << nvars
    idx = np.arange(dim)
    diag = np.zeros(dim)
    for (a, b), j in edges:
        za = 1.0 - 2.0 * ((idx >> a) & 1)
        zb = 1.0 - 2.0 * ((idx >> b) & 1)
        diag += j * za * zb
    rows = [idx]
    cols = [idx]
    vals = [diag]
    for v in range(nvars):
        rows.append(idx ^ (1 << v))
        cols.append(idx)
        vals.append(np.full(dim, -gamma))
    H = coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(dim, dim),
    ).tocsr()
    w = eigsh(H, k=k, which="SA", return_eigenvectors=False)
    w = np.sort(w)
    cut = dim * np.exp(-beta * (w[-1] - w[0]))
    assert cut < 1e-6, f"Lanczos truncation too coarse: {cut}"
    z = np.exp(-beta * (w - w[0]))
    return float((w * z).sum() / z.sum())


class Test4x4Lanczos:
    def test_4x4_periodic_low_t(self):
        """16-spin periodic lattice (65536-dim, beyond dense ED): sparse
        Lanczos oracle at low temperature. Exercises deep-beta op strings
        (long imaginary-time extent) against an exact value."""
        edges = lattice.square(4, 4, j=-1.0)
        beta, gamma = 6.0, 1.5
        exact = lanczos_tfim_energy(edges, gamma, beta, 16)
        # Equilibrium <n> = beta*(offset - E) ~ 555 here: start the cutoff
        # above the n + n/2 steady state so growth lag can't bias early
        # measurement chunks, and warm across several growth checks.
        g = QmcIsingGraph(edges, gamma, cutoff=896, replicas=96, seed=9)
        mean, sem = run_energy(g, beta, warm=120, steps=200, chunk=40)
        assert g.verify()
        assert mean == pytest.approx(exact, abs=max(5 * sem, 0.35)), (mean, exact)


class Test2DMagnetization:
    def test_3x3_msq_matches_ed(self):
        edges = lattice.square(3, 3, j=-1.0)
        beta, gamma = 0.8, 1.5
        exact = exact_tfim_msq(edges, gamma, 0.0, beta, 9)
        g = QmcIsingGraph(edges, gamma, cutoff=128, replicas=128, seed=7)
        g.timesteps(60, beta, chunk=60)
        states, _ = g.timesteps_sample(300, beta, sampling_freq=3, chunk=60)
        s = 2.0 * states.astype(np.float64) - 1.0  # [S, R, N]
        msq = (s.sum(axis=-1) ** 2).mean(axis=0)  # [R]
        mean = msq.mean()
        sem = msq.std() / np.sqrt(len(msq))
        assert mean == pytest.approx(exact, abs=max(5 * sem, 0.6)), (mean, exact)
