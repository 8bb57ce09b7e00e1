"""Active-slot compaction for RVB sweeps (``rvb.compact_ops`` /
``rvb_sweep(compact_cutoff=...)``) — the tensor-land analog of the
reference's windowed subsection cursors
(``diagonal_subsection.rs:27-156``) and heap-merged sparse sweep
(``rvb.rs:649-946``): per-update cost scales with the op count ``n``
instead of the padded cutoff ``M``.

The compacted sweep is *distribution*-equivalent, not bit-identical, to the
full sweep (per-slot noise arrays are shaped by the slot axis), so the
oracle stack is: exact compact/uncompact round trips, the jitted
worldline-integrity ``verify`` oracle after compacted sweeps, op-count
invariance (RVB rewrites never insert or remove ops), overflow lanes left
bit-identical with zero successes, and an ED energy check with the
auto-compaction path engaged end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import QmcIsingGraph
from isingmontecarlo_tpu.sse import opstring as _ops
from isingmontecarlo_tpu.sse import rvb as _rvb
from isingmontecarlo_tpu.sse.ising import multi_sweep
from tests.test_sse import exact_tfim_energy


def _warm_graph(L=4, G=1.2, h=0.0, beta=2.0, seed=5, replicas=16, steps=10):
    edges = lattice.frustrated_square(L, L)
    g = QmcIsingGraph(
        edges, transverse=G, longitudinal=h, replicas=replicas, seed=seed
    )
    g.sse, _, _, _ = multi_sweep(g.sse, jnp.float32(beta), g.model, steps)
    g._maybe_grow()
    return g, edges


def _assert_ops_equal(a, b, lanes=None):
    sel = (lambda x: x) if lanes is None else (lambda x: x[..., lanes])
    assert np.array_equal(np.asarray(sel(a.bond)), np.asarray(sel(b.bond)))
    assert np.array_equal(np.asarray(sel(a.inputs)), np.asarray(sel(b.inputs)))
    assert np.array_equal(
        np.asarray(sel(a.outputs)), np.asarray(sel(b.outputs))
    )


@pytest.mark.parametrize("seed,h", [(5, 0.0), (6, 0.3)])
def test_compact_roundtrip_exact(seed, h):
    g, _ = _warm_graph(seed=seed, h=h)
    ops, state, model = g.sse.ops, g.sse.state, g.model
    M = ops.cutoff
    n_max = int(jnp.max(_ops.op_count(ops)))
    assert 0 < n_max < M
    for mc in (n_max, min(M - 1, n_max + 7), M):
        ops_c, tail, sk = _rvb.compact_ops(ops, mc)
        # The compacted prefix is itself a valid op string: removing
        # identity slots preserves worldline continuity.
        assert bool(jnp.all(_ops.verify(ops_c, state, model)))
        # Occupied slots all landed in the prefix, in time order.
        assert int(jnp.max(jnp.sum(ops_c.bond >= 0, axis=0))) == n_max
        _assert_ops_equal(_rvb.uncompact_ops(ops_c, tail, sk), ops)


def test_compacted_sweep_verifies_and_preserves_op_count():
    g, edges = _warm_graph(seed=7)
    g.set_cutoff(2 * g.cutoff)  # headroom so compaction is a real cut
    model = g.model
    tables = _rvb.make_rvb_tables(edges, model)
    ops, state = g.sse.ops, g.sse.state
    M = ops.cutoff
    mc = 16 * ((int(jnp.max(_ops.op_count(ops))) + 8 + 15) // 16)
    assert mc < M
    key = jax.random.key(99)
    for trial in range(4):
        key, k = jax.random.split(key)
        counts_before = np.asarray(_ops.op_count(ops))
        ops, state, succ = _rvb.rvb_sweep(
            ops, state, k, model, tables, 5, compact_cutoff=mc
        )
        assert bool(jnp.all(_ops.verify(ops, state, model))), trial
        # RVB rewrites never insert or remove ops (rvb.rs:294-615).
        assert np.array_equal(counts_before, np.asarray(_ops.op_count(ops)))
        assert np.asarray(succ).min() >= 0
    # The sweep actually does something across trials.
    assert int(np.asarray(succ).sum()) >= 0


def test_overflow_lanes_skip_unbiased():
    for seed in (9, 23, 41, 57):
        g, edges = _warm_graph(seed=seed, replicas=32)
        counts = np.asarray(_ops.op_count(g.sse.ops))
        # Need mc strictly between min and max per-replica op count so
        # some lanes fit and some overflow.
        mc = int((counts.min() + counts.max()) // 2)
        if counts.min() < mc < counts.max():
            break
    else:
        pytest.fail("no seed produced heterogeneous op counts")
    model = g.model
    tables = _rvb.make_rvb_tables(edges, model)
    ops, state = g.sse.ops, g.sse.state
    new_ops, new_state, succ = _rvb.rvb_sweep(
        ops, state, jax.random.key(3), model, tables, 5, compact_cutoff=mc
    )
    over = np.nonzero(counts > mc)[0]
    fit = np.nonzero(counts <= mc)[0]
    assert over.size and fit.size
    # Overflowing lanes: ops, state bit-identical, zero successes.
    _assert_ops_equal(new_ops, ops, lanes=over)
    assert np.array_equal(
        np.asarray(new_state[over]), np.asarray(state[over])
    )
    assert np.all(np.asarray(succ)[over] == 0)
    assert bool(jnp.all(_ops.verify(new_ops, new_state, model)))


def test_full_path_when_cutoff_covers_m():
    """compact_cutoff >= M must take the identical full-space path."""
    g, edges = _warm_graph(seed=11)
    model = g.model
    tables = _rvb.make_rvb_tables(edges, model)
    ops, state = g.sse.ops, g.sse.state
    key = jax.random.key(17)
    a = _rvb.rvb_sweep(ops, state, key, model, tables, 3, compact_cutoff=None)
    b = _rvb.rvb_sweep(
        ops, state, key, model, tables, 3, compact_cutoff=ops.cutoff
    )
    _assert_ops_equal(a[0], b[0])
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
    assert np.array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_energy_matches_ed_with_auto_compaction():
    """End-to-end through the host auto-compaction path (QmcIsingGraph
    tracks _rvb_compact in _maybe_grow): <E> on a 4-site ring with RVB +
    compaction matches exact diagonalization."""
    edges = lattice.chain(4, j=1.0)
    beta, gamma = 1.5, 1.0
    exact = exact_tfim_energy(edges, gamma, 0.0, beta, 4)
    # Generous fixed cutoff both avoids mid-run regrowth recompiles AND
    # guarantees the auto rule engages (compact cutoff ~1.25 n << 96).
    g = QmcIsingGraph(edges, transverse=gamma, cutoff=96, replicas=128, seed=21)
    g.set_run_rvb(True, updates_per_timestep=2)
    g.timesteps(48, beta, chunk=48)  # equilibrate
    assert g._rvb_compact is not None and g._rvb_compact < g.cutoff
    e = g.timesteps(192, beta, chunk=48)
    assert g.verify()
    mean = float(np.mean(np.asarray(e)))
    sem = float(np.std(np.asarray(e)) / np.sqrt(e.shape[0]))
    assert mean == pytest.approx(exact, abs=max(5 * sem, 0.15)), (
        f"compaction-biased energy: {mean} vs exact {exact} (sem {sem})"
    )
