"""shard_map tempering chunk (tempering_sweep_chunk_sharded): the multi-chip
path where every sweep op is forced replica-local and swap traffic is only
the label vectors (scripts/collectives_audit.py inventories the HLO).

Covers: engagement via TemperingContainer.shard_over, label-multiset
conservation through sharded swaps, the signed (bond_xor) path, equal-beta
full acceptance (deterministic), cross-device replica independence (the
per-device RNG fold), and the growth-streak regression that kept
``_growth_pending`` stuck under single-step driver calls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.parallel import tempering as pt
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh (conftest)")
    return Mesh(np.array(devs[:8]), axis_names=("replicas",))


def _disorder_edges(js):
    return [((i, (i + 1) % 4), js[i]) for i in range(4)]


def test_sharded_chunk_engages_and_conserves_labels(monkeypatch):
    mesh = _mesh()
    calls = {"sharded": 0}
    orig = pt.tempering_sweep_chunk_sharded

    def counting(*a, **k):
        calls["sharded"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(pt, "tempering_sweep_chunk_sharded", counting)
    bet = [0.5, 0.8, 1.1, 1.4, 1.7, 2.0, 2.3, 2.6]
    c = pt.TemperingContainer(
        lattice.square(4, 4, j=1.0), transverse=1.0, betas=bet,
        replicas_per_beta=2, seed=3,
        transverse_scales=[1.0 + 0.02 * i for i in range(8)],
    )
    c.shard_over(mesh)
    states, bets = c.timesteps_sample(48, swap_freq=2, sampling_freq=8)
    assert calls["sharded"] > 0, "sharded chunk never engaged after growth"
    assert c.graph.verify()
    want = sorted(np.repeat(np.asarray(bet, np.float32), 2).tolist())
    assert sorted(np.asarray(c.betas).tolist()) == want
    assert states.shape[1:] == (16, 16)


def test_sharded_signed_ladder_swaps_and_conserves_xors():
    mesh = _mesh()
    beta = 1.0
    tc = pt.new_with_rng(seed=13)
    tc.add_qmc_stepper(
        QmcIsingGraph(
            _disorder_edges([1.0, 1.0, 1.0, 1.0]), transverse=1.0,
            replicas=8, seed=3,
        ),
        beta,
    )
    tc.add_qmc_stepper(
        QmcIsingGraph(
            _disorder_edges([-1.0, 1.0, 1.0, 1.0]), transverse=1.0,
            replicas=8, seed=4,
        ),
        beta,
    )
    tc.shard_over(mesh)
    states, _ = tc.timesteps_sample(32, swap_freq=2, chunk=8)
    assert tc.verify()
    assert tc.get_total_swaps() > 0, "signed sharded ladder should swap"
    x0 = np.sort(np.asarray(tc.xors[:, 0]))
    np.testing.assert_array_equal(x0, np.r_[np.zeros(8), np.ones(8)])


def test_sharded_equal_betas_accept_every_pair():
    """Equal betas, uniform Hamiltonian: log p = 0, so every proposed pair
    must swap — pins the sharded acceptance arithmetic and the redundant
    replicated permutation."""
    from isingmontecarlo_tpu.parallel.tempering import (
        tempering_sweep_chunk_sharded,
    )

    mesh = _mesh()
    R = 16
    g = QmcIsingGraph(
        lattice.square(4, 4, j=1.0), transverse=1.0, cutoff=64,
        replicas=R, seed=0,
    )
    betas = jnp.full((R,), 1.0, jnp.float32)
    scales = jnp.ones((R, g.model.nbonds), jnp.float32)
    nsweeps = 4
    out = tempering_sweep_chunk_sharded(
        g.sse, betas, scales, jnp.int32(0), jnp.ones((nsweeps,), bool),
        g.model, nsweeps, mesh=mesh,
    )
    nswaps = int(out[6])
    # parity alternates 0,1,0,1 -> pairs per sweep: R/2, R/2-1, ...
    expect = (R // 2) + (R // 2 - 1) + (R // 2) + (R // 2 - 1)
    assert nswaps == expect


def test_sharded_replicas_draw_independent_streams():
    """Device-index RNG fold: replicas living on different devices must not
    evolve identically even when seeded from one replicated key."""
    from isingmontecarlo_tpu.parallel.tempering import (
        tempering_sweep_chunk_sharded,
    )

    mesh = _mesh()
    R = 16  # 2 per device
    g = QmcIsingGraph(
        lattice.square(4, 4, j=1.0), transverse=1.0, cutoff=64,
        replicas=R, seed=5,
    )
    betas = jnp.full((R,), 1.2, jnp.float32)
    scales = jnp.ones((R, g.model.nbonds), jnp.float32)
    out = tempering_sweep_chunk_sharded(
        g.sse, betas, scales, jnp.int32(0), jnp.zeros((6,), bool),
        g.model, 6, mesh=mesh,
    )
    bonds = np.asarray(out[0].ops.bond)  # [M, R]
    # Replicas 0 and 2 sit on different devices and share the replica-local
    # lane index — identical op strings would mean the device fold is dead.
    assert not np.array_equal(bonds[:, 0], bonds[:, 2])
    # Same-device lanes must differ too (lane-indexed draws).
    assert not np.array_equal(bonds[:, 0], bonds[:, 1])


def test_sharded_replication_invariant_fingerprint():
    """``check_vma=False`` disables shard_map's static replication check, so
    the chunk's correctness claim — perm/nswaps/parity/key are computed
    redundantly and IDENTICALLY on every device from replicated inputs — is
    guarded here dynamically: ``debug_rep_check=True`` emits each device's
    fingerprint of its replicated values broadcast along its local replica
    rows; all R rows must agree."""
    from isingmontecarlo_tpu.parallel.tempering import (
        tempering_sweep_chunk_sharded,
    )

    mesh = _mesh()
    R = 16
    g = QmcIsingGraph(
        lattice.square(4, 4, j=1.0), transverse=1.0, cutoff=64,
        replicas=R, seed=9,
    )
    betas = jnp.asarray(np.linspace(0.6, 2.0, R), jnp.float32)
    scales = jnp.ones((R, g.model.nbonds), jnp.float32)
    nsweeps = 4
    out = tempering_sweep_chunk_sharded(
        g.sse, betas, scales, jnp.int32(0), jnp.ones((nsweeps,), bool),
        g.model, nsweeps, mesh=mesh, debug_rep_check=True,
    )
    fp = np.asarray(out[-1])  # [R, 3]
    assert fp.shape == (R, 3)
    np.testing.assert_array_equal(fp, np.broadcast_to(fp[:1], fp.shape))


def test_growth_pending_clears_under_single_step_calls():
    """Regression: the no-growth streak persists across driver calls, so
    repeated ``timesteps(1)`` eventually clears ``_growth_pending`` (it was
    stuck forever, which kept the container's fused chunk unreachable)."""
    g = QmcIsingGraph(
        lattice.square(4, 4, j=1.0), transverse=1.0, replicas=8, seed=0,
    )
    assert g._growth_pending
    for _ in range(60):
        g.timesteps(1, beta=1.0)
        if not g._growth_pending:
            break
    assert not g._growth_pending, (
        "60 single-step calls never cleared the growth phase"
    )
