"""Equivalence oracle for the fused RVB acceptance+mutation scan.

The fused single-scan path (``_fused_scan`` inside ``rvb_update_once``) must
be bit-identical to the legacy two-scan path (``_acceptance_scan`` then
``_mutation_scan``): the mutation carry satisfies the invariant
``substate_mut == substate_acc ^ incl`` (and ``incl_mut == incl_acc``), so
one sweep over imaginary time can emit the assume-accepted candidate rewrite
while accumulating the acceptance probability — same key splits, same
Gumbel draws, same arithmetic (see ``rvb.rs:649-946`` acceptance and
``rvb.rs:294-615`` mutation in the reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import rvb as _rvb
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep


@pytest.mark.parametrize(
    "L,G,h,beta,seed",
    [
        (3, 1.0, 0.0, 4.0, 11),
        (4, 0.8, 0.0, 2.0, 12),
        (3, 1.0, 0.4, 3.0, 13),
    ],
)
def test_fused_matches_legacy_two_scan(L, G, h, beta, seed, monkeypatch):
    # Pin the scan path: the legacy two-scan oracle is bit-identical to
    # _fused_scan specifically (the vectorized path is checked separately
    # with a p_acc tolerance, since its log-weight summation order differs).
    monkeypatch.setattr(_rvb, "_FORCE_VEC", False)
    edges = lattice.frustrated_square(L, L)
    g = QmcIsingGraph(
        edges, transverse=G, longitudinal=h, replicas=16, seed=seed
    )
    g.sse, _, _, _ = multi_sweep(g.sse, jnp.float32(beta), g.model, 12)
    g._maybe_grow()
    ops, state, model = g.sse.ops, g.sse.state, g.model
    tables = _rvb.make_rvb_tables(edges, model)

    for trial in range(3):
        key = jax.random.key(1000 + trial)
        a_ops, a_state, a_acc = _rvb._rvb_update_once_legacy(
            ops, state, key, model, tables
        )
        b_ops, b_state, b_acc = _rvb.rvb_update_once(
            ops, state, key, model, tables
        )
        assert np.array_equal(np.asarray(a_acc), np.asarray(b_acc))
        assert np.array_equal(np.asarray(a_ops.bond), np.asarray(b_ops.bond))
        assert np.array_equal(
            np.asarray(a_ops.inputs), np.asarray(b_ops.inputs)
        )
        assert np.array_equal(
            np.asarray(a_ops.outputs), np.asarray(b_ops.outputs)
        )
        assert np.array_equal(np.asarray(a_state), np.asarray(b_state))
        # advance the chain so later trials see mutated strings
        ops, state = a_ops, a_state


@pytest.mark.parametrize(
    "L,G,h,beta,seed",
    [
        (3, 1.0, 0.0, 4.0, 31),
        (3, 1.0, 0.4, 3.0, 33),
    ],
)
def test_batched_build_sweep_matches_sequential(L, G, h, beta, seed):
    """``rvb_sweep``'s batched cluster-build path (all builds in one vmapped
    pass up front) must be bit-identical to the sequential form (one
    ``rvb_update_once`` per update with the shared inventory): same per-update
    key splits, and builds depend only on the sweep-invariant constant-op
    inventory."""
    edges = lattice.frustrated_square(L, L)
    g = QmcIsingGraph(
        edges, transverse=G, longitudinal=h, replicas=16, seed=seed
    )
    g.sse, _, _, _ = multi_sweep(g.sse, jnp.float32(beta), g.model, 12)
    g._maybe_grow()
    ops, state, model = g.sse.ops, g.sse.state, g.model
    tables = _rvb.make_rvb_tables(edges, model)
    n_updates = 5

    key = jax.random.key(777 + seed)
    assert (
        n_updates * state.shape[0]
        * max(ops.bond.shape[0] * tables.neigh_bond.shape[1],
              ops.bond.shape[0] + model.nvars)
        <= _rvb._BUILD_BATCH_MAX_ELEMS
    ), "test must exercise the batched-build path"
    b_ops, b_state, b_succ = _rvb.rvb_sweep(
        ops, state, key, model, tables, n_updates
    )

    inventory = _rvb._const_inventory(ops, model)
    s_ops, s_state = ops, state
    s_succ = jnp.zeros(state.shape[0], jnp.int32)
    for k in jax.random.split(key, n_updates):
        s_ops, s_state, acc = _rvb.rvb_update_once(
            s_ops, s_state, k, model, tables, inventory=inventory
        )
        s_succ = s_succ + acc.astype(jnp.int32)

    assert np.array_equal(np.asarray(b_succ), np.asarray(s_succ))
    assert np.array_equal(np.asarray(b_ops.bond), np.asarray(s_ops.bond))
    assert np.array_equal(np.asarray(b_ops.inputs), np.asarray(s_ops.inputs))
    assert np.array_equal(np.asarray(b_ops.outputs), np.asarray(s_ops.outputs))
    assert np.array_equal(np.asarray(b_state), np.asarray(s_state))


@pytest.mark.parametrize(
    "L,G,h,beta,seed",
    [
        (3, 1.0, 0.0, 4.0, 21),
        (4, 0.8, 0.0, 2.0, 22),
        (3, 1.0, 0.4, 3.0, 23),
    ],
)
def test_vectorized_matches_fused_scan(L, G, h, beta, seed):
    """The scan-free vectorized path must produce bit-identical candidate
    rewrites (same gumbels, same discrete arithmetic) and the same
    acceptance log-weight up to f32 summation-order rounding."""
    edges = lattice.frustrated_square(L, L)
    g = QmcIsingGraph(
        edges, transverse=G, longitudinal=h, replicas=16, seed=seed
    )
    g.sse, _, _, _ = multi_sweep(g.sse, jnp.float32(beta), g.model, 12)
    g._maybe_grow()
    ops, state, model = g.sse.ops, g.sse.state, g.model
    tables = _rvb.make_rvb_tables(edges, model)
    inventory = _rvb._const_inventory(ops, model)
    cvar, cpos, cnext, valid, ncount, has_const = inventory

    for trial in range(4):
        key = jax.random.key(500 + trial)
        k_build, k_acc, k_mut = jax.random.split(key, 3)
        popped = _rvb._build_cluster(
            k_build, ops, model, tables, cvar, cpos, cnext, valid, ncount,
            has_const,
        )
        in0, is_toggle = _rvb._cluster_masks(
            popped, ops, model, cvar, cpos, cnext, valid
        )
        pa, nb_a, ni_a, no_a = _rvb._fused_scan(
            ops, state, model, tables, in0, is_toggle, k_mut
        )
        pb, nb_b, ni_b, no_b = _rvb._fused_vectorized(
            ops, state, model, tables, in0, is_toggle, k_mut
        )
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), atol=1e-5, rtol=1e-5
        )
        assert np.array_equal(np.asarray(nb_a), np.asarray(nb_b))
        assert np.array_equal(np.asarray(ni_a), np.asarray(ni_b))
        assert np.array_equal(np.asarray(no_a), np.asarray(no_b))
        # advance the chain (accept-all candidate) so later trials see
        # mutated op strings
        from isingmontecarlo_tpu.sse.opstring import OpString

        ops = OpString(bond=nb_a, inputs=ni_a, outputs=no_a)
        state = state ^ in0


@pytest.mark.parametrize(
    "L,G,h,beta,seed",
    [
        (3, 1.0, 0.0, 4.0, 41),
        (3, 1.0, 0.4, 3.0, 43),
    ],
)
def test_chunked_matches_vectorized_with_shared_gumbels(L, G, h, beta, seed):
    """The chunked pass threads ``(substate, incl, logm)`` across chunk
    boundaries; given the SAME rotation noise its candidate rewrites must be
    bit-identical to the one-shot vectorized pass (the carry equals the
    parities the one-shot pass computes at the boundary slots), and the
    acceptance probability equal up to f32 summation-order rounding."""
    edges = lattice.frustrated_square(L, L)
    g = QmcIsingGraph(
        edges, transverse=G, longitudinal=h, replicas=16, seed=seed
    )
    g.sse, _, _, _ = multi_sweep(g.sse, jnp.float32(beta), g.model, 12)
    g._maybe_grow()
    ops, state, model = g.sse.ops, g.sse.state, g.model
    tables = _rvb.make_rvb_tables(edges, model)
    inventory = _rvb._const_inventory(ops, model)
    cvar, cpos, cnext, valid, ncount, has_const = inventory
    M, R = ops.bond.shape

    key = jax.random.key(900 + seed)
    k_build, _, k_mut = jax.random.split(key, 3)
    popped = _rvb._build_cluster(
        k_build, ops, model, tables, cvar, cpos, cnext, valid, ncount,
        has_const,
    )
    in0, is_toggle = _rvb._cluster_masks(
        popped, ops, model, cvar, cpos, cnext, valid
    )
    gumbels = jax.random.gumbel(k_mut, (M, R, tables.nedges))
    pa, nb_a, ni_a, no_a = _rvb._fused_vectorized(
        ops, state, model, tables, in0, is_toggle, k_mut, gumbels=gumbels
    )
    # mc values cover: multiple chunks, a non-divisor of M (padding), and a
    # single chunk.
    for mc in (32, 48, M):
        pb, nb_b, ni_b, no_b = _rvb._fused_chunked(
            ops, state, model, tables, in0, is_toggle, k_mut, mc=mc,
            gumbels=gumbels,
        )
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), atol=1e-5, rtol=1e-5
        )
        assert np.array_equal(np.asarray(nb_a), np.asarray(nb_b)), mc
        assert np.array_equal(np.asarray(ni_a), np.asarray(ni_b)), mc
        assert np.array_equal(np.asarray(no_a), np.asarray(no_b)), mc


def test_chunked_full_chain_verifies(monkeypatch):
    """End-to-end soak with the chunked path pinned on (production keying:
    per-chunk fold_in rotation noise): the worldline-integrity oracle must
    hold after every sweep."""
    monkeypatch.setattr(_rvb, "_FORCE_CHUNK_MC", 64)
    edges = lattice.frustrated_square(3, 3)
    g = QmcIsingGraph(edges, transverse=1.0, replicas=8, seed=7)
    g.set_run_rvb(True, updates_per_timestep=5)
    for _ in range(6):
        g.timesteps(4, 3.0)
        assert g.verify()


@pytest.mark.parametrize(
    "L,G,h,beta,seed",
    [
        (6, 1.0, 0.0, 2.0, 51),
        (6, 0.9, 0.3, 2.0, 53),
    ],
)
def test_cand_matches_full_vectorized_with_shared_gumbels(L, G, h, beta, seed):
    """The candidate-restricted pass (edge axis = cluster-adjacent edges
    only) must be exact: given the full pass's gumbels gathered at the
    candidate columns, every positive-weight (boundary) edge is a candidate,
    so the rotation argmax and all boundary sums coincide — candidate
    rewrites bit-identical, acceptance equal up to f32 summation order."""
    edges = lattice.square(L, L)  # NE=72 > A=64: the cand path is narrower
    g = QmcIsingGraph(
        edges, transverse=G, longitudinal=h, replicas=8, seed=seed
    )
    g.sse, _, _, _ = multi_sweep(g.sse, jnp.float32(beta), g.model, 10)
    g._maybe_grow()
    ops, state, model = g.sse.ops, g.sse.state, g.model
    tables = _rvb.make_rvb_tables(edges, model)
    assert _rvb._cand_width(ops, model, tables) < tables.nedges
    inventory = _rvb._const_inventory(ops, model)
    cvar, cpos, cnext, valid, ncount, has_const = inventory
    M, R = ops.bond.shape
    ne = tables.nedges

    for trial in range(3):
        key = jax.random.key(640 + trial)
        k_build, _, k_mut = jax.random.split(key, 3)
        popped = _rvb._build_cluster(
            k_build, ops, model, tables, cvar, cpos, cnext, valid, ncount,
            has_const,
        )
        in0, is_toggle = _rvb._cluster_masks(
            popped, ops, model, cvar, cpos, cnext, valid
        )
        cand = _rvb._cluster_cand_edges(popped, ops, model, tables, cvar, valid)
        A = cand.shape[0]
        # every real candidate id is a lattice edge bond; pads are ne
        c_np = np.asarray(cand)
        assert c_np.shape == (A, R) and np.all((c_np >= 0) & (c_np <= ne))

        g_full = jax.random.gumbel(k_mut, (M, R, ne))
        idx = jnp.broadcast_to(
            jnp.minimum(cand.T, ne - 1)[None], (M, R, A)
        )
        g_cand = jnp.take_along_axis(g_full, idx, axis=2)

        pa, nb_a, ni_a, no_a = _rvb._fused_vectorized(
            ops, state, model, tables, in0, is_toggle, k_mut, gumbels=g_full
        )
        pc, nb_c, ni_c, no_c = _rvb._fused_vectorized(
            ops, state, model, tables, in0, is_toggle, k_mut,
            gumbels=g_cand, cand=cand,
        )
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pc), atol=1e-5, rtol=1e-5
        )
        # Candidates are only reachable on replicas with p_acc > 0: where a
        # boundary op has NO positive-weight rotation target (wa_tot == 0,
        # p_acc == 0) both argmaxes see all -inf and return unused garbage
        # indices (index 0 locally vs globally). Compare reachable lanes.
        ok = np.asarray(pa) > 0.0
        assert np.array_equal(np.asarray(nb_a)[:, ok], np.asarray(nb_c)[:, ok])
        assert np.array_equal(
            np.asarray(ni_a)[:, :, ok], np.asarray(ni_c)[:, :, ok]
        )
        assert np.array_equal(
            np.asarray(no_a)[:, :, ok], np.asarray(no_c)[:, :, ok]
        )

        # chunked + cand threads the carry identically
        for mc in (48, M):
            pk, nb_k, ni_k, no_k = _rvb._fused_chunked(
                ops, state, model, tables, in0, is_toggle, k_mut, mc=mc,
                gumbels=g_cand, cand=cand,
            )
            np.testing.assert_allclose(
                np.asarray(pc), np.asarray(pk), atol=1e-5, rtol=1e-5
            )
            assert np.array_equal(np.asarray(nb_c), np.asarray(nb_k)), mc
            assert np.array_equal(np.asarray(ni_c), np.asarray(ni_k)), mc
            assert np.array_equal(np.asarray(no_c), np.asarray(no_k)), mc

        from isingmontecarlo_tpu.sse.opstring import OpString

        # Advance the chain production-style: apply candidates only on
        # reachable lanes so later trials see valid op strings.
        accept = jnp.asarray(ok)[None, :]
        ops = OpString(
            bond=jnp.where(accept, nb_a, ops.bond),
            inputs=jnp.where(accept[None], ni_a, ops.inputs),
            outputs=jnp.where(accept[None], no_a, ops.outputs),
        )
        state = state ^ (in0 & jnp.asarray(ok)[:, None])


def test_cand_full_chain_verifies(monkeypatch):
    """End-to-end soak with the candidate path FORCED on (A > NE here, so
    the candidate list is mostly padding — exercises pad/dedup masking):
    the worldline-integrity oracle must hold after every sweep."""
    monkeypatch.setattr(_rvb, "_FORCE_CAND", True)
    edges = lattice.frustrated_square(3, 3)
    g = QmcIsingGraph(edges, transverse=1.0, replicas=8, seed=9)
    g.set_run_rvb(True, updates_per_timestep=5)
    for _ in range(6):
        g.timesteps(4, 3.0)
        assert g.verify()


def test_cand_auto_chain_verifies():
    """Soak on a lattice where the candidate path engages automatically
    (square 6x6: NE=72 > A=64), through the public RVB-enabled stepper."""
    edges = lattice.square(6, 6)
    g = QmcIsingGraph(edges, transverse=1.0, replicas=8, seed=10)
    g.set_run_rvb(True)
    for _ in range(4):
        g.timesteps(3, 2.0)
        assert g.verify()
