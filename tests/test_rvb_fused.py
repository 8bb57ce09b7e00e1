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
def test_fused_matches_legacy_two_scan(L, G, h, beta, seed):
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
