"""Brute-force oracle for ``opstring.worldline_maps``.

The gather-free sorted-payload implementation must reproduce the
doubly-linked worldline adjacency the reference threads through heap nodes
(``src/sse/fast_ops.rs:176-207``): per variable, legs linked cyclically in
imaginary-time order; invalid legs self-map.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import opstring as _ops
from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep


def brute_maps(bond, bond_vars, M, K):
    """wnext/wprev per flat leg f = l*M + p, cyclic per variable."""
    KM = K * M
    wnext = np.arange(KM, dtype=np.int32)
    wprev = np.arange(KM, dtype=np.int32)
    per_var = {}
    for p in range(M):
        b = bond[p]
        if b < 0:
            continue
        for l, v in enumerate(bond_vars[b]):
            if v >= 0:
                per_var.setdefault(int(v), []).append(l * M + p)
    for legs in per_var.values():
        legs.sort(key=lambda f: f % M)  # imaginary-time order
        n = len(legs)
        for i, f in enumerate(legs):
            wnext[f] = legs[(i + 1) % n]
            wprev[f] = legs[(i - 1) % n]
    return wnext, wprev


@pytest.mark.parametrize(
    "L,beta,transverse,longitudinal,seed",
    [(3, 1.0, 1.0, 0.0, 0), (4, 1.5, 0.8, 0.4, 1), (2, 4.0, 2.0, 0.0, 2)],
)
def test_worldline_maps_match_bruteforce(L, beta, transverse, longitudinal, seed):
    edges = lattice.frustrated_square(L, L)
    g = QmcIsingGraph(
        edges, transverse, longitudinal, replicas=4, seed=seed
    )
    g.sse, _, _, _ = multi_sweep(g.sse, jnp.float32(beta), g.model, 8)
    ops, model = g.sse.ops, g.model
    wnext, wprev, leg_var, (order, svar, seg_start) = _ops.worldline_maps(
        ops, model
    )
    M, R = ops.bond.shape
    K = ops.max_legs
    bond = np.asarray(ops.bond)
    bv = np.asarray(model.bond_vars)
    for r in range(R):
        bn, bp = brute_maps(bond[:, r], bv, M, K)
        np.testing.assert_array_equal(np.asarray(wnext[:, r]), bn)
        np.testing.assert_array_equal(np.asarray(wprev[:, r]), bp)
    # order is a bijection and svar is nondecreasing-by-variable-blocks
    o = np.asarray(order)
    for r in range(R):
        assert sorted(o[:, r].tolist()) == list(range(K * M))
    sv = np.asarray(svar)
    valid = sv >= 0
    # within each replica, valid rows come first and group contiguously
    for r in range(R):
        v = sv[:, r][valid[:, r]]
        assert np.all(np.diff(v) >= 0)
