"""Correctness of the in-VMEM bitonic sort kernel (ops/sort_kernel.py)
against jax.lax.sort, in Pallas interpret mode on CPU.

Unique keys: bit-exact (the permutation is fully determined). Tied keys:
key order bit-exact, payload multiset per key equal (bitonic is not
stable; the call sites never rely on tie order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isingmontecarlo_tpu.ops import sort_kernel as sk


def _ref(ops):
    return jax.lax.sort(tuple(ops), dimension=0, num_keys=1)


def _check_unique(rows, R, nops, seed):
    k = jax.random.key(seed)
    perm = jax.random.permutation(
        k, jnp.arange(rows * 4, dtype=jnp.int32)[:rows]
    )
    key = jnp.stack(
        [jnp.roll(perm, r) for r in range(R)], axis=1
    )  # unique per lane
    pays = [
        jax.random.randint(jax.random.fold_in(k, i), (rows, R), 0, 1 << 20)
        for i in range(nops - 1)
    ]
    got = sk.sort_rows(key, *pays, interpret=True)
    want = _ref([key] + pays)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize(
    "rows,R,nops", [(256, 8, 1), (300, 130, 2), (1023, 8, 3), (2048, 8, 2)]
)
def test_unique_keys_bit_exact(rows, R, nops):
    _check_unique(rows, R, nops, seed=rows + nops)


def test_tied_keys_sorted_and_multiset():
    k = jax.random.key(0)
    rows, R = 777, 16
    key = jax.random.randint(k, (rows, R), 0, 23)  # heavy ties
    pay = jax.random.randint(jax.random.fold_in(k, 1), (rows, R), 0, 1 << 20)
    gk, gp = sk.sort_rows(key, pay, interpret=True)
    wk, wp = _ref([key, pay])
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))
    g = np.stack([np.asarray(gk), np.asarray(gp)], -1)
    w = np.stack([np.asarray(wk), np.asarray(wp)], -1)
    for r in range(R):
        gs = sorted(map(tuple, g[:, r]))
        ws = sorted(map(tuple, w[:, r]))
        assert gs == ws


def test_split_path_exercised(monkeypatch):
    """Force the >_MAX_SINGLE split (halves + cross stage + merges) at a
    small size so interpret mode stays fast."""
    monkeypatch.setattr(sk, "_MAX_SINGLE", 512)
    _check_unique(1200, 8, 2, seed=5)


def test_sentinel_big_keys_sort_last():
    key = jnp.where(
        jnp.arange(600, dtype=jnp.int32)[:, None] % 3 == 0,
        jnp.int32(2**30),
        jnp.arange(600, dtype=jnp.int32)[:, None],
    ) + jnp.zeros((600, 8), jnp.int32)
    pay = jnp.broadcast_to(
        jnp.arange(600, dtype=jnp.int32)[:, None], (600, 8)
    )
    gk, gp = sk.sort_rows(key, pay, interpret=True)
    wk, wp = _ref([key, pay])
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))
    valid = np.asarray(gk) < 2**30
    np.testing.assert_array_equal(
        np.asarray(gp)[valid[:, 0], 0], np.asarray(wp)[valid[:, 0], 0]
    )


def test_cluster_path_bit_identical_under_sort_kernel(monkeypatch):
    """segment_graph, cluster_labels and cluster_update must be bit-identical
    with the packed sort-kernel paths forced on (interpret mode off-TPU):
    every packed rewrite is exact and no consumer depends on tie order."""
    from isingmontecarlo_tpu import lattice
    from isingmontecarlo_tpu.sse import cluster as _cluster
    from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

    edges = lattice.frustrated_square(4, 3)
    g = QmcIsingGraph(
        edges, transverse=1.1, longitudinal=0.2, replicas=4, seed=11
    )
    g.sse, _, _, _ = multi_sweep(g.sse, jnp.float32(1.0), g.model, 8)
    g._maybe_grow()
    ops, state = g.sse.ops, g.sse.state
    lc, ec = g._cluster_caps or (None, None)

    def run():
        _cluster.cluster_update.clear_cache()
        sg = _cluster.segment_graph(ops, g.model)
        lab = _cluster.cluster_labels(ops, g.model, label_cap=lc, edge_cap=ec)
        o2, s2 = _cluster.cluster_update(
            ops, state, jax.random.key(3), g.model, label_cap=lc, edge_cap=ec
        )
        return jax.tree.map(np.asarray, (tuple(sg[:-1]), lab, tuple(o2), s2))

    monkeypatch.setattr(_cluster, "_FORCE_SORT_KERNEL", False)
    base = run()
    monkeypatch.setattr(_cluster, "_FORCE_SORT_KERNEL", True)
    monkeypatch.setattr(_cluster, "_FORCE_SORT_SCATTER", True)
    kern = run()
    for b, k in zip(jax.tree.leaves(base), jax.tree.leaves(kern)):
        np.testing.assert_array_equal(b, k)


def test_compaction_fallback_bit_identical(monkeypatch):
    """Force the sort-compacted wrap-edge fallback (the 32^2-size branch) and
    check the merged single-compaction-sort produces identical SegGraphs with
    the kernel on and off."""
    from isingmontecarlo_tpu import lattice
    from isingmontecarlo_tpu.sse import cluster as _cluster
    from isingmontecarlo_tpu.sse.ising import QmcIsingGraph, multi_sweep

    monkeypatch.setattr(_cluster, "_WRAP_EINSUM_MAX", 0)
    edges = lattice.frustrated_square(4, 4)
    g = QmcIsingGraph(edges, transverse=1.0, replicas=3, seed=5)
    g.sse, _, _, _ = multi_sweep(g.sse, jnp.float32(1.2), g.model, 8)
    ops = g.sse.ops

    monkeypatch.setattr(_cluster, "_FORCE_SORT_KERNEL", False)
    base = jax.tree.map(
        np.asarray, tuple(_cluster.segment_graph(ops, g.model)[:-1])
    )
    monkeypatch.setattr(_cluster, "_FORCE_SORT_KERNEL", True)
    kern = jax.tree.map(
        np.asarray, tuple(_cluster.segment_graph(ops, g.model)[:-1])
    )
    for b, k in zip(jax.tree.leaves(base), jax.tree.leaves(kern)):
        np.testing.assert_array_equal(b, k)
