"""Native (C++) graph-compiler tests: validity and equivalence with the pure
Python fallbacks in :mod:`isingmontecarlo_tpu.lattice`."""

import numpy as np
import pytest

from isingmontecarlo_tpu import lattice, native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _py_adjacency(nvars, edges):
    lists = [[] for _ in range(nvars)]
    for (a, b), j in edges:
        lists[a].append((b, j))
        lists[b].append((a, j))
    for l in lists:
        l.sort(key=lambda t: t[0])
    deg = max(1, max((len(l) for l in lists), default=0))
    neigh = np.full((nvars, deg), -1, np.int32)
    nj = np.zeros((nvars, deg), np.float32)
    for v, l in enumerate(lists):
        for d, (ov, j) in enumerate(l):
            neigh[v, d] = ov
            nj[v, d] = j
    return neigh, nj


class TestNativeGraph:
    def test_adjacency_matches_python(self, lib):
        edges = lattice.frustrated_square(6, 5, j=1.3)
        nvars = lattice.nvars_from_edges(edges)
        ev, ej = lattice.edge_arrays(edges)
        neigh, nj = native.adjacency(nvars, ev, ej)
        pneigh, pnj = _py_adjacency(nvars, edges)
        assert np.array_equal(neigh, pneigh)
        assert np.allclose(nj, pnj)

    def test_vertex_coloring_valid(self, lib):
        edges = lattice.square(8, 8, j=1.0)
        nvars = lattice.nvars_from_edges(edges)
        ev, _ = lattice.edge_arrays(edges)
        colors = native.vertex_coloring(nvars, ev)
        for (a, b), _ in edges:
            assert colors[a] != colors[b]
        # Bipartite lattice: greedy with descending-degree order gives 2.
        assert colors.max() + 1 == 2

    def test_edge_coloring_strong(self, lib):
        edges = lattice.square(6, 6, j=1.0)
        nvars = lattice.nvars_from_edges(edges)
        ev, _ = lattice.edge_arrays(edges)
        colors = native.edge_coloring(nvars, ev)
        adj = [set() for _ in range(nvars)]
        for (a, b), _ in edges:
            adj[a].add(b)
            adj[b].add(a)
        # Same-color edges must be vertex-disjoint AND distance-2 separated.
        from collections import defaultdict

        groups = defaultdict(list)
        for e, ((a, b), _) in enumerate(edges):
            groups[int(colors[e])].append((a, b))
        for grp in groups.values():
            for i, (a1, b1) in enumerate(grp):
                for a2, b2 in grp[i + 1:]:
                    s1, s2 = {a1, b1}, {a2, b2}
                    assert not (s1 & s2), "edges share a vertex"
                    n2 = set().union(*(adj[v] for v in s2)) | s2
                    assert not (s1 & n2), "edges are distance-1 apart"

    def test_large_lattice_fast(self, lib):
        import time

        edges = lattice.square(128, 128, j=1.0)
        nvars = lattice.nvars_from_edges(edges)
        ev, ej = lattice.edge_arrays(edges)
        t0 = time.perf_counter()
        native.adjacency(nvars, ev, ej)
        native.vertex_coloring(nvars, ev)
        native.edge_coloring(nvars, ev)
        assert time.perf_counter() - t0 < 5.0
