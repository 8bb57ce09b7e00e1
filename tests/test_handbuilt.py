"""Hand-built op-string crash tests — mirrors of the reference's
``tests/check_loop_crash.rs`` and ``tests/cluster_test.rs``: seed a manager
with explicit ops via ``new_from_ops``, hammer one update kind, and assert
the ``verify()`` worldline oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from isingmontecarlo_tpu import lattice
from isingmontecarlo_tpu.sse import QmcIsingGraph
from isingmontecarlo_tpu.sse import opstring as _ops
from isingmontecarlo_tpu.sse.runner import Qmc

# The loop-crash weight function (check_loop_crash.rs:22-29): 1 when
# inputs == outputs or inputs == reversed(outputs), else 0. As a 4x4
# interaction matrix (first var most significant):
XX_MAT = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 1.0, 0.0],
        [0.0, 1.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
)


def _hand_set(q: Qmc, op_list, state):
    sse = q._ensure_sse()
    ops = _ops.new_from_ops(8, op_list, max_legs=q.model.max_legs)
    q._sse = sse._replace(ops=ops, state=jnp.asarray(state, bool))


class TestLoopCrash:
    def test_run_single_bond(self):
        """check_loop_crash.rs:6-36: one diagonal op on bond (0,1), 100
        directed-loop updates, verify."""
        q = Qmc(2, seed=0, do_loop_updates=True)
        q.make_interaction(XX_MAT, [0, 1])
        _hand_set(q, [(0, 0, (False, False), (False, False))], [[False, False]])
        for _ in range(100):
            q.loop_update()
        assert q.verify()

    def test_run_double_bond(self):
        """check_loop_crash.rs:38-71: chained bonds (0,1), (1,2)."""
        q = Qmc(3, seed=0, do_loop_updates=True)
        q.make_interaction(XX_MAT, [0, 1])
        q.make_interaction(XX_MAT, [1, 2])
        _hand_set(
            q,
            [
                (0, 0, (False, False), (False, False)),
                (1, 1, (False, False), (False, False)),
            ],
            [[False, False, False]],
        )
        for _ in range(100):
            q.loop_update()
        assert q.verify()


class TestClusterHandbuilt:
    def _graph(self):
        g = QmcIsingGraph(
            lattice.chain(2, j=1.0, periodic=False), transverse=1.0,
            replicas=1, seed=3,
        )
        return g, len(g.edges)

    def _run(self, g, steps=50):
        flipped = False
        s0 = g.clone_state()
        for _ in range(steps):
            g.single_cluster_step()
            assert bool(np.asarray(g.verify()))
            flipped = flipped or not np.array_equal(g.clone_state(), s0)
        return flipped

    def test_single_cluster(self):
        """cluster_test.rs:7-21: one constant op on var 0."""
        g, ne = self._graph()
        ops = _ops.new_from_ops(
            8, [(0, ne + 0, (False,), (False,))], max_legs=g.model.max_legs
        )
        g.sse = g.sse._replace(ops=ops, state=jnp.zeros((1, 2), bool))
        assert self._run(g)  # the wrap-around cluster flips the p=0 state

    def test_simple_cluster(self):
        """cluster_test.rs:23-44: two constant ops on var 0."""
        g, ne = self._graph()
        ops = _ops.new_from_ops(
            8,
            [(0, ne + 0, (False,), (False,)), (1, ne + 0, (False,), (False,))],
            max_legs=g.model.max_legs,
        )
        g.sse = g.sse._replace(ops=ops, state=jnp.zeros((1, 2), bool))
        assert self._run(g)

    def test_multi_cluster(self):
        """cluster_test.rs:46-77: two constant ops on each of two vars."""
        g, ne = self._graph()
        ops = _ops.new_from_ops(
            8,
            [
                (0, ne + 0, (False,), (False,)),
                (1, ne + 0, (False,), (False,)),
                (2, ne + 1, (False,), (False,)),
                (3, ne + 1, (False,), (False,)),
            ],
            max_legs=g.model.max_legs,
        )
        g.sse = g.sse._replace(ops=ops, state=jnp.zeros((1, 2), bool))
        assert self._run(g)

    def test_cluster_flip_preserves_op_count(self):
        """Cluster flips toggle diagonal/off-diagonal but never insert or
        remove ops (cluster.rs:36-172)."""
        g, ne = self._graph()
        ops = _ops.new_from_ops(
            8,
            [
                (0, ne + 0, (False,), (False,)),
                (3, ne + 0, (False,), (False,)),
                (5, ne + 1, (False,), (False,)),
            ],
            max_legs=g.model.max_legs,
        )
        g.sse = g.sse._replace(ops=ops, state=jnp.zeros((1, 2), bool))
        for _ in range(20):
            g.single_cluster_step()
        assert int(np.asarray(g.get_n())[0]) == 3
        assert bool(np.asarray(g.verify()))


class TestCyclicOverlap:
    """Mirror of the reference's ``find_overlapping_starts`` unit tests
    (``rvb.rs:1229-1260``) against the vectorized predicate
    ``rvb._cyc_overlap`` (length 0 == full circle)."""

    def _overlaps(self, flips, p_start, p_end, cutoff):
        from isingmontecarlo_tpu.sse.rvb import _cyc_overlap

        s1 = jnp.asarray(flips, jnp.int32)
        ln1 = (jnp.roll(s1, -1) - s1) % cutoff
        o = _cyc_overlap(s1, ln1, p_start, (p_end - p_start) % cutoff, cutoff)
        return sorted(np.nonzero(np.asarray(o))[0].tolist())

    def test_overlapping_regions_simple(self):
        assert self._overlaps([0, 2, 4, 6, 8], 1, 7, 10) == [0, 1, 2, 3]

    def test_overlapping_regions(self):
        assert self._overlaps([0, 2, 4, 6, 8], 5, 7, 10) == [2, 3]

    def test_wrap_around(self):
        assert self._overlaps([0, 2, 4, 6, 8], 7, 1, 10) == [0, 3, 4]

    def test_brute_force_oracle(self):
        from isingmontecarlo_tpu.sse.rvb import _cyc_overlap

        rng = np.random.default_rng(0)
        M = 12
        for _ in range(200):
            s1, s2 = rng.integers(0, M, 2)
            ln1, ln2 = rng.integers(0, M, 2)  # 0 == full circle
            pts1 = {(s1 + k) % M for k in range(ln1 if ln1 else M)}
            pts2 = {(s2 + k) % M for k in range(ln2 if ln2 else M)}
            want = bool(pts1 & pts2)
            got = bool(np.asarray(_cyc_overlap(
                jnp.int32(s1), jnp.int32(ln1), jnp.int32(s2), jnp.int32(ln2), M
            )))
            assert got == want, (s1, ln1, s2, ln2)


class TestRvbHandbuilt:
    """Hand-built constant-op strings driven by RVB sweeps — the
    ``check_rvb_crash.rs`` pattern (``:69-107`` run_single_var and friends)
    on a real lattice (our RVB needs the graph's edge navigator)."""

    def test_constant_op_string_rvb(self):
        edges = [((0, 1), -1.0), ((1, 2), 1.0), ((2, 3), 1.0), ((3, 0), 1.0)]
        g = QmcIsingGraph(edges, transverse=1.0, replicas=1, seed=5)
        ne = len(edges)
        op_list = [(v, ne + v, (False,), (False,)) for v in range(4)]
        op_list += [(4 + v, ne + v, (False,), (False,)) for v in range(4)]
        ops = _ops.new_from_ops(16, op_list, max_legs=g.model.max_legs)
        g.sse = g.sse._replace(ops=ops, state=jnp.zeros((1, 4), bool))
        assert bool(np.asarray(g.verify()))
        succ = 0
        for _ in range(20):
            s, _ = g.single_rvb_sweep()
            succ += s
            assert bool(np.asarray(g.verify()))
        assert succ > 0  # some updates must land on this tiny string
