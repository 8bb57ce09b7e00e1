"""SSE cluster update (reference ``src/sse/qmc_traits/cluster.rs``).

Reference semantics: build clusters over op *sides* — each non-identity op at
slot ``p`` has an input-side and an output-side node. Constant single-variable
ops (transverse-field ops) are *cluster edges*: their two sides belong to
different clusters (``is_valid_cluster_edge``, ``cluster.rs:276-286``). Every
other op's sides (and all its legs) are one cluster, and worldline segments
connect an op's output side to the next op on the same variable (periodic in
imaginary time). Each cluster flips with probability 1/2, weighted by the
product of per-op weight-change ratios when Ising symmetry is broken
(``flip_each_cluster_rng``, ``cluster.rs:36-172``). Flipping toggles the
corresponding side's spins; a transverse op with exactly one flipped side
becomes off-diagonal. Finally the p=0 state is re-read from the (possibly
flipped) inputs of the first op on each variable (``cluster.rs:150-160``).

TPU-native form: cluster construction is iterated min-label propagation with
pointer jumping over node array ``i32[2M, R]`` (node id ``2p + side``), with
two merge rules — within-op for non-edge ops, and worldline successor links
derived by one sort of all legs along imaginary time. Per-cluster decisions
are gathers keyed by the cluster's root label.

Deviation from the reference: when no constant op exists the reference treats
the whole op string as a single cluster (``cluster.rs:98-107``); label
propagation instead yields one cluster per connected component of the leg
graph. Components are closed under op legs, so flipping them independently
also preserves all op weights — a strictly more ergodic, equally valid move.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from isingmontecarlo_tpu.sse.model import BondModel
from isingmontecarlo_tpu.sse.opstring import OpString, substate_index

_BIG = jnp.int32(2**30)


def _take0(arr, idx):
    """Gather along axis 0 with a [X, R] index grid."""
    return jnp.take_along_axis(arr, idx, axis=0)


def worldline_links(ops: OpString, model: BondModel):
    """Derive per-leg worldline successors by sorting legs along time.

    Returns ``(wnext, leg_var, order_info)`` where ``wnext: i32[K*M, R]`` maps
    flat leg index ``f = l*M + p`` to the flat leg index of the next op on the
    same variable (periodic), self for invalid legs; ``leg_var: i32[K*M, R]``;
    and ``order_info = (order, svar, seg_start)`` from the sort, reused by the
    state-rebuild step.

    This replaces the reference's per-variable doubly-linked lists
    (``fast_ops.rs:176-207``) with one sort per sweep.
    """
    M, R = ops.bond.shape
    K = ops.max_legs
    KM = K * M

    b = jnp.maximum(ops.bond, 0)
    vars_kmr = jnp.moveaxis(model.bond_vars[b], -1, 0)  # [K, M, R]
    vars_kmr = jnp.where((ops.bond >= 0)[None], vars_kmr, -1)
    leg_var = vars_kmr.reshape(KM, R)
    p_of_f = jnp.arange(KM, dtype=jnp.int32) % M

    key = jnp.where(leg_var >= 0, leg_var * M + p_of_f[:, None], _BIG)
    order = jnp.argsort(key, axis=0).astype(jnp.int32)  # [KM, R]
    svar = _take0(leg_var, order)

    j = jnp.arange(KM, dtype=jnp.int32)[:, None]
    seg_start = jnp.concatenate(
        [jnp.ones((1, R), bool), svar[1:] != svar[:-1]], axis=0
    )
    group_start = jax.lax.cummax(jnp.where(seg_start, j, 0), axis=0)
    nxt_same = jnp.concatenate(
        [svar[1:] == svar[:-1], jnp.zeros((1, R), bool)], axis=0
    )
    next_pos = jnp.where(nxt_same, jnp.minimum(j + 1, KM - 1), group_start)
    target = _take0(order, next_pos)  # [KM, R] flat leg of successor

    cols = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[None, :], (KM, R))
    wnext = jnp.zeros((KM, R), jnp.int32).at[order, cols].set(target)
    self_f = jnp.broadcast_to(jnp.arange(KM, dtype=jnp.int32)[:, None], (KM, R))
    wnext = jnp.where(leg_var >= 0, wnext, self_f)
    return wnext, leg_var, (order, svar, seg_start)


def cluster_labels(ops: OpString, model: BondModel, wnext, leg_var):
    """Min-label clusters over op sides. Returns ``labels: i32[2M, R]``.

    Node ``2p`` = input side, ``2p+1`` = output side of the op at slot ``p``.
    """
    M, R = ops.bond.shape
    K = ops.max_legs
    KM = K * M

    valid_op = ops.bond >= 0  # [M, R]
    b = jnp.maximum(ops.bond, 0)
    arity = jnp.sum(model.bond_vars[b] >= 0, axis=-1)  # [M, R]
    is_edge = model.is_constant[b] & (arity == 1) & valid_op  # cluster.rs:276-286

    node_p = jnp.arange(2 * M, dtype=jnp.int32)[:, None] // 2
    side = jnp.arange(2 * M, dtype=jnp.int32)[:, None] % 2
    merge_sides = jnp.broadcast_to(
        (valid_op & ~is_edge)[node_p[:, 0]], (2 * M, R)
    )
    partner = jnp.where(merge_sides, 2 * node_p + (1 - side), 2 * node_p + side)
    partner = jnp.broadcast_to(partner, (2 * M, R))

    # Worldline merge endpoints: out-node of leg's op <-> in-node of successor.
    f = jnp.arange(KM, dtype=jnp.int32)[:, None]
    p_of_f = f % M
    a_idx = jnp.broadcast_to(2 * p_of_f + 1, (KM, R))
    b_idx = 2 * (wnext % M)
    leg_ok = leg_var >= 0
    cols2 = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[None, :], (2 * M, R))
    colsk = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[None, :], (KM, R))

    labels0 = jnp.broadcast_to(
        jnp.arange(2 * M, dtype=jnp.int32)[:, None], (2 * M, R)
    )

    def body(state):
        L, _ = state
        Ln = jnp.minimum(L, _take0(L, partner))
        la = _take0(Ln, a_idx)
        lb = _take0(Ln, b_idx)
        mn = jnp.where(leg_ok, jnp.minimum(la, lb), _BIG)
        Ln = Ln.at[a_idx, colsk].min(mn)
        Ln = Ln.at[b_idx, colsk].min(mn)
        # Pointer jumping (labels are node ids).
        Ln = jnp.minimum(Ln, _take0(Ln, Ln))
        Ln = jnp.minimum(Ln, _take0(Ln, Ln))
        return Ln, jnp.any(Ln != L)

    labels, _ = jax.lax.while_loop(
        lambda s: s[1], body, (labels0, jnp.asarray(True))
    )
    return labels


@functools.partial(jax.jit, static_argnames=())
def cluster_update(
    ops: OpString,
    state: jax.Array,  # bool[R, N]
    key: jax.Array,
    model: BondModel,
    prob: float = 0.5,
) -> tuple[OpString, jax.Array]:
    """Flip every spacetime cluster with probability ``prob`` x weight ratio.

    Implements ``flip_each_cluster_rng`` / ``.._ising_symmetry_rng``
    (``cluster.rs:18-172``). The weight ratio per cluster is the product over
    member ops (with both sides in the cluster) of
    ``W(flipped op) / W(op)`` — e.g. 0 for longitudinal field ops, freezing
    their clusters (``qmc_ising.rs:755-772``); computed generically from the
    model's weight tables so the same kernel serves symmetric models
    (ratio identically 1).
    """
    M, R = ops.bond.shape
    K = ops.max_legs

    wnext, leg_var, (order, svar, seg_start) = worldline_links(ops, model)
    labels = cluster_labels(ops, model, wnext, leg_var)  # [2M, R]

    k_u = jax.random.fold_in(key, 0)
    u_root = jax.random.uniform(k_u, (2 * M, R))

    valid_op = ops.bond >= 0
    b = jnp.maximum(ops.bond, 0)
    si = substate_index(ops.inputs)  # [M, R]
    so = substate_index(ops.outputs)
    # flipped substate: toggle the valid legs' bits
    arity = jnp.sum(model.bond_vars[b] >= 0, axis=-1)
    legmask = (1 << arity) - 1  # int[M, R]
    fsi = si ^ legmask
    fso = so ^ legmask
    if model.full_w is not None:
        w_cur = model.full_w[b, si, so]
        w_flip = model.full_w[b, fsi, fso]
    else:
        w_cur = jnp.where(si == so, model.diag_w[b, si], 0.0)
        w_flip = jnp.where(fsi == fso, model.diag_w[b, fsi], 0.0)

    lab_in = labels[0::2]  # [M, R]
    lab_out = labels[1::2]
    both_sides = valid_op & (lab_in == lab_out)  # cluster.rs:120-128
    ratio = jnp.where(both_sides, w_flip / jnp.maximum(w_cur, 1e-30), 1.0)
    frozen = both_sides & (w_flip <= 0.0)

    logr = jnp.where(both_sides, jnp.log(jnp.maximum(ratio, 1e-30)), 0.0)
    rows_m = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[None, :], (M, R))
    acc_logr = jnp.zeros((2 * M, R), jnp.float32).at[lab_in, rows_m].add(logr)
    acc_frozen = jnp.zeros((2 * M, R), bool).at[lab_in, rows_m].max(frozen)

    flip_prob = jnp.minimum(prob * jnp.exp(acc_logr), 1.0)
    flip_root = (u_root < flip_prob) & ~acc_frozen  # [2M, R] per root id
    flip_node = _take0(flip_root, labels)  # [2M, R]

    flip_in = flip_node[0::2] & valid_op  # [M, R]
    flip_out = flip_node[1::2] & valid_op

    legv = jnp.moveaxis(
        jnp.where((ops.bond >= 0)[..., None], model.bond_vars[b], -1), -1, 0
    )  # [K, M, R]
    lv = legv >= 0
    new_inputs = jnp.where(flip_in[None] & lv, ~ops.inputs, ops.inputs)
    new_outputs = jnp.where(flip_out[None] & lv, ~ops.outputs, ops.outputs)
    new_ops = OpString(bond=ops.bond, inputs=new_inputs, outputs=new_outputs)

    # Rebuild the p=0 state from the first op on each variable
    # (cluster.rs:150-160: propagated state at p=0 equals the first op's
    # input on that variable).
    KM = K * M
    j0 = seg_start & (svar >= 0)  # sorted positions that start a var group
    # Sorted position j corresponds to leg order[j]; its (possibly flipped)
    # input bit is the new p=0 spin for that variable.
    in_flat = new_inputs.reshape(KM, R)
    first_val = _take0(in_flat, order)
    scat_var = jnp.where(j0, svar, model.nvars)
    cols = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[None, :], (KM, R))
    new_state = state.at[cols.T, scat_var.T].set(first_val.T, mode="drop")
    return new_ops, new_state
