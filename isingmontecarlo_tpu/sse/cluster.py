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

TPU-native form: cluster construction is iterated min-label propagation over
op-side nodes (the vectorized cluster-search lineage of Mino's
self-labeling, arXiv:hep-lat/9112001, and GPU Swendsen-Wang label
propagation, arXiv:2302.14720), with two merge rules — within-op for
non-edge ops, and worldline successor links derived by one sort of all legs
along imaginary time; see :func:`cluster_labels` for the sorted-path-space
iteration. Per-cluster decisions are gathers keyed by the cluster's root
label.

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


def _mm_take0(vals, idx, chunk=128):
    """``take_along_axis(vals, idx, axis=0)`` as a one-hot x vector batched
    matmul on the MXU. TPU gathers with per-lane indices run at ~75M
    elements/s (scalarized); routing the permutation through the systolic
    array is 1.5-3.5x faster at these shapes and scales sub-linearly with the
    replica count. f32 accumulation is exact for integer values < 2^24."""
    rows, R = vals.shape
    chunk = min(chunk, R)
    G = -(-R // chunk)
    pad = G * chunk - R
    vc = jnp.pad(vals.T.astype(jnp.float32), ((0, pad), (0, 0))).reshape(
        G, chunk, rows
    )
    ic = jnp.pad(idx.T, ((0, pad), (0, 0))).reshape(G, chunk, rows)
    iota = jnp.arange(rows, dtype=jnp.int32)

    def step(c, xs):
        vg, ig = xs
        oh = (ig[:, :, None] == iota[None, None, :]).astype(jnp.float32)
        y = jnp.einsum("cij,cj->ci", oh, vg, preferred_element_type=jnp.float32)
        return c, y

    _, out = jax.lax.scan(step, None, (vc, ic))
    return out.reshape(G * chunk, rows)[:R].T.astype(vals.dtype)


def _take0_fast(vals, idx):
    """Platform-dispatched gather: MXU one-hot matmul on TPU for moderate row
    counts (exact for int32 values < 2^24), native gather otherwise."""
    rows = vals.shape[0]
    if jax.default_backend() == "tpu" and rows <= 8192 and rows < (1 << 24):
        return _mm_take0(vals, idx)
    return jnp.take_along_axis(vals, idx, axis=0)


def worldline_links(ops: OpString, model: BondModel):
    """Per-leg worldline successors from one sort along time (see
    :func:`isingmontecarlo_tpu.sse.opstring.worldline_maps`). Returns
    ``(wnext, leg_var, order_info)`` for the state-rebuild step."""
    from isingmontecarlo_tpu.sse.opstring import worldline_maps

    wnext, _, leg_var, order_info = worldline_maps(ops, model)
    return wnext, leg_var, order_info


def _seg_min_scan(W, breaks):
    """Per-element minimum over its contiguous run: forward + backward
    min-scans with resets at ``breaks`` (``breaks[e]`` = no edge between
    ``e-1`` and ``e``). ``W: f/i32[E, R]``; log-depth associative scans."""

    def op_fwd(a, b):
        av, ab = a
        bv, bb = b
        return jnp.where(bb, bv, jnp.minimum(av, bv)), ab | bb

    fwd, _ = jax.lax.associative_scan(op_fwd, (W, breaks), axis=0)
    # Backward: break between e and e+1 is breaks[e+1]; shift accordingly.
    rb = jnp.concatenate([breaks[1:], jnp.ones_like(breaks[:1])], axis=0)[::-1]
    bwd, _ = jax.lax.associative_scan(op_fwd, (W[::-1], rb), axis=0)
    return jnp.minimum(fwd, bwd[::-1])




def cluster_labels(ops: OpString, model: BondModel, wnext, wprev, leg_var,
                   order_info=None):
    """Min-label clusters over op sides. Returns ``labels: i32[2M, R]``.

    Node ``2p`` = input side, ``2p+1`` = output side of the op at slot ``p``.

    The iteration runs in sorted-leg *path space*: along each variable's
    worldline the nodes form the path ``... out(op_j) - in(op_{j+1}) -
    [within-op] - out(op_{j+1}) ...`` which is contiguous after the
    worldline sort, so min-label propagation along worldlines is two
    segmented scans (full worldline range per iteration) instead of
    distance-1 gather steps; breaks sit at cluster-edge ops
    (``is_valid_cluster_edge``, ``cluster.rs:276-286``) where the in/out
    sides are disconnected. Cross-variable flow goes through each op's other
    legs (one sibling-map gather) and the periodic wrap through one
    wrap-predecessor gather. This converges in O(cluster diameter in op-hops)
    iterations instead of O(worldline length).
    """
    from isingmontecarlo_tpu.sse.opstring import worldline_maps

    M, R = ops.bond.shape
    K = ops.max_legs
    KM = K * M

    if order_info is None:
        _, _, _, order_info = worldline_maps(ops, model)
    order, svar, seg_start = order_info  # [KM, R]

    valid_op = ops.bond >= 0  # [M, R]
    b = jnp.maximum(ops.bond, 0)
    arity = jnp.sum(model.bond_vars[b] >= 0, axis=-1)  # [M, R]
    is_edge = model.is_constant[b] & (arity == 1) & valid_op  # cluster.rs:276-286

    # Sorted-space per-position op data. f = order[j], p = f % M.
    f_sorted = order
    p_sorted = f_sorted % M
    valid_j = svar >= 0
    edge_j = _take0(is_edge, p_sorted) & valid_j

    # rank[f] = sorted position of flat leg f.
    cols = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[None, :], (KM, R))
    src = jnp.broadcast_to(jnp.arange(KM, dtype=jnp.int32)[:, None], (KM, R))
    rank = jnp.zeros((KM, R), jnp.int32).at[order, cols].set(src)

    # Sibling map in path space: position of the op's next leg (cyclic over
    # its legs), so K-leg ops chain all their legs over K-1 merges.
    l_sorted = f_sorted // M
    l_next = (l_sorted + 1) % K
    f_sib = l_next * M + p_sorted
    sib_leg_valid = _take0(leg_var, f_sib) >= 0
    j_sib = jnp.where(valid_j & sib_leg_valid, _take0(rank, f_sib), src)
    # Path space has 2 elements per sorted position: e = 2j (+side).
    sib_map = jnp.stack([2 * j_sib, 2 * j_sib + 1], axis=1).reshape(2 * KM, R)

    # Group bounds in sorted space (per-var worldline wrap).
    j = jnp.arange(KM, dtype=jnp.int32)[:, None]
    group_start = jax.lax.cummax(jnp.where(seg_start, j, 0), axis=0)
    seg_end = jnp.concatenate(
        [svar[:-1] != svar[1:], jnp.ones((1, R), bool)], axis=0
    )
    group_end = jax.lax.cummax(jnp.where(seg_end[::-1], j, 0), axis=0)[::-1]
    group_end = KM - 1 - group_end
    # Wrap edge: in-element of a group head <- out-element of the group end.
    at_head = seg_start & valid_j
    wrap_map_in = jnp.where(at_head, 2 * group_end + 1, 2 * j)
    at_end = seg_end & valid_j
    wrap_map_out = jnp.where(at_end, 2 * group_start, 2 * j + 1)
    wrap_map = jnp.stack([wrap_map_in, wrap_map_out], axis=1).reshape(2 * KM, R)

    # Path breaks: before in-element at group heads / invalid; between in and
    # out at cluster-edge ops (and invalid positions).
    break_in = seg_start | ~valid_j  # before e = 2j
    break_out = edge_j | ~valid_j  # before e = 2j + 1
    breaks = jnp.stack([break_in, break_out], axis=1).reshape(2 * KM, R)

    # Initial labels: node ids (in = 2p, out = 2p+1); invalid positions carry
    # a sentinel larger than any node id so they never win a min.
    W0 = jnp.stack([2 * p_sorted, 2 * p_sorted + 1], axis=1).reshape(2 * KM, R)
    W0 = jnp.where(
        jnp.repeat(valid_j, 2, axis=0), W0, _BIG
    )

    # Path position of each op's leg-0 (for the node-space readback below).
    j0 = _take0(rank, jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[:, None], (M, R)))

    def body(state):
        W, _ = state
        Wn = _seg_min_scan(W, breaks)
        Wn = jnp.minimum(Wn, _take0_fast(Wn, sib_map))
        Wn = jnp.minimum(Wn, _take0_fast(Wn, wrap_map))
        return Wn, jnp.any(Wn != W)

    # NOTE: label-value pointer jumping was measured and does NOT pay here —
    # min-id labels usually point to nearby nodes so the radius does not
    # double, and TPU gathers with per-lane indices cost ~linear in elements
    # (the extra two gathers outweigh the saved iterations).
    W, _ = jax.lax.while_loop(lambda s: s[1], body, (W0, jnp.asarray(True)))
    lab_in = _take0(W, 2 * j0)
    lab_out = _take0(W, 2 * j0 + 1)
    node_default = jnp.arange(2 * M, dtype=jnp.int32)[:, None]
    labels = jnp.stack([lab_in, lab_out], axis=1).reshape(2 * M, R)
    labels = jnp.where(
        jnp.repeat(valid_op, 2, axis=0), labels, jnp.broadcast_to(node_default, (2 * M, R))
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
    from isingmontecarlo_tpu.sse.opstring import worldline_maps

    M, R = ops.bond.shape
    K = ops.max_legs

    wnext, wprev, leg_var, (order, svar, seg_start) = worldline_maps(ops, model)
    labels = cluster_labels(ops, model, wnext, wprev, leg_var)  # [2M, R]

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
