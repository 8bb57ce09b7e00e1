"""SSE diagonal (Metropolis) and heat-bath updates.

Reference semantics (``src/sse/qmc_traits/diagonal.rs:84-191``, Sandvik
PRB 59 14157 eqs. 19a/19b via arXiv:1909.10591):

Sweep imaginary-time slots ``p = 0..M`` carrying the propagated state and the
op count ``n``:

- identity slot: draw a bond ``b`` uniformly; insert a diagonal op with
  probability ``min(1, beta NB <s|H_b|s> / (M - n))``.
- diagonal op: remove with probability ``min(1, (M - n + 1) / (beta NB W))``.
- off-diagonal op: propagate the state through its outputs.

Heat-bath variant (``src/sse/qmc_traits/heatbath.rs:148-209``): insert with
probability ``bW_tot / (M - n + bW_tot)`` where ``bW_tot = beta * sum_b
max_w(b)``; pick the bond from the max-weight distribution (cumulative table +
searchsorted) and accept ``u * max_w(b) < W``; remove any diagonal op with
probability ``(M - n + 1) / (M - n + 1 + bW_tot)``.

TPU-native form: one ``lax.scan`` over the M axis whose carry is
``(state bool[R, N], n i32[R])``; every step does O(R) vector work, so wall
clock is M sequential steps regardless of replica count. All randomness is
pre-generated as counter-based uniforms ``[M, R]``.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from isingmontecarlo_tpu.sse.model import BondModel
from isingmontecarlo_tpu.sse.opstring import OpString, op_count
from isingmontecarlo_tpu.sse.tables import bond_fetch as _bond_fetch
from isingmontecarlo_tpu.sse.tables import bond_fetch_multi
from isingmontecarlo_tpu.sse.tables import class_select as _class_select
from isingmontecarlo_tpu.sse.tables import fetch_xor as _fetch_xor
from isingmontecarlo_tpu.sse.tables import row_select
from isingmontecarlo_tpu.sse.tables import searchsorted_left as _searchsorted_left


class HeatBathTables(NamedTuple):
    """Precomputed ``BondWeights`` (``heatbath.rs:10-61``). Per-model
    (``cum_max_w: f32[NB]``, scalar total) or per-replica
    (``f32[R, NB]`` / ``f32[R]``) when bond scales differ across the batch —
    the reference's per-graph ``BondWeights`` in a heterogeneous tempering
    ladder."""

    cum_max_w: jax.Array  # f32[NB] or f32[R, NB] inclusive cumulative maxima
    total: jax.Array  # f32[] or f32[R] total weight


def make_heatbath_tables(
    model: BondModel, bond_scale: jax.Array | None = None
) -> HeatBathTables:
    maxw = model.max_diag_w()
    if bond_scale is None:
        cum = jnp.cumsum(maxw)
        return HeatBathTables(cum_max_w=cum, total=cum[-1])
    cum = jnp.cumsum(maxw[None, :] * bond_scale, axis=1)  # [R, NB]
    return HeatBathTables(cum_max_w=cum, total=cum[:, -1])


def _xor_si(si, bond_xor, b, rows):
    """Substate index for weight-table lookups under a per-replica sign
    pattern. A sign-flipped coupling's weight table is EXACTLY the base
    table with substate columns permuted by an XOR mask (Ising two-site:
    ``|J| ∓ J`` swaps aligned/anti-aligned, i.e. flip one leg's bit;
    longitudinal: ``|h| ± h`` swaps up/down): ``w_flip(b, s) = w(b, s ^
    m_b)``. ``bond_xor: i32[R, NB]`` holds per-replica masks (0 = base
    sign); the stored spin states stay physical — only lookups permute.
    This is the label-swap representation of sign disorder that
    ``tempering_traits.rs:163-196`` handles by op-walking."""
    if bond_xor is None:
        return si
    rr = rows.reshape((1,) * (si.ndim - 1) + (-1,))
    return si ^ bond_xor[rr, b]


# Class-table weight lookups replace per-lane ``diag_w`` gathers when the
# model has at most this many (class, substate) cells: the select chain is
# pure VPU lane work on [M, R] grids, while the row-gather form
# ``diag_w[b] -> [M, R, 2^K]`` puts 2^K on the lane axis (padded to 128 —
# measured 18.4 ms per lookup at [M~7000, R=512] vs ~0.1 ms this way).
_CLASS_MAX_CELLS = 64

def _use_class_tables(model) -> bool:
    return (
        model.wtab is not None
        and model.wtab.shape[0] * model.wtab.shape[1] <= _CLASS_MAX_CELLS
    )


def _weight_lookup(model, b, si, bond_xor, rows, on_tpu):
    """``diag_w[b, si ^ xor_mask]`` on an ``[M, R]`` (bond, substate) grid:
    class-table select chain when the model factorizes small, else the
    row-gather + where-chain of :func:`row_select`."""
    if _use_class_tables(model):
        if bond_xor is not None:
            si = si ^ _fetch_xor(bond_xor, b, on_tpu)
        cls_b = _bond_fetch(model.cls, b, on_tpu)
        return _class_select(model.wtab, cls_b, si)
    return row_select(model.diag_w, b, _xor_si(si, bond_xor, b, rows))


def _gather_state_bits(state, vars_p, rows):
    """state bool[R, N], vars_p i32[K, R] (−1 pads) -> bits bool[K, R]."""
    bits = []
    for l in range(vars_p.shape[0]):
        idx = jnp.where(vars_p[l] >= 0, vars_p[l], 0)
        bits.append(jnp.where(vars_p[l] >= 0, state[rows, idx], False))
    return jnp.stack(bits)


def _substate_idx(bits):
    k = bits.shape[0]
    w = (1 << jnp.arange(k, dtype=jnp.int32)).reshape((k,) + (1,) * (bits.ndim - 1))
    return jnp.sum(bits.astype(jnp.int32) * w, axis=0)


# Element-count gates for the precomputed-weights fast path, in units of
# M*R*N. The CPU branch materializes a bool [M, R, N] flip-parity tensor
# (M*R*N bytes); the TPU branch is bit-packed — its largest tensor is the
# [M, R, W, 4] bf16 byte-plane stack, W = ceil(N/16), i.e. ~M*R*N/2 bytes —
# so it tolerates a 4x larger element count (peak ~1 GB per temporary at
# the cap, on 16 GB HBM). Large replica counts at 32^2 (R >= 104) need the
# higher cap to stay on the fast path.
_PAR_MAX_ELEMS = 1 << 29
_PAR_MAX_ELEMS_PACKED = 1 << 31

# Test hook: force the bit-packed MXU precompute branch on (True) or off
# (False) regardless of backend; None = auto (TPU only).
_FORCE_PACKED = None

# The fast path's carry scan over M slots is its only sequential piece; above
# this many slots the block-speculative evaluation (see _carry_scan_spec) is
# used. Test hook: set to small/huge to force the branch on/off.
_SPEC_MIN_M = 2048

# The carry scan can run as a Pallas kernel (ops/diag_carry.py): the n carry
# lives in VMEM scratch and each slot costs a few VPU ops, with no
# speculative-window fallback. Test hook: True forces the kernel (in
# interpreter mode off-TPU), False forces it off; None = auto — ON on TPU:
# measured 2026-08-21 at 32^2 with the lane-major precompute the kernel
# runs the full diagonal update in 9.5 ms vs 14.7 spec / 12.8 sequential
# at R=512, and 1.60 vs 2.64 spec / 1.92 sequential at R=64 (the round-2
# "kernel loses at R=64" verdict was an artifact of the old 28 ms
# precompute masking the carry stage). ISING_DIAG_KERNEL=0/1 overrides.
_FORCE_CARRY_KERNEL = None
_KERNEL_ENV = os.environ.get("ISING_DIAG_KERNEL", "")
_CARRY_KERNEL_MIN_R = 0

# The flip-parity precompute can likewise run as a Pallas kernel
# (ops/parity_kernel.py): the XOR word carry lives in VMEM and word
# construction/fetch are compare-select sums, replacing the packed path's
# one-hot einsums + multi-level associative_scan. ON by default on TPU:
# measured 2026-08-19 at 32^2 (M=5152, R=64) it takes diagonal_update from
# 33.6 ms to 1.3 ms (full sweep 73 -> 43 ms alone). ISING_PARITY_KERNEL=0
# disables.
_FORCE_PARITY_KERNEL = None
_PARITY_KERNEL_DEFAULT = os.environ.get("ISING_PARITY_KERNEL", "") != "0"
# Candidate window half-width for the speculative carry: the TRUE op count
# at each block boundary must stay within +-_SPEC_WINDOW/2 of the frozen-n
# estimate (see _carry_scan_spec pass 0), else the exact sequential fallback
# runs. The estimate tracks the sweep-long drift of n, so the window only
# covers the estimate's error — much tighter than the drift itself.
_SPEC_WINDOW = 128
_SPEC_BLOCK = 128


def _parallel_weights(ops, state, u1, model, hb, heatbath, max_elems=None,
                      bond_xor=None):
    """Everything the diagonal sweep needs per slot, computed upfront.

    Key fact: a diagonal sweep only inserts/removes *diagonal* ops, which do
    not change worldline propagation — the propagated state at every slot is
    fixed by the (immutable) off-diagonal ops. So the proposal bonds (drawn
    unconditionally from pre-generated uniforms, exactly as the sequential
    scan does) and their matrix elements can be evaluated for all slots in
    parallel: spin of var v just below slot p = state[v] XOR (parity of
    off-diagonal flips on v's worldline before p), an exclusive segmented
    XOR-scan along imaginary time. Returns ``(b_new, bits_new, w_new)``.

    The variable-wide parity tensors are the memory peak; when
    ``M * R * N`` exceeds the element cap they are computed in M-chunks
    threaded by an XOR parity carry (exact — XOR is associative), so the
    fast path works at any replica count with bounded memory.
    """
    M, R = ops.bond.shape
    K = ops.max_legs
    N = model.nvars
    NB = model.nbonds
    rows = jnp.arange(R, dtype=jnp.int32)

    # --- proposal bonds for every slot (same draw as the sequential path) --
    if heatbath:
        if hb.cum_max_w.ndim == 2:  # [R, NB]
            tgt = u1 * hb.total[None, :]  # [M, R]
            b_new = _searchsorted_left(hb.cum_max_w, tgt)
        else:
            # Two-level compare-count + boundary-row gather: bit-identical
            # to searchsorted but avoids its ~log2(NB) rounds of per-lane
            # gathers, which scalarize on TPU and made heat-bath sweeps ~3x
            # their Metropolis twins (tables.searchsorted_left).
            b_new = _searchsorted_left(hb.cum_max_w, u1 * hb.total)
        b_new = jnp.minimum(b_new, NB - 1)
    else:
        b_new = jnp.minimum((u1 * NB).astype(jnp.int32), NB - 1)

    # --- flip-parity tensor [M, R, N] ---------------------------------------
    # Per-lane TPU scatters/gathers on this tensor are scalarized (~75M
    # elements/s) and dominated the precompute; on TPU both the toggle
    # scatter and the parity/state lookups ride the MXU as one-hot einsums
    # instead (exact: one op per slot means each (slot, var) receives at
    # most one toggle, and each lookup matches exactly one 0/1 entry,
    # accumulated in f32).
    if _FORCE_PACKED is not None:  # test hook
        on_tpu = _FORCE_PACKED
    else:
        on_tpu = jax.default_backend() == "tpu"

    use_parity_kernel = (
        _FORCE_PARITY_KERNEL
        if _FORCE_PARITY_KERNEL is not None
        else _PARITY_KERNEL_DEFAULT and jax.default_backend() == "tpu"
    )
    if use_parity_kernel:
        # Everything stays [K, M, R] (legs major, replicas on lanes): per-leg
        # bond-var fetches ride take0, toggles come straight off the SoA op
        # string, and invalid legs carry the >= 16W sentinel the kernel
        # drops — no [M, R, K] tensor (64x lane padding) is ever formed.
        from isingmontecarlo_tpu.ops.parity_kernel import parity_bits

        kern_tpu = jax.default_backend() == "tpu"
        W = -(-N // 16)
        sent = 16 * W
        b_safe = jnp.maximum(ops.bond, 0)
        bv_nn = jnp.where(model.bond_vars >= 0, model.bond_vars, sent)
        # One packed take0 per index grid: the K leg tables (and the weight
        # class, when the model factorizes) ride a single gather — per-call
        # cost at these shapes is dispatch-bound (~1.6 ms), so packing is
        # ~K-fold cheaper than K calls (bond_fetch_multi).
        cls_ok = _use_class_tables(model)
        leg_tabs = [bv_nn[:, k] for k in range(K)]
        leg_vmaxs = [sent] * K
        if cls_ok:
            leg_tabs.append(model.cls)
            leg_vmaxs.append(int(model.wtab.shape[0]) - 1)
        got_cur = bond_fetch_multi(leg_tabs, b_safe, leg_vmaxs, kern_tpu)
        got_new = bond_fetch_multi(leg_tabs, b_new, leg_vmaxs, kern_tpu)
        v_idx = jnp.stack(got_cur[:K])  # [K, M, R]
        vq = jnp.stack(got_new[:K])
        # Identity slots fetch bond 0's vars, but their toggles are
        # all-False (identity ops have inputs == outputs == False), so no
        # bond >= 0 mask is needed; pad legs carry the sentinel.
        tog = ops.inputs != ops.outputs  # [K, M, R]
        # Exact integer word packing of the p=0 state (no bf16 round trip).
        st_pad = jnp.pad(
            state.astype(jnp.int32), ((0, 0), (0, sent - N))
        ).reshape(R, W, 16)
        state_w = jnp.sum(
            st_pad << jnp.arange(16, dtype=jnp.int32)[None, None, :], axis=-1
        )
        pb, sb = parity_bits(
            jnp.zeros((R, W), jnp.int32), state_w, v_idx, tog, vq,
            interpret=not kern_tpu,
        )
        bits_new = sb ^ pb  # [K, M, R]; sentinel legs are 0 by construction
        si_new = jnp.sum(
            bits_new.astype(jnp.int32)
            * (1 << jnp.arange(K, dtype=jnp.int32))[:, None, None],
            axis=0,
        )  # [M, R]
        if cls_ok:
            # w_cur rides the same fetched classes — the caller's separate
            # lookup (and the heat-bath max) reuse them via ``extras``.
            si_cur = jnp.sum(
                ops.inputs.astype(jnp.int32)
                * (1 << jnp.arange(K, dtype=jnp.int32))[:, None, None],
                axis=0,
            )
            if bond_xor is not None:
                si_new = si_new ^ _fetch_xor(bond_xor, b_new, kern_tpu)
                si_cur = si_cur ^ _fetch_xor(bond_xor, b_safe, kern_tpu)
            w_new = _class_select(model.wtab, got_new[K], si_new)
            extras = {
                "w_cur": _class_select(model.wtab, got_cur[K], si_cur),
                "cls_new": got_new[K],
            }
        else:
            w_new = _weight_lookup(
                model, b_new, si_new, bond_xor, rows, kern_tpu
            )
            extras = {}
        return b_new, bits_new, w_new, extras  # bits [K, M, R]

    vars_all = model.bond_vars[jnp.maximum(ops.bond, 0)]  # [M, R, K]
    leg_ok = (vars_all >= 0) & (ops.bond >= 0)[..., None]
    tog = jnp.moveaxis(ops.inputs != ops.outputs, 0, -1) & leg_ok  # [M, R, K]
    r_idx = jnp.broadcast_to(rows[None, :, None], (M, R, K))
    v_idx = jnp.where(leg_ok, vars_all, N)
    vq = model.bond_vars[b_new]  # [M, R, K]
    q_ok = vq >= 0
    vq_s = jnp.where(q_ok, vq, 0)
    cap = max_elems or (
        _PAR_MAX_ELEMS_PACKED if on_tpu else _PAR_MAX_ELEMS
    )
    n_chunks = max(1, -(-(M * R * N) // cap))
    Mc = -(-M // n_chunks)

    if on_tpu:
        # Bit-packed MXU form: variables pack 16-per-int32-word, so the
        # XOR scan runs over [Mc, R, W] ints (W = ceil(N/16), 4x less HBM
        # traffic than the bool form) and all one-hot tensors are W-wide,
        # not N-wide. Exactness: toggle construction multiplies 0/1 by a
        # power of two (exact in bf16) and sums at most K distinct-bit
        # terms in f32; the word fetch matches exactly one word, with word
        # values split into byte planes (< 256, exact in bf16) and
        # recombined in f32.
        W = -(-N // 16)
        iota_w = jnp.arange(W, dtype=jnp.int32)
        state_w = jnp.einsum(
            "rn,nw->rw",
            state.astype(jnp.bfloat16),
            jnp.where(
                (jnp.arange(N, dtype=jnp.int32) // 16)[:, None] == iota_w,
                (1 << (jnp.arange(N) % 16)).astype(jnp.bfloat16)[:, None],
                0.0,
            ).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [R, W]

        def chunk_packed(c0, c1, par0):
            mc = c1 - c0
            bitw = (1 << (v_idx[c0:c1] % 16)).astype(jnp.bfloat16)
            oh_vw = jnp.where(
                (v_idx[c0:c1] // 16)[..., None] == iota_w,
                bitw[..., None], 0.0,
            ).astype(jnp.bfloat16)  # [Mc, R, K, W]
            flips_w = jnp.einsum(
                "mrk,mrkw->mrw",
                tog[c0:c1].astype(jnp.bfloat16),
                oh_vw,
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            inc = jax.lax.associative_scan(
                jax.lax.bitwise_xor, flips_w, axis=0
            )
            par_w = par0[None] ^ jnp.concatenate(
                [jnp.zeros((1, R, W), jnp.int32), inc[:-1]], axis=0
            )
            planes = jnp.stack(
                [
                    par_w >> 8,
                    par_w & 0xFF,
                    jnp.broadcast_to((state_w >> 8)[None], (mc, R, W)),
                    jnp.broadcast_to((state_w & 0xFF)[None], (mc, R, W)),
                ],
                axis=-1,
            ).astype(jnp.bfloat16)  # [Mc, R, W, 4] byte planes, < 256 each
            vq_c = vq_s[c0:c1]
            oh_qw = ((vq_c // 16)[..., None] == iota_w).astype(jnp.bfloat16)
            words = jnp.einsum(
                "mrwd,mrkw->mrkd",
                planes,
                oh_qw,
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)  # [Mc, R, K, 4]
            bit = vq_c % 16
            pb = (((words[..., 0] << 8) | words[..., 1]) >> bit) & 1 == 1
            sb = (((words[..., 2] << 8) | words[..., 3]) >> bit) & 1 == 1
            return pb, sb, par0 ^ inc[-1]

        chunk_fn = chunk_packed
        carry = jnp.zeros((R, W), jnp.int32)
    else:

        def chunk_unpacked(c0, c1, par0):
            mc = c1 - c0
            p_idx = jnp.broadcast_to(
                jnp.arange(mc, dtype=jnp.int32)[:, None, None], (mc, R, K)
            )
            flips = jnp.zeros((mc, R, N), bool).at[
                p_idx, r_idx[c0:c1], v_idx[c0:c1]
            ].max(tog[c0:c1], mode="drop")
            inc = jax.lax.associative_scan(jnp.logical_xor, flips, axis=0)
            par_excl = par0[None] ^ jnp.concatenate(
                [jnp.zeros((1, R, N), bool), inc[:-1]], axis=0
            )
            vq_c = vq_s[c0:c1]
            pb = jnp.take_along_axis(par_excl, vq_c, axis=2)  # [Mc, R, K]
            sb = state[r_idx[c0:c1], vq_c]
            return pb, sb, par0 ^ inc[-1]

        chunk_fn = chunk_unpacked
        carry = jnp.zeros((R, N), bool)

    if n_chunks == 1:
        pb, sb, _ = chunk_fn(0, M, carry)
    else:
        pbs, sbs = [], []
        for c in range(n_chunks):
            c0, c1 = c * Mc, min((c + 1) * Mc, M)
            pb_c, sb_c, carry = chunk_fn(c0, c1, carry)
            pbs.append(pb_c)
            sbs.append(sb_c)
        pb = jnp.concatenate(pbs, axis=0)
        sb = jnp.concatenate(sbs, axis=0)
    bits_new = (sb ^ pb) & q_ok  # [M, R, K]
    weights = (1 << jnp.arange(K, dtype=jnp.int32))[None, None, :]
    si_new = jnp.sum(bits_new.astype(jnp.int32) * weights, axis=2)  # [M, R]
    w_new = _weight_lookup(
        model, b_new, si_new, bond_xor, rows,
        jax.default_backend() == "tpu",
    )
    return b_new, jnp.moveaxis(bits_new, -1, 0), w_new, {}  # bits [K, M, R]


def _ins_rem(n, u0, idp, dgp, *extra, M, heatbath, bw_tot):
    """Insert/remove decisions at op count ``n`` — the single definition of
    the acceptance arithmetic (eqs 19a/19b, ``diagonal.rs:141-191`` /
    ``heatbath.rs:149-209``) shared by the sequential carry scan and both
    passes of the speculative evaluation, so all paths are bit-identical."""
    mmn = (M - n).astype(jnp.float32)
    if heatbath:
        (insw,) = extra
        ins_try = u0 * (mmn + bw_tot) < bw_tot
        insert = idp & ins_try & insw
        remove = dgp & (u0 * (mmn + 1.0 + bw_tot) < (mmn + 1.0))
    else:
        ni, nr = extra
        insert = idp & (u0 * mmn < ni)
        remove = dgp & (u0 * nr < (mmn + 1.0))
    return insert, remove


def _carry_scan_spec(n0, xs, M, heatbath, bw_tot, unroll):
    """Block-speculative evaluation of the diagonal sweep's carry scan.

    The only sequential dependence left in the fast path is the op count
    ``n``: every slot's insert/remove decision is a function of ``n`` and
    precomputed per-slot data. Pass 0 evaluates every slot's decision at the
    frozen sweep-start count ``n0`` (fully parallel) and prefix-sums the
    deltas into a per-block-entry *estimate* of ``n`` — the estimate tracks
    the sweep-long drift, so the candidate window per block only has to
    cover the estimate's error, not the drift. Pass 1 evaluates blocks of
    ``_SPEC_BLOCK`` slots at ``_SPEC_WINDOW`` candidate incoming counts
    centered on each block's estimate (all blocks in parallel), a tiny
    per-block compose scan threads the true entry counts, and pass 2 re-runs
    every block at its true entry count (all blocks in parallel) to emit the
    decisions. Sequential depth drops from M to 2*_SPEC_BLOCK +
    M/_SPEC_BLOCK. Decisions are bit-identical to the sequential scan (same
    :func:`_ins_rem` floats at the same integer counts); if any true
    block-entry count leaves its candidate window the ``bad`` flag is
    returned and the caller falls back to the sequential scan.

    Returns ``(insert bool[M, R], remove bool[M, R], bad bool[])``.
    """
    R = n0.shape[0]
    W, C = _SPEC_WINDOW, _SPEC_BLOCK
    B = -(-M // C)
    pad = B * C - M

    def blk(a):
        # padded slots are inert: idp/dgp pad to False so no insert/remove
        return jnp.pad(a, ((0, pad), (0, 0))).reshape(B, C, R).swapaxes(0, 1)

    xs_b = tuple(blk(a) for a in xs)  # leaves [C, B, R]

    # Pass 0: parallel decision estimates for all M slots -> estimated entry
    # count per block (exclusive prefix of the per-slot deltas). Round 1
    # evaluates every slot at the frozen sweep-start count n0; round 2
    # re-evaluates at round 1's estimated trajectory, collapsing most of the
    # frozen-count error — two cheap [M, R] passes that let the candidate
    # window stay narrow.
    n_est = jnp.broadcast_to(n0[None, :], (M, R))
    for _ in range(2):
        ins0, rem0 = _ins_rem(
            n_est, *xs, M=M, heatbath=heatbath, bw_tot=bw_tot
        )
        delta = ins0.astype(jnp.int32) - rem0.astype(jnp.int32)  # [M, R]
        cum = jnp.cumsum(delta, axis=0)
        n_est = n0[None, :] + jnp.concatenate(
            [jnp.zeros((1, R), jnp.int32), cum[:-1]], axis=0
        )  # [M, R] estimated count entering each slot
    n_base = jnp.maximum(n_est[::C] - W // 2, 0)  # [B, R] per-block base

    # Candidate axis minor ([B, R, W]): W is the long axis of the pass-1
    # tensors, so it should occupy the VPU lanes (see CLAUDE.md layout
    # note); the per-slot inputs broadcast along it.
    cand = n_base[:, :, None] + jnp.arange(W, dtype=jnp.int32)[None, None, :]
    bwt_s = bw_tot[:, None] if getattr(bw_tot, "ndim", 0) == 1 else bw_tot

    def step1(ncur, xs_c):
        args = tuple(a[:, :, None] for a in xs_c)  # [B, R, 1]
        ins, rem = _ins_rem(
            ncur, *args, M=M, heatbath=heatbath, bw_tot=bwt_s
        )
        return ncur + ins.astype(jnp.int32) - rem.astype(jnp.int32), None

    out_n, _ = jax.lax.scan(step1, cand, xs_b, unroll=unroll)  # [B, R, W]

    def compose(carry, xs_c):
        outs_b, base_b = xs_c
        n_in, bad = carry
        idx = n_in - base_b
        ok = (idx >= 0) & (idx < W)
        nxt = jnp.take_along_axis(
            outs_b, jnp.clip(idx, 0, W - 1)[:, None], axis=1
        )[:, 0]
        return (jnp.where(ok, nxt, n_in), bad | ~ok), n_in

    (_, bad), n_starts = jax.lax.scan(
        compose, (n0, jnp.zeros((R,), bool)), (out_n, n_base)
    )  # n_starts [B, R]

    def step2(ncur, xs_c):
        ins, rem = _ins_rem(
            ncur, *xs_c, M=M, heatbath=heatbath, bw_tot=bw_tot
        )
        return ncur + ins.astype(jnp.int32) - rem.astype(jnp.int32), (ins, rem)

    _, (ins, rem) = jax.lax.scan(step2, n_starts, xs_b, unroll=unroll)
    ins = ins.swapaxes(0, 1).reshape(B * C, R)[:M]
    rem = rem.swapaxes(0, 1).reshape(B * C, R)[:M]
    return ins, rem, jnp.any(bad)


@functools.partial(jax.jit, static_argnames=("heatbath", "unroll"))
def _diagonal_update_fast(
    ops: OpString,
    state: jax.Array,
    beta: jax.Array,
    key: jax.Array,
    model: BondModel,
    hb: HeatBathTables | None = None,
    heatbath: bool = False,
    bond_scale: jax.Array | None = None,
    unroll: int = 8,
    bond_xor: jax.Array | None = None,
) -> OpString:
    """Precomputed-weights diagonal sweep: identical Markov chain to
    :func:`diagonal_update` (same uniforms, same acceptance arithmetic), but
    the sequential scan carries only the op count ``n`` — every per-slot
    quantity is a precomputed ``[M, R]`` tensor (see
    :func:`_parallel_weights`), so the per-step body is a handful of
    ``[R]``-vector ops instead of state-array gathers/scatters."""
    M, R = ops.bond.shape
    NB = model.nbonds
    beta = jnp.asarray(beta, jnp.float32)
    if beta.ndim == 0:
        beta = jnp.broadcast_to(beta, (R,))
    rows = jnp.arange(R)

    u = jax.random.uniform(key, (3, M, R))
    n0 = op_count(ops)
    b_new, bits_new, w_new, _pw_extras = _parallel_weights(
        ops, state, u[1], model, hb, heatbath, bond_xor=bond_xor
    )

    is_ident = ops.bond < 0
    is_diag = jnp.all(ops.inputs == ops.outputs, axis=0) & ~is_ident
    b_safe = jnp.maximum(ops.bond, 0)
    si_cur = jnp.sum(
        ops.inputs.astype(jnp.int32)
        * (1 << jnp.arange(ops.max_legs, dtype=jnp.int32))[:, None, None],
        axis=0,
    )
    on_tpu = jax.default_backend() == "tpu"
    w_cur = _pw_extras.get("w_cur")
    if w_cur is None:
        w_cur = _weight_lookup(model, b_safe, si_cur, bond_xor, rows, on_tpu)
    if bond_scale is not None:
        w_new = w_new * bond_scale[rows[None, :], b_new]
        w_cur = w_cur * bond_scale[rows[None, :], b_safe]

    if heatbath:
        bw_tot = beta * hb.total  # [R]
        if _use_class_tables(model):
            # max over the class row == max_diag_w()[b_new] exactly (same
            # floats, order-independent max), selected without a gather;
            # the precompute's fetched classes are reused when available.
            maxw_cls = jnp.max(model.wtab, axis=1)  # [C]
            cls_new = _pw_extras.get("cls_new")
            if cls_new is None:
                cls_new = _bond_fetch(model.cls, b_new, on_tpu)
            maxw = _class_select(maxw_cls[:, None], cls_new, jnp.int32(0))
        else:
            maxw = jnp.max(model.diag_w[b_new], axis=-1)
        if bond_scale is not None:
            maxw = maxw * bond_scale[rows[None, :], b_new]
        ins_w = u[2] * maxw < w_new  # [M, R], n-independent part
    else:
        num_ins = beta[None, :] * NB * w_new  # [M, R]
        num_rem = beta[None, :] * NB * w_cur

    bwt = bw_tot if heatbath else jnp.float32(0.0)

    def step(n, xs):
        u0, idp, dgp = xs[:3]
        insert, remove = _ins_rem(
            n, u0, idp, dgp, *xs[3:], M=M, heatbath=heatbath, bw_tot=bwt
        )
        n = n + insert.astype(jnp.int32) - remove.astype(jnp.int32)
        return n, (insert, remove)

    if heatbath:
        xs = (u[0], is_ident, is_diag, ins_w)
    else:
        xs = (u[0], is_ident, is_diag, num_ins, num_rem)
    if _FORCE_CARRY_KERNEL is not None:
        use_kernel = _FORCE_CARRY_KERNEL
    elif _KERNEL_ENV in ("0", "1"):
        use_kernel = _KERNEL_ENV == "1" and jax.default_backend() == "tpu"
    else:
        use_kernel = (
            jax.default_backend() == "tpu" and R >= _CARRY_KERNEL_MIN_R
        )
    if use_kernel:
        from isingmontecarlo_tpu.ops.diag_carry import carry_decisions

        if heatbath:
            p1, p2 = ins_w, ins_w
        else:
            p1, p2 = num_ins, num_rem
        insert, remove = carry_decisions(
            n0, u[0], is_ident, is_diag, p1, p2,
            bwt if heatbath else jnp.zeros((R,), jnp.float32),
            M=M, heatbath=heatbath,
            interpret=jax.default_backend() != "tpu",
        )
    elif M >= _SPEC_MIN_M:
        ins_s, rem_s, bad = _carry_scan_spec(n0, xs, M, heatbath, bwt, unroll)
        insert, remove = jax.lax.cond(
            bad,
            lambda: jax.lax.scan(step, n0, xs, unroll=unroll)[1],
            lambda: (ins_s, rem_s),
        )
    else:
        _, (insert, remove) = jax.lax.scan(step, n0, xs, unroll=unroll)

    new_bond = jnp.where(insert, b_new, jnp.where(remove, -1, ops.bond))
    keep_in = jnp.where(insert[None], bits_new, ops.inputs)
    keep_in = jnp.where(remove[None], False, keep_in)
    changed = new_bond != ops.bond
    new_out = jnp.where(changed[None], keep_in, ops.outputs)
    new_in_full = jnp.where(changed[None], keep_in, ops.inputs)
    return OpString(bond=new_bond, inputs=new_in_full, outputs=new_out)


def diagonal_update(
    ops: OpString,
    state: jax.Array,  # bool[R, N]
    beta: jax.Array,  # f32[] or f32[R]
    key: jax.Array,
    model: BondModel,
    hb: HeatBathTables | None = None,
    heatbath: bool = False,
    bond_scale: jax.Array | None = None,  # f32[R, NB]
    unroll: int = 4,
    bond_xor: jax.Array | None = None,  # i32[R, NB] sign-pattern masks
) -> OpString:
    """One full diagonal sweep (dispatcher). The precomputed-weights fast
    path chunks its parity tensors to the element cap, so it applies at any
    size; the sequential full scan (`_diagonal_update_scan`) remains as the
    equivalence oracle. Both run the identical Markov chain."""
    del unroll
    return _diagonal_update_fast(
        ops, state, beta, key, model, hb=hb, heatbath=heatbath,
        bond_scale=bond_scale, bond_xor=bond_xor,
    )


@functools.partial(jax.jit, static_argnames=("heatbath", "unroll"))
def _diagonal_update_scan(
    ops: OpString,
    state: jax.Array,  # bool[R, N]
    beta: jax.Array,  # f32[] or f32[R]
    key: jax.Array,
    model: BondModel,
    hb: HeatBathTables | None = None,
    heatbath: bool = False,
    bond_scale: jax.Array | None = None,  # f32[R, NB]
    unroll: int = 4,
    bond_xor: jax.Array | None = None,  # i32[R, NB] sign-pattern masks
) -> OpString:
    """One full diagonal sweep as a sequential scan carrying ``(state, n)``.

    The p=0 state is unchanged by construction (only diagonal ops are inserted
    or removed; the reference likewise sweeps a copy of the state,
    ``diagonal.rs:101-111``).

    ``bond_scale`` optionally multiplies every bond's matrix elements per
    replica — the heterogeneous-Hamiltonian support for parallel tempering
    ladders in coupling/field space (reference tempering swaps whole graphs
    with different ``(J, transverse, longitudinal)``,
    ``tempering_traits.rs:117-155``). All other update kinds (cluster, loop,
    RVB) only ever use *ratios* of same-bond or same-class weights, so a
    class-uniform scale cancels there and needs no plumbing.
    """
    if heatbath and bond_scale is not None:
        assert hb is not None and hb.cum_max_w.ndim == 2, (
            "per-replica bond scales with heat-bath need per-replica tables "
            "(make_heatbath_tables(model, bond_scale))"
        )
    M, R = ops.bond.shape
    K = ops.max_legs
    NB = model.nbonds
    beta = jnp.asarray(beta, jnp.float32)
    if beta.ndim == 0:
        beta = jnp.broadcast_to(beta, (R,))

    rows = jnp.arange(R)
    u = jax.random.uniform(key, (3, M, R))
    n0 = op_count(ops)

    bond_vars = model.bond_vars  # [NB, K]
    diag_w = model.diag_w  # [NB, 2^K]

    if heatbath:
        assert hb is not None
        bw_tot = beta * hb.total  # [R]
        max_w_tab = model.max_diag_w()  # [NB]

    def step(carry, xs):
        prop, n = carry
        bond_p, in_p, out_p, u0, u1, u2 = xs
        # classify
        is_ident = bond_p < 0
        is_diag = jnp.all(in_p == out_p, axis=0) & ~is_ident
        is_offdiag = ~is_ident & ~is_diag

        # --- propagate off-diagonal ops (diagonal.rs:155-161) -------------
        b_safe = jnp.maximum(bond_p, 0)
        vars_cur = jnp.moveaxis(bond_vars[b_safe], -1, 0)  # [K, R]
        new_prop = prop
        for l in range(K):
            idx = jnp.where(is_offdiag & (vars_cur[l] >= 0), vars_cur[l], model.nvars)
            new_prop = new_prop.at[rows, idx].set(out_p[l], mode="drop")
        prop = new_prop

        mmn = (M - n).astype(jnp.float32)  # M - n

        # --- proposal bond ------------------------------------------------
        if heatbath:
            if hb.cum_max_w.ndim == 2:  # per-replica tables [R, NB]
                tgt = (u1 * hb.total)[:, None]
                b_new = jnp.sum(hb.cum_max_w < tgt, axis=1).astype(jnp.int32)
            else:
                b_new = jnp.searchsorted(hb.cum_max_w, u1 * hb.total).astype(
                    jnp.int32
                )
            b_new = jnp.minimum(b_new, NB - 1)
        else:
            b_new = jnp.minimum((u1 * NB).astype(jnp.int32), NB - 1)
        vars_new = jnp.moveaxis(bond_vars[b_new], -1, 0)  # [K, R]
        bits_new = _gather_state_bits(prop, vars_new, rows)  # [K, R]
        w_new = diag_w[
            b_new, _xor_si(_substate_idx(bits_new), bond_xor, b_new, rows)
        ]  # [R]

        # --- current op weight (for removal) ------------------------------
        w_cur = diag_w[
            b_safe, _xor_si(_substate_idx(in_p), bond_xor, b_safe, rows)
        ]

        if bond_scale is not None:
            w_new = w_new * bond_scale[rows, b_new]
            w_cur = w_cur * bond_scale[rows, b_safe]

        if heatbath:
            ins_try = u0 * (mmn + bw_tot) < bw_tot
            maxw = max_w_tab[b_new]
            if bond_scale is not None:
                maxw = maxw * bond_scale[rows, b_new]
            insert = is_ident & ins_try & (u2 * maxw < w_new)
            remove = is_diag & (u0 * (mmn + 1.0 + bw_tot) < (mmn + 1.0))
        else:
            num = beta * NB * w_new
            insert = is_ident & (u0 * mmn < num)
            num_r = beta * NB * w_cur
            remove = is_diag & (u0 * num_r < (mmn + 1.0))

        new_bond = jnp.where(insert, b_new, jnp.where(remove, -1, bond_p))
        keep_in = jnp.where(insert[None], bits_new, in_p)
        keep_in = jnp.where(remove[None], False, keep_in)
        new_n = n + insert.astype(jnp.int32) - remove.astype(jnp.int32)
        return (prop, new_n), (new_bond, keep_in)

    xs = (
        ops.bond,
        jnp.moveaxis(ops.inputs, 1, 0),
        jnp.moveaxis(ops.outputs, 1, 0),
        u[0],
        u[1],
        u[2],
    )
    # unroll: the per-slot body is small vector work ([R]-wide); unrolling
    # amortizes the TPU loop overhead over several imaginary-time slots.
    (_, _), (new_bond, new_in) = jax.lax.scan(
        step, (state, n0), xs, unroll=unroll
    )
    new_in = jnp.moveaxis(new_in, 0, 1)  # [K, M, R]
    # Inserted/removed slots are diagonal: outputs follow inputs there; slots
    # holding off-diagonal ops are untouched by the sweep.
    changed = new_bond != ops.bond
    new_out = jnp.where(changed[None], new_in, ops.outputs)
    new_in_full = jnp.where(changed[None], new_in, ops.inputs)
    return OpString(bond=new_bond, inputs=new_in_full, outputs=new_out)
