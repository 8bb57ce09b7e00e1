"""Pallas TPU kernel for the diagonal precompute's flip-parity pass.

``sse/diagonal.py::_parallel_weights`` needs, for every slot ``p`` and every
variable ``v`` of the slot's *proposal* bond, the propagated spin just below
``p``: ``state[v] XOR parity(off-diagonal flips on v before p)``. The XLA
packed path materializes one-hot word tensors (~0.5 GB HBM at the 32^2
benchmark shape) and runs a 13-level ``associative_scan`` XOR over the
``[M, R, W]`` parity words (~2 GB of scan traffic). Physically the pass is
one stream over the M axis with a tiny sequential carry — this kernel does
exactly that:

- The parity carry ``par[W, R]`` (variables packed 16-per-int32-word,
  ``W = ceil(N/16)``) lives in VMEM scratch across grid steps; slot rows
  stream HBM -> VMEM in M-blocks.
- Toggle-word construction and word fetches are compare-select sums over
  the word axis (``sum_w (v // 16 == w) * ...``): ~``K * W * R`` int32 VPU
  lane-ops per slot, no gathers, no one-hot materialization, no bf16
  rounding anywhere (pure int32 arithmetic).
- Exclusive-scan semantics: slot ``p`` reads the carry *before* XORing its
  own toggles, matching ``par_excl`` in the XLA path bit-for-bit.

All slot-wise arrays travel as ``[K, M, R]`` (legs major, replicas on the
VPU lane axis): the leg axis never touches the tiled minor dims, so neither
the caller nor the kernel pays the 64x lane-padding a ``[M, R, K]`` layout
incurs (measured: the prep transposes + row gathers of the old interface
were 18.6 ms at [M~7000, R=512] — the kernel itself ~0.06 ms).

Sentinel convention: any ``v >= 16 * W`` matches no word — its toggle is
dropped and its fetched parity/state bits are 0. Callers encode invalid
legs (and padding) that way instead of masking.

Outputs ``pb`` (parity bit) and ``sb`` (state bit) per (leg, slot) —
bit-identical to the packed/unpacked XLA paths (tests/test_diagonal_fast.py
asserts equality through the public diagonal update).

Reference semantics: the spin propagation inside Sandvik's diagonal sweep,
``/root/reference/src/sse/qmc_traits/diagonal.rs:141-191``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Slot rows per grid step: sized so the five streamed [K, B, R] i32 blocks
# stay under ~4 MB combined (double buffering doubles the footprint), with
# 512 rows at the benchmark replica counts.
def _block_rows(K: int, R: int) -> int:
    per_row = K * R * 4 * 5
    return max(64, min(512, (4 << 20) // per_row // 64 * 64))


def _kernel(K: int, W: int, par0_ref, statew_ref, v_ref, tog_ref, vq_ref,
            pb_ref, sb_ref, par_scr):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        par_scr[:] = par0_ref[:]

    B = v_ref.shape[1]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)  # [W, 1]
    state_w = statew_ref[:]  # [W, R]

    def body(j, par):
        # Fetch the query-var parity/state bits at the pre-slot carry
        # (exclusive scan), then XOR this slot's toggles into the carry.
        for k in range(K):
            vq = vq_ref[k, pl.ds(j, 1), :]  # [1, R]
            sel = (vq // 16) == iota_w  # [W, R]; v >= 16W matches nothing
            word_p = jnp.sum(jnp.where(sel, par, 0), axis=0, keepdims=True)
            word_s = jnp.sum(jnp.where(sel, state_w, 0), axis=0,
                             keepdims=True)
            bit = vq % 16
            # i32 codes throughout: Mosaic lacks vector<i8> arithmetic.
            pb_ref[k, pl.ds(j, 1), :] = (word_p >> bit) & 1
            sb_ref[k, pl.ds(j, 1), :] = (word_s >> bit) & 1
        tog_w = jnp.zeros_like(par)
        for k in range(K):
            v = v_ref[k, pl.ds(j, 1), :]  # [1, R]; v >= 16W: toggle dropped
            t = tog_ref[k, pl.ds(j, 1), :]
            tog_w = tog_w + jnp.where(
                (v // 16) == iota_w, t << (v % 16), 0
            )
        return par ^ tog_w

    par_scr[:] = jax.lax.fori_loop(0, B, body, par_scr[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def parity_bits(
    par0: jax.Array,     # i32[R, W] initial parity words (usually zeros)
    state_w: jax.Array,  # i32[R, W] packed p=0 state words
    v_idx: jax.Array,    # i32[K, M, R] current-op vars (>= 16W: no toggle)
    tog: jax.Array,      # bool[K, M, R] leg toggles
    vq: jax.Array,       # i32[K, M, R] proposal query vars (>= 16W: bits 0)
    *,
    interpret: bool = False,
):
    """Per-(leg, slot) parity and state bits for the proposal vars, streamed
    over M with the XOR carry in VMEM. Returns ``(pb, sb): bool[K, M, R]``,
    bit-identical to the XLA packed path (which chunks externally; the
    kernel streams all of M internally, so no carry is exposed)."""
    K, M, R = v_idx.shape
    W = par0.shape[1]
    B = _block_rows(K, R)
    Mp = -(-M // B) * B

    def prep(a, fill):
        a = a.astype(jnp.int32)
        if Mp != M:
            a = jnp.pad(a, ((0, 0), (0, Mp - M), (0, 0)),
                        constant_values=fill)
        return a

    # Pads: v/vq = 16*W (beyond every word -> no toggle, bits 0), tog = 0.
    v_p = prep(v_idx, 16 * W)
    tog_p = prep(tog, 0)
    vq_p = prep(vq, 16 * W)

    row_spec = pl.BlockSpec((K, B, R), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((W, R), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    pb, sb = pl.pallas_call(
        functools.partial(_kernel, K, W),
        grid=(Mp // B,),
        in_specs=[full_spec, full_spec, row_spec, row_spec, row_spec],
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((K, Mp, R), jnp.int32),
            jax.ShapeDtypeStruct((K, Mp, R), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((W, R), jnp.int32)],
        interpret=interpret,
    )(par0.T, state_w.T, v_p, tog_p, vq_p)
    return pb[:, :M] == 1, sb[:, :M] == 1  # bool[K, M, R]
