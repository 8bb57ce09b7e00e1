"""Pallas TPU in-VMEM bitonic sort along axis 0 of ``[rows, R]`` int32 grids.

The SSE cluster path is sort-bound: one 32^2 sweep runs ~15 ``lax.sort``
calls at [6k-14k, R] shapes (worldline leg sort, back-permutes, hook-round
scatter-min rewrites — see ``sse/cluster.py``), and XLA's sort lowers to
multi-pass HBM round trips. This kernel keeps the whole column block
resident in VMEM across all ``L(L+1)/2`` bitonic stages, so each stage runs
at VPU/VMEM bandwidth instead of HBM bandwidth.

Layout: rows on sublanes, replicas on lanes; the grid walks 128-lane column
blocks, and ``input_output_aliases`` sorts in place (one [N, 128] i32 block
is N/2 KiB — 4 MB at N=8192 — so up to three operands fit VMEM comfortably).
Each stage at distance ``d = 2^j`` reshapes the block to ``[G, 2, d, 128]``
and compare-exchanges the two halves of axis 1 elementwise — no shifts, no
gathers; the ascending/descending block mask is a broadcasted iota bit.
Stages are unrolled at trace time (static ``N``), ~91 stages at N=8192.

Semantics: ascending by operand 0; ties NEVER swap, so equal-key payload
order is whatever the bitonic network leaves (NOT the stable order of
``jax.lax.sort``/``jnp.argsort``) — callers must not rely on tie order, or
must make keys unique (the cluster/worldline call sites do one or the
other; see their comments). Bit-exact to ``lax.sort`` for unique keys
(asserted by tests/test_sort_kernel.py).

Rows above 8192 use a split: sort each 8192-half in VMEM (ascending /
descending), one elementwise cross compare-exchange in XLA, then two
in-VMEM bitonic merges — the only inter-half stage is the elementwise one,
so VMEM never holds more than a half per operand.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_MAX_SINGLE = 8192  # one-kernel row limit (VMEM: nops * N * 512B in place)
_MAX_ROWS = 16384  # split-path limit


def _stage_refs(refs, N, RB, k_bits, j, descending):
    """One compare-exchange stage at distance 2^j inside a 2^k_bits-block
    bitonic pass (k_bits == None -> uniform direction: the merge stages),
    applied in place to ``refs`` (operand 0 = key).

    Ref-at-a-time form: the swap mask is computed once from the key, then
    each operand is loaded, permuted, and stored back before the next is
    touched. This bounds Mosaic's scoped-VMEM stack to ~one operand's
    temporaries plus the mask — the value-chained form kept every unrolled
    stage's copies live at once (~16 x [N, 128] i32 = 64 MB at N=8192,
    over the 16 MB limit; observed on hardware 2026-08-19)."""
    d = 1 << j
    G = N >> (j + 1)
    kr = refs[0][:].reshape(G, 2, d, RB)
    ka, kb = kr[:, 0], kr[:, 1]  # [G, d, RB]
    if k_bits is None:
        swap = (ka > kb) if not descending else (ka < kb)
    else:
        # Signed-arithmetic predicate: Mosaic has no select over i1 vectors
        # (bool-valued jnp.where lowers to an unsupported i8->i1 trunci).
        # sign = +1 for ascending blocks, -1 for descending; keys are
        # non-negative (pad INT32_MAX), so ka - kb never overflows.
        g = jax.lax.broadcasted_iota(jnp.int32, (G, d, RB), 0)
        bit = (g >> (k_bits - j - 1)) & 1
        sign = 1 - 2 * bit
        if descending:
            sign = -sign
        swap = sign * (ka - kb) > 0
    for r in refs:
        xr = r[:].reshape(G, 2, d, RB)
        xa, xb = xr[:, 0], xr[:, 1]
        na = jnp.where(swap, xb, xa)
        nb = jnp.where(swap, xa, xb)
        r[:] = jnp.concatenate([na[:, None], nb[:, None]], axis=1).reshape(
            N, RB
        )


def _kernel(nops, L, descending, merge_only, *refs):
    in_refs = refs[:nops]
    out_refs = refs[nops:]
    N, RB = in_refs[0].shape
    # In/out are aliased (input_output_aliases); the copy is a no-op safety
    # for the non-aliased interpret path.
    for i_r, o_r in zip(in_refs, out_refs):
        o_r[:] = i_r[:]
    if merge_only:
        for j in range(L - 1, -1, -1):
            _stage_refs(out_refs, N, RB, None, j, descending)
    else:
        for k in range(1, L + 1):
            for j in range(k - 1, -1, -1):
                kb = None if k == L else k
                # the final pass (k == L) is a uniform-direction merge
                _stage_refs(out_refs, N, RB, kb, j, descending)


def _sort_block(
    operands, *, descending=False, merge_only=False, interpret=False
):
    """Sort/merge power-of-two-row int32 operands ([N, Rp], Rp % 128 == 0)
    by operand 0, in place per 128-lane block."""
    N, Rp = operands[0].shape
    L = N.bit_length() - 1
    assert 1 << L == N and N >= 256
    nops = len(operands)
    specs = [
        pl.BlockSpec((N, _LANES), lambda r: (0, r), memory_space=pltpu.VMEM)
        for _ in range(nops)
    ]
    return pl.pallas_call(
        functools.partial(_kernel, nops, L, descending, merge_only),
        grid=(Rp // _LANES,),
        in_specs=specs,
        out_specs=specs if nops > 1 else specs[0],
        out_shape=[
            jax.ShapeDtypeStruct((N, Rp), jnp.int32) for _ in range(nops)
        ]
        if nops > 1
        else jax.ShapeDtypeStruct((N, Rp), jnp.int32),
        input_output_aliases={i: i for i in range(nops)},
        interpret=interpret,
    )(*operands)


def _as_list(x):
    return list(x) if isinstance(x, (list, tuple)) else [x]


def sort_rows(*operands, interpret: bool = False):
    """``jax.lax.sort(operands, dimension=0, num_keys=1)`` (ascending by
    operand 0) for int32 operands of shape [rows, R], rows <= 16384, up to
    3 operands — except for equal-key payload order (see module docstring).
    Pads rows with INT32_MAX keys (callers' sentinel keys must stay below)
    and lanes to a multiple of 128."""
    key = operands[0]
    rows, R = key.shape
    assert rows <= _MAX_ROWS, rows
    assert len(operands) <= 3
    N = max(256, 1 << (rows - 1).bit_length())
    Rp = -(-R // _LANES) * _LANES
    padded = [
        jnp.pad(
            op.astype(jnp.int32),
            ((0, N - rows), (0, Rp - R)),
            constant_values=jnp.iinfo(jnp.int32).max if i == 0 else 0,
        )
        for i, op in enumerate(operands)
    ]
    if N <= _MAX_SINGLE:
        out = _as_list(_sort_block(padded, interpret=interpret))
    else:
        H = N // 2
        lo = [p[:H] for p in padded]
        hi = [p[H:] for p in padded]
        lo = _as_list(_sort_block(lo, interpret=interpret))
        hi = _as_list(_sort_block(hi, descending=True, interpret=interpret))
        # cross stage at distance H: elementwise in XLA
        swap = lo[0] > hi[0]
        lo, hi = (
            [jnp.where(swap, b, a) for a, b in zip(lo, hi)],
            [jnp.where(swap, a, b) for a, b in zip(lo, hi)],
        )
        lo = _as_list(_sort_block(lo, merge_only=True, interpret=interpret))
        hi = _as_list(_sort_block(hi, merge_only=True, interpret=interpret))
        out = [jnp.concatenate([a, b], axis=0) for a, b in zip(lo, hi)]
    return tuple(op[:rows, :R] for op in out)
