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
The ~91 stages at N=8192 run as a ``fori_loop`` INSIDE the kernel with the
per-stage ``(j, direction-bit)`` parameters in SMEM: element ``i``'s partner
at distance ``d = 2^j`` is ``i ^ d``, fetched with two dynamic-shift
``pltpu.roll``s (forward for the lower half of each pair, backward for the
upper) and an integer-bit select. A trace-time-unrolled stage network was
tried first and OOM-killed the Mosaic compile helper (straight-line vreg
code for 91 stages x 1024 vregs; observed on hardware 2026-08-19) — the
stage loop keeps the program a few hundred instructions regardless of N.

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


def _stage_params(L, descending, merge_only):
    """Per-stage ``(j, dir_bit_index)`` int32 arrays for the SMEM prefetch.

    ``dir_bit_index = kb`` means element ``i`` sorts ascending iff bit ``kb``
    of ``i`` is 0 (the standard bitonic block-direction rule); uniform-
    direction stages (the merge passes and the final full-length pass) use
    bit 31, which is always 0. A global ``descending`` flips the rule."""
    jv, kv = [], []
    if merge_only:
        for j in range(L - 1, -1, -1):
            jv.append(j)
            kv.append(31)
    else:
        for k in range(1, L + 1):
            for j in range(k - 1, -1, -1):
                jv.append(j)
                kv.append(31 if k == L else k)
    jv = jnp.asarray(jv, jnp.int32)
    kv = jnp.asarray(kv, jnp.int32)
    return jv, kv, jnp.int32(1 if descending else 0)


def _kernel(nops, n_stages, *refs):
    jv_ref, kv_ref, desc_ref = refs[:3]
    in_refs = refs[3 : 3 + nops]
    out_refs = refs[3 + nops :]
    N, RB = in_refs[0].shape
    # In/out are aliased (input_output_aliases); the copy is a no-op safety
    # for the non-aliased interpret path.
    for i_r, o_r in zip(in_refs, out_refs):
        o_r[:] = i_r[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (N, RB), 0)
    desc = desc_ref[0]

    def stage(s, _):
        j = jv_ref[s]
        d = jnp.int32(1) << j
        # All predicates kept in i32 bits (Mosaic has no i1-vector select):
        # lo = bit j of i (0 -> partner is i+d, 1 -> partner is i-d); the
        # block sorts ascending iff bit kv[s] of i == desc flag. Ties never
        # swap (strict inequality), matching lax.sort for unique keys.
        lo = (iota >> j) & 1
        a = ((iota >> kv_ref[s]) & 1) ^ desc
        sgn = 1 - 2 * (lo ^ a)
        key = out_refs[0][:]
        # roll semantics: roll(x, s)[i] = x[(i - s) % N]; partner i ^ d is
        # i + d when bit j is clear (roll by N - d), i - d when set (roll
        # by d). Both rolls never mispair: i ^ d stays inside [0, N).
        pkey = jnp.where(lo == 0, pltpu.roll(key, N - d, 0),
                         pltpu.roll(key, d, 0))
        # keys are non-negative (pad INT32_MAX), so key - pkey never
        # overflows i32.
        swap = sgn * (key - pkey) > 0
        out_refs[0][:] = jnp.where(swap, pkey, key)
        for r in out_refs[1:]:
            x = r[:]
            px = jnp.where(lo == 0, pltpu.roll(x, N - d, 0),
                           pltpu.roll(x, d, 0))
            r[:] = jnp.where(swap, px, x)
        return 0

    jax.lax.fori_loop(0, n_stages, stage, 0)


def _sort_block(
    operands, *, descending=False, merge_only=False, interpret=False
):
    """Sort/merge power-of-two-row int32 operands ([N, Rp], Rp % 128 == 0)
    by operand 0, in place per 128-lane block."""
    N, Rp = operands[0].shape
    L = N.bit_length() - 1
    assert 1 << L == N and N >= 256
    nops = len(operands)
    jv, kv, desc = _stage_params(L, descending, merge_only)
    smem = lambda n: pl.BlockSpec(  # noqa: E731
        (n,), lambda r: (0,), memory_space=pltpu.SMEM
    )
    specs = [
        pl.BlockSpec((N, _LANES), lambda r: (0, r), memory_space=pltpu.VMEM)
        for _ in range(nops)
    ]
    return pl.pallas_call(
        functools.partial(_kernel, nops, jv.shape[0]),
        grid=(Rp // _LANES,),
        in_specs=[smem(jv.shape[0]), smem(kv.shape[0]), smem(1)] + specs,
        out_specs=specs if nops > 1 else specs[0],
        out_shape=[
            jax.ShapeDtypeStruct((N, Rp), jnp.int32) for _ in range(nops)
        ]
        if nops > 1
        else jax.ShapeDtypeStruct((N, Rp), jnp.int32),
        input_output_aliases={i + 3: i for i in range(nops)},
        # Mosaic's default scoped-VMEM budget is 16 MB; at N=8192 the
        # aliased blocks (4 MB each) plus the stage loop's roll/select
        # temporaries need ~24 MB (hardware-observed OOM, 2026-08-21).
        # v5e has 128 MB VMEM — raise the cap and let liveness decide.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(jv, kv, desc.reshape(1), *operands)


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
