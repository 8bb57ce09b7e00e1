"""Pallas TPU kernel for per-replica row gathers (``table[idx[e,r], r]``).

The SSE cluster/label path is dominated by gathers whose *indices differ per
replica lane* (``sse/cluster.py::_take0_fast``). XLA's native gather
scalarizes these (~0.3 GB/s effective); the repo's MXU one-hot rewrite
(``_mm_take0``) batches replicas and contracts ``[E, C] x [C, D]`` per
replica — but with only ``D = 2`` value-digit output columns the systolic
array runs at ~2/128 utilization, so each gather still costs ~0.5 ms at the
32^2 benchmark shapes.

This kernel restructures the one-hot so the MXU output dimension is the
*index tile* (128-wide, full utilization) instead of the value planes:

- The table (values < 2^14) is split into base-128 digit planes and laid out
  as ``rhs[r, 2h + {0,1}, l] = digit(table[h*128 + l, r])`` — for each
  replica a ``[2H, 128]`` bf16 matrix (``H = ceil(C / 128)``), resident in
  VMEM across the whole gather.
- For each replica row and index tile, a one-hot of the index's *low* digit
  ``oh[l, e] = (idx[e] % 128 == l)`` feeds one MXU pass
  ``tmp = rhs @ oh -> [2H, TE]``: column ``e`` of ``tmp`` holds the table
  digits at rows ``h*128 + lo(e)`` for every ``h`` at once.
- A VPU sublane reduction selects the matching *high* digit:
  ``out[e] = sum_h (hi(e) == h) * (128 * tmp[2h, e] + tmp[2h+1, e])``.

Exactness: the one-hot has exactly one 1 per column, so every ``tmp`` entry
is a single bf16 digit (< 128, exact) accumulated in f32; the stage-2 select
matches exactly one ``h``. Bit-identical to ``take_along_axis`` for int32
values in ``[0, 2^14)`` (asserted by tests/test_take_kernel.py).

Everything stays lane-oriented — indices and outputs travel as ``[R, E]``
(replicas on sublanes, index space on lanes), so no cross-lane transposes
are generated. Compute per gather is ``R * E * 2 * C`` bf16 MACs at full MXU
width plus ``O(R * E * H)`` VPU selects: ~0.1 ms at the 32^2 label shapes
(E = C ~ 5k, R = 64) vs ~0.5-0.7 ms for the matvec-shaped einsum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Index-tile width (lanes per grid step). 512 keeps the MXU busy for 4
# column passes per dot while the [R, TE] idx/out blocks stay ~128 KB.
_TE = 512

# Replica-block rows. The rhs block is [RB, HD, 128] bf16; RB = 64 keeps it
# under ~4 MB VMEM even at C = 16384 (H = 128).
_RB = 64

_MAX_C = 1 << 14  # base-128 digit pair covers values/row counts < 2^14


def _kernel(H: int, D: int, idx_ref, rhs_ref, out_ref):
    RB = idx_ref.shape[0]
    TE = idx_ref.shape[1]
    HD = rhs_ref.shape[1]  # D*H padded to a sublane tile multiple

    iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, TE), 0)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (HD, TE), 0)
    # Row D*h + d holds digit d (most significant first): weight 128^(D-1-d).
    w = jnp.power(
        jnp.float32(128.0), (D - 1 - s_iota % D).astype(jnp.float32)
    )
    valid_s = s_iota < D * H

    def body(r, _):
        ids = idx_ref[pl.ds(r, 1), :]  # [1, TE] i32
        oh = (ids % 128 == iota_l).astype(jnp.bfloat16)  # [128, TE]
        rhs = rhs_ref[pl.ds(r, 1)].reshape(HD, 128)  # [HD, 128] bf16
        tmp = jnp.dot(rhs, oh, preferred_element_type=jnp.float32)
        sel = (ids // 128 == (s_iota // D)) & valid_s  # [HD, TE]
        val = jnp.sum(jnp.where(sel, tmp * w, 0.0), axis=0, keepdims=True)
        out_ref[pl.ds(r, 1), :] = val.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, RB, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "digits"))
def take0(table: jax.Array, idx: jax.Array, *, interpret: bool = False,
          digits: int = 2):
    """``jnp.take_along_axis(table, idx, axis=0)`` for ``table i32[C, R]``
    and per-replica index grid ``idx i32[E, R]``; exact for row counts in
    ``[0, 2^14)`` and values in ``[0, min(128^digits, 2^24))`` (the digit
    recombination is an f32 sum, exact for integers below 2^24 — callers
    with ``digits=4`` must keep values under 2^24, not 128^4). Extra digits
    let callers pack several small tables into one gather (see
    ``sse/tables.bond_fetch_multi``). See module docstring for the layout."""
    C, R = table.shape
    E = idx.shape[0]
    D = digits
    assert idx.shape[1] == R
    assert C <= _MAX_C, "base-128 digit planes need row count < 2^14"
    assert 1 <= D <= 4, "f32 digit recombination is exact below 2^24 only"

    H = -(-C // 128)
    HD = -(-(D * H) // 16) * 16  # bf16 sublane tile multiple
    Rp = -(-R // _RB) * _RB
    Ep = -(-E // _TE) * _TE

    t = table.astype(jnp.int32)
    t = jnp.pad(t, ((0, H * 128 - C), (0, Rp - R)))
    # rhs[r, D*h + d, l] = d-th base-128 digit (MSB first) of
    # table[h*128+l, r].
    t = t.T.reshape(Rp, H, 128)
    rhs = jnp.stack(
        [(t // (128 ** (D - 1 - d))) % 128 for d in range(D)], axis=2
    ).reshape(Rp, D * H, 128)
    rhs = jnp.pad(rhs, ((0, 0), (0, HD - D * H), (0, 0))).astype(jnp.bfloat16)

    idxT = jnp.pad(idx.astype(jnp.int32).T, ((0, Rp - R), (0, Ep - E)))

    out = pl.pallas_call(
        functools.partial(_kernel, H, D),
        grid=(Rp // _RB, Ep // _TE),
        in_specs=[
            pl.BlockSpec((_RB, _TE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, HD, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_RB, _TE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, Ep), jnp.int32),
        interpret=interpret,
    )(idxT, rhs)
    return out[:R, :E].T
