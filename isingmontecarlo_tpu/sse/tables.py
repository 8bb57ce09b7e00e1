"""Fast exact weight-table lookups for TPU.

TPU lowers *row* gathers from a small table (``table[idx]`` where each
result is a contiguous trailing-axis row, e.g. ``model.bond_vars[b]``) well
— measured ~0.01 ms for a [M, R] index set — while *scalar* gathers with
per-lane combined indices (``diag_w[b, si]`` or the flattened equivalent)
scalarize to ~0.5-0.9 ms at the same shapes. Every weight lookup keyed by
(bond, substate) therefore gathers the bond's whole row and selects the
substate column with a where-chain: bit-exact (selects the original f32
entries), backend-agnostic, and the select chain is cheap elementwise work
(C comparisons on the index grid).
"""

from __future__ import annotations

import jax.numpy as jnp

# Above this many columns the where-chain costs more than the scalarized
# gather it replaces; fall back to direct indexing.
_MAX_COLS = 64


def row_select(table: jnp.ndarray, row_idx: jnp.ndarray, col_idx: jnp.ndarray):
    """``table[row_idx, col_idx]`` via one row gather + a column select
    chain. ``table: [T, C]``; ``row_idx``/``col_idx`` broadcast-compatible
    integer grids. Exact: selects original table entries."""
    C = table.shape[-1]
    if C > _MAX_COLS:
        return table[row_idx, col_idx]
    rows = table[row_idx]  # [..., C] row gather
    out = rows[..., 0]
    for c in range(1, C):
        out = jnp.where(col_idx == c, rows[..., c], out)
    return out


def row_select3(table: jnp.ndarray, b_idx, i_idx, j_idx):
    """``table[b, i, j]`` for a [T, C, C] table (e.g. ``full_w``) via the
    flattened-column :func:`row_select`."""
    T, C, C2 = table.shape
    return row_select(table.reshape(T, C * C2), b_idx, i_idx * C2 + j_idx)
