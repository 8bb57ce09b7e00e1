"""Debug / introspection — reference ``src/sse/qmc_debug.rs`` and the ASCII
worldline printer ``debug_print_diagonal``
(``src/sse/qmc_traits/diagonal.rs:194-234``).

All counters are batched: they return per-replica vectors. The printer renders
one chosen replica's worldline (imaginary-time slots top to bottom; ``|`` is a
pass-through worldline, digits are an op's output spins).
"""

from __future__ import annotations

import io

import jax
import jax.numpy as jnp
import numpy as np

from isingmontecarlo_tpu.sse.model import BondModel
from isingmontecarlo_tpu.sse.opstring import OpString, is_diagonal, op_count


def count_diagonal_and_off(ops: OpString) -> tuple[jax.Array, jax.Array]:
    """Per-replica (diagonal, off-diagonal) op counts, summing to ``get_n``
    (``qmc_debug.rs:10-26``)."""
    occupied = ops.bond >= 0
    diag = jnp.sum(occupied & is_diagonal(ops), axis=0).astype(jnp.int32)
    off = op_count(ops) - diag
    return diag, off


def count_constant_ops(ops: OpString, model: BondModel) -> jax.Array:
    """Per-replica count of constant (cluster-edge) ops
    (``qmc_debug.rs:28-40``)."""
    b = jnp.maximum(ops.bond, 0)
    is_const = model.is_constant[b] & (ops.bond >= 0)
    return jnp.sum(is_const, axis=0).astype(jnp.int32)


def debug_print_diagonal(
    ops: OpString,
    state: jax.Array,
    model: BondModel,
    replica: int = 0,
    file=None,
) -> str:
    """ASCII worldline dump of one replica, mirroring the format of
    ``diagonal.rs:194-234``: a header of ``=``, the p=0 state as 0/1, then one
    line per imaginary-time slot with ``|`` for untouched variables and the
    op's output spin digits at its variables, annotated with ``p`` and the
    bond id / variable list. Returns the rendered string (also printed to
    ``file`` if given)."""
    nvars = model.nvars
    bond = np.asarray(ops.bond[:, replica])
    outputs = np.asarray(ops.outputs[:, :, replica].T)  # [M, K]
    bond_vars = np.asarray(model.bond_vars)
    st = np.asarray(state[replica])

    buf = io.StringIO()
    buf.write("=" * nvars + "\n")
    buf.write("".join("1" if b else "0" for b in st) + "\n")
    for p in range(bond.shape[0]):
        if bond[p] < 0:
            buf.write("|" * nvars + f"\tp={p}\n")
            continue
        vars_p = bond_vars[bond[p]]
        cells = ["|"] * nvars
        shown = []
        for l, v in enumerate(vars_p):
            if v >= 0:
                cells[int(v)] = "1" if outputs[p, l] else "0"
                shown.append(int(v))
        buf.write("".join(cells) + f"\tp={p}\t{int(bond[p])}: {shown}\n")
    text = buf.getvalue()
    if file is not None:
        print(text, file=file, end="")
    return text
