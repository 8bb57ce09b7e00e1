"""Pallas TPU kernel: multi-sweep checkerboard Metropolis on a periodic
uniform square lattice.

This is the hot path behind the 256^2 classical benchmark (BASELINE.md). The
XLA version (:func:`isingmontecarlo_tpu.classical.metropolis.checkerboard_sweep`)
round-trips the spin field (and threefry uniforms) through HBM every sweep;
this kernel holds one replica's spin field in VMEM for ``nsweeps`` full
sweeps, draws randomness from the on-chip PRNG (``pltpu.prng_random_bits``),
and touches HBM exactly twice (load + store). Reference semantics: energy
``E = sum_e J sigma_i sigma_j - h sum sigma``
(``src/classical/graph.rs:430-447``), single-spin flip
``dE = -2 J sigma_v sum_nb sigma + 2 h sigma_v``, Metropolis acceptance
``dE <= 0 || u < exp(-beta dE)`` (``graph.rs:339-347``), applied
checkerboard-parallel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seed_ref, beta_ref, j_ref, h_ref, spins_ref, out_ref, *, nsweeps, L):
    # Distinct PRNG stream per replica (grid program).
    r = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + r)

    beta = beta_ref[0]
    j = j_ref[0]
    h = h_ref[0]

    yy = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    parity = ((xx + yy) % 2).astype(jnp.float32)

    s0 = spins_ref[0].astype(jnp.float32) * 2.0 - 1.0  # +-1

    def half_sweep(s, par):
        nsum = (
            pltpu.roll(s, 1, axis=1)
            + pltpu.roll(s, L - 1, axis=1)  # roll requires shift >= 0
            + pltpu.roll(s, 1, axis=0)
            + pltpu.roll(s, L - 1, axis=0)
        )
        # graph.rs energy convention: E = sum_e J s_i s_j - h sum s.
        de = -2.0 * j * nsum * s + 2.0 * h * s
        bits = pltpu.bitcast(pltpu.prng_random_bits((L, L)), jnp.uint32)
        # uint32 -> f32 casts are unsupported; drop the top byte first so the
        # value fits an int32, then cast.
        u24 = pltpu.bitcast(bits >> 8, jnp.int32)
        u = u24.astype(jnp.float32) * (1.0 / (1 << 24))
        acc = u < jnp.exp(-beta * jnp.maximum(de, 0.0))
        flip = jnp.logical_and(parity == par, acc)
        return jnp.where(flip, -s, s)

    def body(i, s):
        s = half_sweep(s, 0.0)
        s = half_sweep(s, 1.0)
        return s

    s = jax.lax.fori_loop(0, nsweeps, body, s0)
    out_ref[0] = (s > 0.0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("nsweeps", "interpret"))
def checkerboard_multi_sweep(
    spins: jax.Array,  # int8/bool [R, L, L]
    seed: jax.Array,  # i32[]
    beta: jax.Array,
    j: jax.Array,
    h: jax.Array,
    nsweeps: int,
    interpret: bool = False,
) -> jax.Array:
    """``nsweeps`` full checkerboard Metropolis sweeps entirely in VMEM.

    One grid program per replica; each holds its ``L x L`` field on-chip.
    ``L`` should be a multiple of 128 on real TPUs (tiling); use
    ``interpret=True`` for small-lattice testing on CPU.
    """
    R, L, _ = spins.shape
    spins_i8 = spins.astype(jnp.int8)
    scalars = [
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([beta], jnp.float32),
        jnp.asarray([j], jnp.float32),
        jnp.asarray([h], jnp.float32),
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, nsweeps=nsweeps, L=L),
        grid=(R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, L, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, L, L), jnp.int8),
        interpret=interpret,
    )(*scalars, spins_i8)
    return out.astype(bool)
