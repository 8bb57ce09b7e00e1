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

Layout: the two checkerboard colors are stored *compacted* as ``(L, L/2)``
planes (color of site ``(y, x)`` is ``(x + y) % 2``; plane E holds
``s[y, 2k + (y & 1)]``, plane O the rest). Every VPU lane is then a real
attempt and the PRNG draws exactly one word per attempt — the full-field
formulation wastes half of both on the masked color. Neighbor sums become
rolls of the *other* plane with a row-parity select for the left/right pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def split_colors(spins: jax.Array) -> jax.Array:
    """``bool/int8 [R, L, L]`` -> ``int8 [R, 2, L, L/2]`` compact planes."""
    R, L, _ = spins.shape
    pairs = spins.astype(jnp.int8).reshape(R, L, L // 2, 2)
    ye = (jnp.arange(L, dtype=jnp.int32) % 2 == 0)[None, :, None]
    e = jnp.where(ye, pairs[..., 0], pairs[..., 1])
    o = jnp.where(ye, pairs[..., 1], pairs[..., 0])
    return jnp.stack([e, o], axis=1)


def merge_colors(eo: jax.Array) -> jax.Array:
    """Inverse of :func:`split_colors`: ``[R, 2, L, L/2]`` -> ``[R, L, L]``."""
    R, _, L, H = eo.shape
    e, o = eo[:, 0], eo[:, 1]
    ye = (jnp.arange(L, dtype=jnp.int32) % 2 == 0)[None, :, None]
    p0 = jnp.where(ye, e, o)
    p1 = jnp.where(ye, o, e)
    return jnp.stack([p0, p1], axis=-1).reshape(R, L, 2 * H)


def _kernel(seed_ref, beta_ref, j_ref, h_ref, eo_ref, out_ref, *, nsweeps, L):
    # Distinct PRNG stream per replica (grid program).
    r = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + r)

    beta = beta_ref[0]
    j = j_ref[0]
    h = h_ref[0]
    H = L // 2

    row_even = (
        jax.lax.broadcasted_iota(jnp.int32, (L, H), 0) % 2
    ) == 0

    e0 = eo_ref[0, 0].astype(jnp.float32) * 2.0 - 1.0  # +-1
    o0 = eo_ref[0, 1].astype(jnp.float32) * 2.0 - 1.0

    def attempt(s, nsum):
        # graph.rs energy convention: E = sum_e J s_i s_j - h sum s, so
        # dE = s * (2 h - 2 J nsum).
        de = s * (2.0 * h - 2.0 * j * nsum)
        bits = pltpu.bitcast(pltpu.prng_random_bits((L, H)), jnp.uint32)
        # uint32 -> f32 casts are unsupported; drop the top byte first so the
        # value fits an int32, then cast.
        u24 = pltpu.bitcast(bits >> 8, jnp.int32)
        u = u24.astype(jnp.float32) * (1.0 / (1 << 24))
        acc = u < jnp.exp(-beta * jnp.maximum(de, 0.0))
        return jnp.where(acc, -s, s)

    def body(i, carry):
        e, o = carry
        # E-plane neighbors: up/down = O rolled along rows; left/right pair =
        # O and O shifted by one lane, direction depending on row parity.
        nsum_e = (
            pltpu.roll(o, 1, axis=0)
            + pltpu.roll(o, L - 1, axis=0)  # roll requires shift >= 0
            + o
            + jnp.where(
                row_even,
                pltpu.roll(o, 1, axis=1),
                pltpu.roll(o, H - 1, axis=1),
            )
        )
        e = attempt(e, nsum_e)
        nsum_o = (
            pltpu.roll(e, 1, axis=0)
            + pltpu.roll(e, L - 1, axis=0)
            + e
            + jnp.where(
                row_even,
                pltpu.roll(e, H - 1, axis=1),
                pltpu.roll(e, 1, axis=1),
            )
        )
        o = attempt(o, nsum_o)
        return e, o

    e, o = jax.lax.fori_loop(0, nsweeps, body, (e0, o0))
    out_ref[0, 0] = (e > 0.0).astype(jnp.int8)
    out_ref[0, 1] = (o > 0.0).astype(jnp.int8)


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

    One grid program per replica; each holds its ``L x L`` field on-chip in
    the compact two-plane color layout. ``L`` should be a multiple of 256 on
    real TPUs (the plane lane width ``L/2`` must tile by 128); use
    ``interpret=True`` for small-lattice testing on CPU.
    """
    R, L, _ = spins.shape
    H = L // 2
    eo = split_colors(spins)
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
            pl.BlockSpec(
                (1, 2, L, H), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, L, H), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, 2, L, H), jnp.int8),
        interpret=interpret,
    )(*scalars, eo)
    return merge_colors(out).astype(bool)
