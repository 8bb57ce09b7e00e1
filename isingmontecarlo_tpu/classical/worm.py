"""Batched zero-energy worm walks (reference ``src/classical/graph.rs:179-318``).

Semantics of a single worm (reference ``do_worm_flip``):

1. Pick a random start site, record ``starting_e`` = coupling-only dE of
   flipping it, flip it.
2. Repeatedly, from the current endpoint, enumerate neighbor moves (excluding
   the site we came from). Candidates are flips with coupling-only ``dE == 0``
   (continuation) or ``dE == -starting_e`` (resolution). If any resolving
   candidate exists, choose only among resolving candidates; otherwise choose
   uniformly among continuations. With no candidates, turn around (re-flip the
   current endpoint, undoing the last move).
3. The worm closes when the applied move's ``dE`` cancels ``starting_e``.
   If the path length exceeds ``nvars`` the update fails and all flips are
   reverted (``graph.rs:283-316``).
4. On success, the net-flipped set (XOR of the visit path) is accepted or
   reverted with a Metropolis test on the longitudinal-bias energy change.

Deviations from the reference:

- Double moves (``WormMove::Double``, ``graph.rs:224-240``) are not yet
  implemented; the walk uses single-site moves only.
- The final bias Metropolis test uses the physical energy change
  ``dE_bias = sum_v 2 h_v sigma_v^{before}`` of the net flip. The reference
  evaluates ``2 h_v sigma_v^{after}`` (``graph.rs:303-306``), which is the
  negation of the energy change of the flip it just performed; we follow the
  physical convention (identical behavior for ``h = 0``, which is what the
  reference's own worm tests exercise).

TPU-native design: one worm per replica, advanced in lockstep by a single
``lax.while_loop`` whose body does O(max_degree) vector work per replica;
finished lanes idle until all replicas close or fail.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from isingmontecarlo_tpu.classical.metropolis import GraphTables, sigma

_EPS = 1e-6


class _WormCarry(NamedTuple):
    spins: jax.Array  # bool[R, N]
    flipped: jax.Array  # bool[R, N]  net parity of flips (visit path XOR)
    cur: jax.Array  # i32[R]     current worm endpoint
    last: jax.Array  # i32[R]     site we came from
    steps: jax.Array  # i32[R]
    done: jax.Array  # bool[R]
    failed: jax.Array  # bool[R]
    key: jax.Array


def _coupling_delta_e(spins, tables: GraphTables, v):
    """Coupling-only dE of flipping site ``v`` per replica (graph.rs:155-177).

    ``v: i32[R]`` -> ``f32[R]``.
    """
    s = sigma(spins)  # [R, N]
    neigh = jnp.where(tables.neigh >= 0, tables.neigh, 0)
    w = jnp.where(tables.neigh >= 0, tables.nj, 0.0)
    nv = neigh[v]  # [R, D]
    wv = w[v]  # [R, D]
    sv = jnp.take_along_axis(s, v[:, None], axis=1)  # [R, 1]
    sn = jnp.take_along_axis(s, nv, axis=1)  # [R, D]
    return jnp.sum(-2.0 * wv * sv * sn, axis=-1)


def _delta_e_candidates(spins, tables: GraphTables, v):
    """dE of flipping each neighbor of ``v``: ``f32[R, D]`` (+ validity mask)."""
    s = sigma(spins)  # [R, N]
    neigh = jnp.where(tables.neigh >= 0, tables.neigh, 0)
    w = jnp.where(tables.neigh >= 0, tables.nj, 0.0)
    cand = neigh[v]  # [R, D] neighbor ids of the endpoint
    valid = tables.neigh[v] >= 0  # [R, D]
    # dE of flipping candidate c: -2 sum_j J_cj sigma_c sigma_j
    nc = neigh[cand]  # [R, D, D2]
    wc = w[cand]  # [R, D, D2]
    sn = s[jnp.arange(s.shape[0])[:, None, None], nc]  # [R, D, D2]
    sc = s[jnp.arange(s.shape[0])[:, None], cand][:, :, None]  # [R, D, 1]
    de = jnp.sum(-2.0 * wc * sc * sn, axis=-1)  # [R, D]
    return cand, de, valid


def _choose(key, weights):
    """Uniformly choose an index among ``weights > 0`` per row; -1 if none."""
    R, D = weights.shape
    total = jnp.sum(weights, axis=-1)
    u = jax.random.uniform(key, (R,)) * total
    cum = jnp.cumsum(weights, axis=-1)
    idx = jnp.sum((u[:, None] >= cum).astype(jnp.int32), axis=-1)
    idx = jnp.minimum(idx, D - 1)
    return jnp.where(total > 0, idx, -1)


@functools.partial(jax.jit, static_argnames=())
def worm_sweep(
    spins: jax.Array,
    key: jax.Array,
    beta: jax.Array,
    tables: GraphTables,
) -> jax.Array:
    """Run one worm update per replica. ``spins: bool[R, N]`` -> updated."""
    R, N = spins.shape
    beta = jnp.asarray(beta, jnp.float32)

    key, k_start = jax.random.split(key)
    start = jax.random.randint(k_start, (R,), 0, N)
    starting_e = _coupling_delta_e(spins, tables, start)

    rows = jnp.arange(R)
    spins0 = spins
    spins = spins.at[rows, start].set(~spins[rows, start])
    flipped = jnp.zeros_like(spins).at[rows, start].set(True)

    carry = _WormCarry(
        spins=spins,
        flipped=flipped,
        cur=start,
        last=start,
        steps=jnp.zeros((R,), jnp.int32),
        done=jnp.zeros((R,), bool),
        failed=jnp.zeros((R,), bool),
        key=key,
    )

    def cond(c: _WormCarry):
        return jnp.any(~(c.done | c.failed))

    def body(c: _WormCarry) -> _WormCarry:
        key, k_choice = jax.random.split(c.key)
        cand, de, valid = _delta_e_candidates(c.spins, tables, c.cur)
        valid &= cand != c.last[:, None]
        is_cont = valid & (jnp.abs(de) < _EPS)
        is_res = valid & (jnp.abs(de + starting_e[:, None]) < _EPS)
        any_res = jnp.any(is_res, axis=-1)
        cand_mask = jnp.where(any_res[:, None], is_res, is_cont | is_res)

        choice = _choose(k_choice, cand_mask.astype(jnp.float32))
        has_choice = choice >= 0
        safe_choice = jnp.maximum(choice, 0)
        move_var = jnp.where(
            has_choice, cand[rows, safe_choice], c.cur
        )  # turn-around re-flips the endpoint (graph.rs:250-262)
        move_de = jnp.where(
            has_choice,
            de[rows, safe_choice],
            _coupling_delta_e(c.spins, tables, c.cur),
        )

        active = ~(c.done | c.failed)
        new_spins = c.spins.at[rows, move_var].set(
            jnp.where(active, ~c.spins[rows, move_var], c.spins[rows, move_var])
        )
        new_flipped = c.flipped.at[rows, move_var].set(
            jnp.where(active, ~c.flipped[rows, move_var], c.flipped[rows, move_var])
        )
        # After both a normal move and a turn-around, "last" becomes the
        # previous endpoint (graph.rs:272-278; in the turn-around case the new
        # endpoint equals the previous one, so this also bans immediate
        # re-reversal until another neighbor opens up).
        new_last = c.cur
        new_cur = move_var

        closed = jnp.abs(move_de + starting_e) < _EPS
        steps = c.steps + 1
        too_long = steps > N

        return _WormCarry(
            spins=new_spins,
            flipped=new_flipped,
            cur=jnp.where(active, new_cur, c.cur),
            last=jnp.where(active, new_last, c.last),
            steps=jnp.where(active, steps, c.steps),
            done=c.done | (active & closed),
            failed=c.failed | (active & ~closed & too_long),
            key=key,
        )

    out = jax.lax.while_loop(cond, body, carry)

    # Failed worms revert entirely (graph.rs:311-316).
    spins = jnp.where(out.failed[:, None], spins0, out.spins)
    flipped = jnp.where(out.failed[:, None], False, out.flipped)

    # Bias Metropolis test on the net flip (see module docstring).
    s_before = sigma(jnp.where(flipped, ~spins, spins))
    de_bias = jnp.sum(
        jnp.where(flipped, 2.0 * tables.biases[None, :] * s_before, 0.0), axis=-1
    )
    key, k_acc = jax.random.split(out.key)
    u = jax.random.uniform(k_acc, (R,))
    keep = u < jnp.exp(-beta * jnp.maximum(de_bias, 0.0))
    spins = jnp.where((keep | out.failed)[:, None], spins, jnp.where(flipped, ~spins, spins))
    return spins
