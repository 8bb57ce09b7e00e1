"""Standard estimators over sampled spin states.

The reference returns raw state trajectories and leaves observables to the
caller (``timesteps_sample``, ``qmc_stepper.rs:23-40``); these helpers cover
the common ones on the batched layout ``bool[..., R, N]`` (any number of
leading sample axes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pm1(states: jax.Array) -> jax.Array:
    return 2.0 * jnp.asarray(states, jnp.float32) - 1.0


def magnetization(states: jax.Array) -> jax.Array:
    """Total magnetization per replica (sum over spins), ``f32[..., R]``."""
    return jnp.sum(_pm1(states), axis=-1)


def magnetization_squared(states: jax.Array) -> jax.Array:
    """``<M^2>`` estimator input per sample/replica, ``f32[..., R]``."""
    m = magnetization(states)
    return m * m


def binder_cumulant(states: jax.Array) -> jax.Array:
    """Binder cumulant ``U4 = 1 - <m^4> / (3 <m^2>^2)`` per replica,
    averaged over all leading sample axes; ``f32[R]``."""
    m = magnetization(states)
    axes = tuple(range(m.ndim - 1))
    m2 = jnp.mean(m * m, axis=axes)
    m4 = jnp.mean(m**4, axis=axes)
    return 1.0 - m4 / jnp.maximum(3.0 * m2 * m2, 1e-30)


def spin_spin_correlation(states: jax.Array) -> jax.Array:
    """All-distance correlation ``C[d] = <s_i s_{i+d}>`` under the periodic
    1D site ordering, averaged over samples and replicas; ``f32[N]``.

    Computed via the Wiener-Khinchin identity with ``jnp.fft`` (the same
    trick as the reference's FFT autocorrelations,
    ``autocorrelations.rs:99-133``, applied along space instead of time).
    """
    s = _pm1(states)
    f = jnp.fft.rfft(s, axis=-1)
    power = f * jnp.conj(f)
    corr = jnp.fft.irfft(power, n=s.shape[-1], axis=-1) / s.shape[-1]
    axes = tuple(range(corr.ndim - 1))
    return jnp.real(jnp.mean(corr, axis=axes))


def structure_factor(states: jax.Array) -> jax.Array:
    """``S(q) = |FFT(s)|^2 / N`` averaged over samples and replicas,
    ``f32[N//2 + 1]`` (rfft bins)."""
    s = _pm1(states)
    f = jnp.fft.rfft(s, axis=-1)
    power = jnp.abs(f) ** 2 / s.shape[-1]
    axes = tuple(range(power.ndim - 1))
    return jnp.mean(power, axis=axes)
