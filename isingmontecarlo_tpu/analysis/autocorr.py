"""FFT-based autocorrelations — reference ``src/sse/autocorrelations.rs``.

Mirrors ``fft_autocorrelation`` (``autocorrelations.rs:99-133``): per
variable, subtract the time mean, normalize by the L2 norm, FFT along time,
take ``|.|^2``, inverse FFT, then average over variables. The reference's
rustfft inverse is unnormalized (scale ``tmax``); combined with its final
``1/(n*tmax)`` division this equals the mean over variables of numpy-style
normalized ``ifft``.

The capability surface mirrors ``QmcAutoCorrelations``
(``autocorrelations.rs:38-97``): autocorrelation of spin variables, of spin
products, and of bond-satisfaction values, computed from sampled state
trajectories. Everything is batched: samples may carry a replica axis and
autocorrelations are averaged across replicas.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


@jax.jit
def fft_autocorrelation(samples: jax.Array) -> jax.Array:
    """Autocorrelation of ``f64/f32[T, ..., V]`` samples along axis 0.

    Returns ``f32[T]``: mean over all trailing axes of the normalized
    autocorrelation function (``autocorrelations.rs:99-133``).
    """
    samples = jnp.asarray(samples, jnp.float32)
    t = samples.shape[0]
    x = samples - jnp.mean(samples, axis=0, keepdims=True)
    norm = jnp.sqrt(jnp.sum(x * x, axis=0, keepdims=True))
    x = x / jnp.where(norm > 0, norm, 1.0)
    f = jnp.fft.fft(x, axis=0)
    ac = jnp.fft.ifft(jnp.abs(f) ** 2, axis=0).real
    reduce_axes = tuple(range(1, ac.ndim))
    return jnp.mean(ac, axis=reduce_axes) if reduce_axes else ac


def sample_autocorrelation(
    states: jax.Array,
    sample_mapper: Callable[[jax.Array], jax.Array],
) -> jax.Array:
    """``calculate_autocorrelation`` (``autocorrelations.rs:8-35``): map each
    sampled state through ``sample_mapper`` then autocorrelate.

    ``states: bool[T, R, N]``; the mapper acts on the trailing axes.
    """
    return fft_autocorrelation(sample_mapper(states))


def spin_autocorrelation(states: jax.Array) -> jax.Array:
    """Autocorrelation of spin variables ±1 (``autocorrelations.rs:38-50``)."""
    return fft_autocorrelation(2.0 * jnp.asarray(states, jnp.float32) - 1.0)


def product_autocorrelation(
    states: jax.Array, var_products: Sequence[Sequence[int]]
) -> jax.Array:
    """Autocorrelation of products of spins (``autocorrelations.rs:53-70``)."""
    s = 2.0 * jnp.asarray(states, jnp.float32) - 1.0
    prods = [jnp.prod(s[..., jnp.asarray(list(vs))], axis=-1) for vs in var_products]
    return fft_autocorrelation(jnp.stack(prods, axis=-1))


def integrated_autocorrelation_time(series: jax.Array, c: float = 5.0) -> float:
    """Integrated autocorrelation time ``tau`` of a scalar time series
    ``f32[T]`` (or ``[T, R]``, averaged over replicas) with Sokal's adaptive
    window: ``tau = 1 + 2 sum_{t<=W} rho(t)`` for the smallest ``W >= c*tau``.
    """
    import numpy as np

    x = np.asarray(series, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    T = x.shape[0]
    x = x - x.mean(axis=0, keepdims=True)
    # FFT autocorrelation per replica, averaged.
    n = 1 << (2 * T - 1).bit_length()
    f = np.fft.rfft(x, n=n, axis=0)
    acf = np.fft.irfft(np.abs(f) ** 2, n=n, axis=0)[:T].real
    acf /= np.maximum(acf[0], 1e-300)
    rho = acf.mean(axis=1)
    tau = 1.0
    for W in range(1, T):
        tau = 1.0 + 2.0 * rho[1 : W + 1].sum()
        if W >= c * tau:
            break
    return float(max(tau, 1.0))


def effective_sample_size(series: jax.Array) -> float:
    """ESS of a scalar observable series ``[T]`` or ``[T, R]``: total samples
    divided by the integrated autocorrelation time (per replica chains are
    independent, so ESS adds across the replica axis)."""
    import numpy as np

    x = np.asarray(series)
    T = x.shape[0]
    R = 1 if x.ndim == 1 else int(np.prod(x.shape[1:]))
    tau = integrated_autocorrelation_time(series)
    return T * R / tau


def bond_autocorrelation(states: jax.Array, edges, ej) -> jax.Array:
    """Autocorrelation of bond-satisfaction values — the
    ``QmcBondAutoCorrelations`` surface (``autocorrelations.rs:76-97``,
    ``qmc_ising.rs:978-998``): per bond, ±1 whether the bond is energetically
    satisfied (sign of ``-J sigma_a sigma_b``).
    """
    s = 2.0 * jnp.asarray(states, jnp.float32) - 1.0
    edges = jnp.asarray(edges)
    ej = jnp.asarray(ej, jnp.float32)
    sa = s[..., edges[:, 0]]
    sb = s[..., edges[:, 1]]
    vals = jnp.where(ej[None, None, :] * sa * sb < 0, 1.0, -1.0)
    return fft_autocorrelation(vals)
