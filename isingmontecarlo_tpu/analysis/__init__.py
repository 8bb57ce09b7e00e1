"""Analysis layer: FFT autocorrelations (reference
``src/sse/autocorrelations.rs``) plus standard state observables
(magnetization, Binder cumulant, correlations — beyond-reference helpers)."""

from isingmontecarlo_tpu.analysis.autocorr import (
    fft_autocorrelation,
    sample_autocorrelation,
    spin_autocorrelation,
    bond_autocorrelation,
    integrated_autocorrelation_time,
    effective_sample_size,
)
from isingmontecarlo_tpu.analysis.observables import (
    magnetization,
    magnetization_squared,
    binder_cumulant,
    spin_spin_correlation,
    structure_factor,
)

__all__ = [
    "fft_autocorrelation",
    "sample_autocorrelation",
    "spin_autocorrelation",
    "bond_autocorrelation",
    "integrated_autocorrelation_time",
    "effective_sample_size",
    "magnetization",
    "magnetization_squared",
    "binder_cumulant",
    "spin_spin_correlation",
    "structure_factor",
]
