"""Analysis layer: FFT autocorrelations (reference
``src/sse/autocorrelations.rs``)."""

from isingmontecarlo_tpu.analysis.autocorr import (
    fft_autocorrelation,
    sample_autocorrelation,
    spin_autocorrelation,
    bond_autocorrelation,
    integrated_autocorrelation_time,
    effective_sample_size,
)

__all__ = [
    "fft_autocorrelation",
    "sample_autocorrelation",
    "spin_autocorrelation",
    "bond_autocorrelation",
    "integrated_autocorrelation_time",
    "effective_sample_size",
]
