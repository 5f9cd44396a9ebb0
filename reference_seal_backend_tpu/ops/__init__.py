"""Device-side compute kernels: modular arithmetic, NTT, Pallas kernels."""
