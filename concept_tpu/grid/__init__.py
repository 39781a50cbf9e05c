from concept_tpu.grid.fft import rfft3, irfft3, GridDistribution  # noqa: F401
