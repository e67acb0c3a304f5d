"""Host-side utilities: image IO, float64 reference kernels, timing."""
