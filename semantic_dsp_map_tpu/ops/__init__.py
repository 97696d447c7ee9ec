"""Array kernels for the semantic DSP map (pure functions, jit-friendly)."""
