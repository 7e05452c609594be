"""Per-scan compute kernels (pure, jittable, fixed-shape)."""
