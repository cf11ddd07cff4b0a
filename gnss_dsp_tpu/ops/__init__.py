"""Device-side DSP primitives (jax.numpy / Pallas)."""
