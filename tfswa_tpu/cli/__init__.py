"""Command-line interfaces: train, evaluate, separate, benchmark."""
import os

import jax

# Some TPU platform plugins (e.g. axon) ignore the JAX_PLATFORMS env var;
# honor an explicit cpu request through jax.config before any backend
# initializes so the CLIs run on TPU-less machines (same workaround as
# tests/conftest.py).
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")
