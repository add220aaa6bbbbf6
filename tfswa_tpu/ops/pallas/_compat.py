"""Backend compatibility helpers for the Pallas kernels.

On the CPU backend Pallas only supports interpreter mode; kernels are
production paths on TPU but must still *run* on CPU (tests, the verify
drive, users without a TPU).  Every pallas_call in this package passes
``interpret=default_interpret()`` so CPU execution transparently falls back
to the interpreter, while TPU compiles normally.
"""
from __future__ import annotations

import jax


def default_interpret() -> bool:
    """True when the default backend cannot compile Pallas (CPU)."""
    return jax.default_backend() == "cpu"
