"""Profiling/observability utilities."""
import numpy as np

import jax
import jax.numpy as jnp

from tfswa_tpu.utils.profiling import (
    StepTimer,
    annotate,
    detect_chip,
    device_memory_report,
    flops_of,
)


def test_step_timer():
    timer = StepTimer(flops_per_step=1e9, items_per_step=4)
    import time

    for _ in range(3):
        timer.tick()
        time.sleep(0.01)
    timer.tick()
    m = timer.metrics()
    assert m["step_time_s"] > 0.005
    assert m["items_per_sec"] > 0
    assert 0 <= m["mfu"]


def test_flops_of():
    f = lambda a, b: a @ b
    x = jnp.zeros((64, 64))
    flops = flops_of(f, x, x)
    assert flops is None or flops > 0


def test_detect_chip_and_memory():
    assert detect_chip() in ("cpu", "v4", "v5e", "v5p")
    report = device_memory_report()
    assert len(report) >= 1


def test_annotate_context():
    with annotate("test_region"):
        _ = jnp.sum(jnp.ones((8,)))
