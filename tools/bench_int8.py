"""INT8 serving A/B on TPU: bf16 vs int8-compute forward + output fidelity.

The measured verdict for VERDICT item 4 (real int8 compute): latency of the
flagship forward with attention_impl='int8' (every dense matmul int8 x int8
-> int32 on the MXU) against the bf16 fused-Pallas production path, plus the
output delta of the quantized model.

    python tools/bench_int8.py [--iters 4] [--seconds 3 10]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tfswa_tpu.models import TFSWAUNet
from tfswa_tpu.optimization.quantization import compare_models, quantize_dynamic

def _shape(seconds: float):
    """(B=2, 4, freq, frames) at n_fft 2048 / hop 512, 44.1 kHz."""
    frames = int(seconds * 44100) // 512 + 1
    return (2, 4, 1025, frames)


def timeit(fn, x, iters):
    out = fn(x)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    cur = x
    for _ in range(iters):
        out = fn(cur)
        # feed a hash of the output back so iterations chain (axon tunnel
        # memoizes identical in-flight dispatches)
        cur = x + 1e-6 * jnp.mean(out.astype(jnp.float32))
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--seconds", type=float, nargs="+", default=[3.0],
                    help="segment lengths to A/B (VERDICT r3 #7: re-check "
                         "the 10 s crossover after the density rework)")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)

    bf16 = TFSWAUNet(in_channels=4, out_channels=4, dtype=jnp.bfloat16,
                     attention_impl="pallas")
    variables = bf16.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 129, 20)))
    fwd16 = jax.jit(lambda v: bf16.apply(variables, v, train=False))
    qmodel, stats = quantize_dynamic(bf16, variables, compute="int8")
    for sec in args.seconds:
        x = jnp.asarray(rng.standard_normal(_shape(sec)), jnp.float32)
        t16 = timeit(fwd16, x, args.iters)
        print(f"[{sec:4.1f} s] bf16 fused-Pallas forward : {t16*1e3:8.1f} ms")
        t8 = timeit(qmodel, x, args.iters)
        print(f"[{sec:4.1f} s] int8-compute forward      : {t8*1e3:8.1f} ms  "
              f"(speedup {t16/t8:.2f}x, {stats['compression_ratio']:.1f}x "
              f"smaller)")

    f32 = TFSWAUNet(in_channels=4, out_channels=4)
    diff = compare_models(f32, variables, qmodel, input_shape=(1, 4, 257, 65))
    print(f"int8 output delta vs f32  : mae={diff['mae']:.4g} "
          f"max={diff['max_abs']:.4g}")


if __name__ == "__main__":
    main()
