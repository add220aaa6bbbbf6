"""Split the flagship forward's cost: attention blocks vs everything else
(convs, BN, down/upsample, fuse, STFT-side glue).

Monkeypatches row_transformer_block to identity for the "no-attn" arm —
shape-preserving, so the rest of the network runs unchanged.

    python tools/forward_ablation.py [--batch 8] [--seconds 10]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, x, iters=6):
    import jax.numpy as jnp

    out = fn(x)
    float(jnp.sum(jnp.abs(out)))  # compile + sync (tunnel-safe scalar fetch)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out[..., : x.shape[-1]] if out.shape != x.shape else out)
    s = float(jnp.sum(jnp.abs(out)))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(s)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=10.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tfswa_tpu.models.attention as attn_mod
    from tfswa_tpu.models import TFSWAUNet

    T = int(args.seconds * 44100) // 512 + 1
    F = 1025
    model = TFSWAUNet(
        in_channels=4, out_channels=4, dtype=jnp.bfloat16,
        attention_impl="pallas",
    )
    x = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((args.batch, 4, F, T))
        .astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    print(f"device: {jax.devices()[0].device_kind}, input {x.shape}")

    fwd = jax.jit(lambda v, a: model.apply(v, a, train=False))
    t_full = timeit(lambda a: fwd(variables, a), x)
    print(f"full forward    : {t_full * 1e3:8.1f} ms")

    orig = attn_mod.row_transformer_block
    try:
        attn_mod.row_transformer_block = (
            lambda rows, p, num_heads, **kw: rows
        )
        fwd2 = jax.jit(lambda v, a: model.apply(v, a, train=False))
        t_glue = timeit(lambda a: fwd2(variables, a), x)
    finally:
        attn_mod.row_transformer_block = orig
    print(f"attention as id : {t_glue * 1e3:8.1f} ms")
    print(f"=> attention    : {(t_full - t_glue) * 1e3:8.1f} ms"
          f"  ({100 * (t_full - t_glue) / t_full:.0f}%)")
    print(f"=> conv/bn/glue : {t_glue * 1e3:8.1f} ms"
          f"  ({100 * t_glue / t_full:.0f}%)")


if __name__ == "__main__":
    main()
