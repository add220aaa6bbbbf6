"""ASCII architecture dump + per-module parameter breakdown.

Equivalent capability to the reference's visualize_architecture.py
(reference: visualize_architecture.py:6-186).

    python tools/visualize.py [--depths 2,2,6,2] [--dims 32,64,128,256]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depths", default="2,2,6,2")
    ap.add_argument("--dims", default="32,64,128,256")
    ap.add_argument("--in_channels", type=int, default=2)
    ap.add_argument("--out_channels", type=int, default=2)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=512)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tfswa_tpu.models import TFSWAUNet

    depths = tuple(int(x) for x in args.depths.split(","))
    dims = tuple(int(x) for x in args.dims.split(","))
    model = TFSWAUNet(
        in_channels=args.in_channels, out_channels=args.out_channels,
        depths=depths, dims=dims,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.in_channels, 16, 16))
    )
    params = variables["params"]

    def count(tree):
        return sum(p.size for p in jax.tree_util.tree_leaves(tree))

    total = count(params)
    H, W = args.height, args.width
    print("=" * 64)
    print("TFSWA-UNet (tfswa_tpu)")
    print("=" * 64)
    print(f"input  (B, {args.in_channels}, {H}, {W})")
    print(f"  stem Conv7x7 -> BN -> GELU           [{dims[0]:4d} ch]")
    h, w = H, W
    for s in range(3):
        blocks = " -> ".join(
            f"TFSWA({'W' if i % 2 == 0 else 'SW'})" for i in range(depths[s])
        )
        print(f"  enc{s}  {blocks:42s} [{dims[s]:4d} ch, {h}x{w}]  --skip-->")
        h, w = (h + 2 - 4) // 2 + 1, (w + 2 - 4) // 2 + 1
        print(f"  down{s} Conv4x4/2 -> BN -> GELU         [{dims[s+1]:4d} ch, {h}x{w}]")
    blocks = " -> ".join(
        f"TFSWA({'W' if i % 2 == 0 else 'SW'})" for i in range(depths[3])
    )
    print(f"  bottleneck {blocks:38s} [{dims[3]:4d} ch, {h}x{w}]")
    for d, s in enumerate(range(2, -1, -1)):
        h, w = h * 2, w * 2
        print(f"  up{d}   ConvT4x4/2 -> BN -> GELU        [{dims[s]:4d} ch, ~{h}x{w}] <--skip--")
        blocks = " -> ".join(
            f"TFSWA({'W' if i % 2 == 0 else 'SW'})" for i in range(depths[s])
        )
        print(f"  dec{d}  {blocks:42s} [{dims[s]:4d} ch]")
    print(f"  head Conv3x3 -> BN -> GELU -> Conv1x1 -> sigmoid")
    print(f"output (B, {args.out_channels}, {H}, {W})  masks in [0, 1]")
    print("-" * 64)
    print(f"{'module':24s} {'params':>12s} {'share':>7s}")
    for name in sorted(params):
        c = count(params[name])
        print(f"{name:24s} {c:12,d} {100*c/total:6.2f}%")
    print("-" * 64)
    print(f"{'TOTAL':24s} {total:12,d}")
    print(f"fp32 {total*4/1e6:.2f} MB | bf16 {total*2/1e6:.2f} MB | int8 {total/1e6:.2f} MB")


if __name__ == "__main__":
    main()
