"""Self-contained PyTorch mirror of TFSWA-UNet for artifact export.

Exists so the framework can emit *real* interchange artifacts from trained
JAX variables with no dependency on the reference repo:

  - ``optimization.export.export_to_onnx`` traces this mirror with
    ``torch.onnx.export`` -> a genuine ``.onnx`` file (the reference's
    primary deployment format, reference: export.py:17-139);
  - ``optimization.export.export_torch_checkpoint`` saves a state_dict in
    the reference's exact naming, loadable by the reference implementation
    itself (closing the interop loop: ``evaluation.inference`` already loads
    reference ``.pt`` checkpoints in the other direction).

The module tree reproduces the reference's state_dict key structure
(reference: tfswa_unet.py:56-145, blocks.py:53-94, attention.py:46-47,
116-128) because the key names ARE the interchange format; the forward is
written against our flax model's semantics (models/tfswa_unet.py,
models/attention.py) and is verified against it numerically at export time.

Inference-only: BatchNorm runs in eval mode with converted running stats;
the Dropout slot exists for state-dict shape parity but is inactive.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

from ..ops.windowing import swin_attention_mask


class _RowAttention(nn.Module):
    """MHA over (R, N, C) rows: fused no-bias qkv + out-proj."""

    def __init__(self, dim: int, num_heads: int):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, 3 * dim, bias=False)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x: torch.Tensor,
                mask: Optional[torch.Tensor] = None) -> torch.Tensor:
        R, N, C = x.shape
        H = self.num_heads
        D = C // H
        q, k, v = self.qkv(x).chunk(3, dim=-1)
        q = q.view(R, N, H, D).transpose(1, 2)           # (R, H, N, D)
        k = k.view(R, N, H, D).transpose(1, 2)
        v = v.view(R, N, H, D).transpose(1, 2)
        scores = (q @ k.transpose(-1, -2)) * D ** -0.5   # (R, H, N, N)
        if mask is not None:
            scores = scores + mask                       # additive (R|1, 1, N, N)
        weights = scores.softmax(dim=-1)
        out = (weights @ v).transpose(1, 2).reshape(R, N, C)
        return self.proj(out)


class _RowBlock(nn.Module):
    """Pre-LN transformer block on rows: +MHA(LN1(.)), then +MLP(LN2(.))."""

    def __init__(self, dim: int, num_heads: int, mlp_ratio: float):
        super().__init__()
        hidden = int(dim * mlp_ratio)
        self.norm1 = nn.LayerNorm(dim)
        self.attn = _RowAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential(
            nn.Linear(dim, hidden), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(hidden, dim),
        )

    def _rows(self, rows: torch.Tensor,
              mask: Optional[torch.Tensor] = None) -> torch.Tensor:
        rows = rows + self.attn(self.norm1(rows), mask)
        return rows + self.mlp(self.norm2(rows))


class _TSA(_RowBlock):
    """Attention along H, one row per (batch, w) column."""

    def forward(self, x: torch.Tensor) -> torch.Tensor:   # x NCHW
        B, C, H, W = x.shape
        rows = x.permute(0, 3, 2, 1).reshape(B * W, H, C)
        rows = self._rows(rows)
        return rows.view(B, W, H, C).permute(0, 3, 2, 1)


class _FSA(_RowBlock):
    """Attention along W, one row per (batch, h)."""

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        B, C, H, W = x.shape
        rows = x.permute(0, 2, 3, 1).reshape(B * H, W, C)
        rows = self._rows(rows)
        return rows.view(B, H, W, C).permute(0, 3, 1, 2)


class _SWA(_RowBlock):
    """Pad to window multiples -> cyclic shift -> windowed attention."""

    def __init__(self, dim: int, num_heads: int, mlp_ratio: float,
                 window_size: int, shift_size: int, use_shift_mask: bool):
        super().__init__(dim, num_heads, mlp_ratio)
        self.ws = window_size
        self.ss = shift_size
        self.use_shift_mask = use_shift_mask

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        B, C, H, W = x.shape
        ws, ss = self.ws, self.ss
        xn = x.permute(0, 2, 3, 1)                       # NHWC
        pad_h = (-H) % ws
        pad_w = (-W) % ws
        if pad_h or pad_w:
            xn = F.pad(xn, (0, 0, 0, pad_w, 0, pad_h))
        Hp, Wp = H + pad_h, W + pad_w
        if ss > 0:
            xn = torch.roll(xn, shifts=(-ss, -ss), dims=(1, 2))
        wins = (
            xn.view(B, Hp // ws, ws, Wp // ws, ws, C)
            .permute(0, 1, 3, 2, 4, 5)
            .reshape(-1, ws * ws, C)
        )
        mask = None
        if self.use_shift_mask and ss > 0:
            # .copy(): swin_attention_mask lru-caches its ndarray and
            # from_numpy would alias the cached buffer
            m = torch.from_numpy(swin_attention_mask(Hp, Wp, ws, ss).copy())
            mask = m.unsqueeze(1).repeat(B, 1, 1, 1).to(wins.dtype)
        wins = self._rows(wins, mask)
        xn = (
            wins.view(B, Hp // ws, Wp // ws, ws, ws, C)
            .permute(0, 1, 3, 2, 4, 5)
            .reshape(B, Hp, Wp, C)
        )
        if ss > 0:
            xn = torch.roll(xn, shifts=(ss, ss), dims=(1, 2))
        if pad_h or pad_w:
            xn = xn[:, :H, :W]
        return xn.permute(0, 3, 1, 2)


class _TFSWABlock(nn.Module):
    """input-proj -> {TSA || FSA || SWA} -> concat -> 1x1 fuse -> +residual."""

    def __init__(self, dim: int, window_size: int, shift_size: int,
                 num_heads: int, mlp_ratio: float, use_shift_mask: bool):
        super().__init__()
        self.input_proj = nn.Sequential(
            nn.Conv2d(dim, dim, 1), nn.BatchNorm2d(dim))
        self.tsa = _TSA(dim, num_heads, mlp_ratio)
        self.fsa = _FSA(dim, num_heads, mlp_ratio)
        self.swa = _SWA(dim, num_heads, mlp_ratio,
                        window_size, shift_size, use_shift_mask)
        self.fusion = nn.Sequential(
            nn.Conv2d(3 * dim, dim, 1), nn.BatchNorm2d(dim), nn.GELU())

    def forward(self, x: torch.Tensor,
                skip: Optional[torch.Tensor] = None) -> torch.Tensor:
        h = self.input_proj(x)
        cat = torch.cat([self.tsa(h), self.fsa(h), self.swa(h)], dim=1)
        out = self.fusion(cat) + x
        if skip is not None:
            if skip.shape[-2:] != out.shape[-2:]:
                skip = F.interpolate(skip, out.shape[-2:],
                                     mode="bilinear", align_corners=False)
            out = out + skip
        return out


class _Down(nn.Module):
    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.downsample = nn.Sequential(
            nn.Conv2d(cin, cout, 4, 2, 1), nn.BatchNorm2d(cout), nn.GELU())

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        return self.downsample(x)


class _Up(nn.Module):
    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.upsample = nn.Sequential(
            nn.ConvTranspose2d(cin, cout, 4, 2, 1),
            nn.BatchNorm2d(cout), nn.GELU())

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        return self.upsample(x)


class TorchTFSWAUNetMirror(nn.Module):
    """Export-time torch twin of models.TFSWAUNet (NCHW in/out)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        depths: Sequence[int] = (2, 2, 6, 2),
        dims: Sequence[int] = (32, 64, 128, 256),
        window_size: int = 8,
        shift_size: int = 4,
        num_heads: int = 8,
        mlp_ratio: float = 4.0,
        use_shift_mask: bool = False,
    ):
        super().__init__()
        assert len(depths) == len(dims) == 4

        def mk(dim: int, i: int) -> _TFSWABlock:
            return _TFSWABlock(
                dim, window_size, 0 if i % 2 == 0 else shift_size,
                num_heads, mlp_ratio, use_shift_mask)

        self.stem = nn.Sequential(
            nn.Conv2d(in_channels, dims[0], 7, 1, 3),
            nn.BatchNorm2d(dims[0]), nn.GELU())
        self.encoder_stages = nn.ModuleList(
            nn.ModuleList(mk(dims[s], i) for i in range(depths[s]))
            for s in range(3))
        self.downsample_layers = nn.ModuleList(
            _Down(dims[s], dims[s + 1]) for s in range(3))
        self.bottleneck = nn.ModuleList(
            mk(dims[3], i) for i in range(depths[3]))
        self.upsample_layers = nn.ModuleList(
            _Up(dims[s + 1], dims[s]) for s in (2, 1, 0))
        self.decoder_stages = nn.ModuleList(
            nn.ModuleList(mk(dims[s], i) for i in range(depths[s]))
            for s in (2, 1, 0))
        self.output_head = nn.Sequential(
            nn.Conv2d(dims[0], dims[0], 3, 1, 1),
            nn.BatchNorm2d(dims[0]), nn.GELU(),
            nn.Conv2d(dims[0], out_channels, 1), nn.Sigmoid())

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = self.stem(x)
        skips = []
        for s in range(3):
            for blk in self.encoder_stages[s]:
                x = blk(x)
            skips.append(x)
            x = self.downsample_layers[s](x)
        for blk in self.bottleneck:
            x = blk(x)
        for d, s in enumerate((2, 1, 0)):
            x = self.upsample_layers[d](x)
            skip = skips[s]
            if x.shape[-2:] != skip.shape[-2:]:
                x = F.interpolate(x, skip.shape[-2:],
                                  mode="bilinear", align_corners=False)
            for i, blk in enumerate(self.decoder_stages[d]):
                x = blk(x, skip if i == 0 else None)
        return self.output_head(x)


def mirror_from_variables(
    in_channels: int,
    out_channels: int,
    variables,
    depths: Sequence[int] = (2, 2, 6, 2),
    dims: Sequence[int] = (32, 64, 128, 256),
    window_size: int = 8,
    shift_size: int = 4,
    num_heads: int = 8,
    mlp_ratio: float = 4.0,
    use_shift_mask: bool = False,
) -> TorchTFSWAUNetMirror:
    """Build an eval-mode mirror loaded with converted JAX variables."""
    from ..utils.torch_compat import variables_to_torch_state_dict

    mirror = TorchTFSWAUNetMirror(
        in_channels, out_channels, depths, dims, window_size,
        shift_size, num_heads, mlp_ratio, use_shift_mask)
    sd = {
        # np.array: copy — transposed views are non-contiguous and flax
        # leaves can be non-writable buffers
        k: torch.from_numpy(np.array(v))
        for k, v in variables_to_torch_state_dict(variables, depths).items()
    }
    mirror.load_state_dict(sd, strict=True)
    mirror.eval()
    return mirror
