"""Golden-activation parity vs the PyTorch reference implementation.

Imports the read-only reference at /root/reference (skipped when absent),
converts its randomly-initialized weights with torch_compat, and checks
elementwise agreement of forward outputs.  This is the strongest parity gate:
it exercises conv/deconv shape rules, BN, LayerNorm, all three attentions,
window partition order, bilinear fix-ups, and the sigmoid head at once.
"""
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # heavy tier: run via plain pytest / -m slow

REFERENCE = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REFERENCE, "src", "models"))

try:
    import torch

    HAS_TORCH = True
except ImportError:
    HAS_TORCH = False

needs_ref = pytest.mark.skipif(
    not (HAS_REF and HAS_TORCH), reason="reference repo or torch unavailable"
)


def _load_reference_model(**kwargs):
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from src.models.tfswa_unet import TFSWAUNet as TorchTFSWAUNet

    return TorchTFSWAUNet(**kwargs)


SMALL = dict(
    in_channels=2,
    out_channels=2,
    depths=[1, 1, 1, 1],
    dims=[8, 16, 32, 64],
    window_size=4,
    shift_size=2,
    num_heads=2,
)


@needs_ref
@pytest.mark.parametrize("shape", [(1, 2, 32, 32), (1, 2, 33, 20)])
def test_forward_parity_eval_mode(shape):
    """Converted weights must reproduce reference outputs (eval-mode BN).
    The odd (33, 20) shape exercises SWA padding and bilinear fix-ups."""
    torch.manual_seed(0)
    t_model = _load_reference_model(**SMALL)
    t_model.eval()

    from tfswa_tpu.models import TFSWAUNet
    from tfswa_tpu.utils.torch_compat import torch_state_dict_to_variables

    variables = torch_state_dict_to_variables(
        t_model.state_dict(), SMALL["depths"]
    )
    j_model = TFSWAUNet(
        in_channels=2, out_channels=2, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
        window_size=4, shift_size=2, num_heads=2,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)

    with torch.no_grad():
        t_out = t_model(torch.from_numpy(x)).numpy()

    j_out = np.asarray(j_model.apply(variables, jnp.asarray(x), train=False))

    assert j_out.shape == t_out.shape
    np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=1e-4)


@needs_ref
def test_param_count_parity_full_config():
    """15,404,834 params at the reference test_model.py config
    (reference: test_model.py:13-21, README.md:184-193)."""
    t_model = _load_reference_model(
        in_channels=2, out_channels=2, depths=[2, 2, 6, 2],
        dims=[32, 64, 128, 256], window_size=8, shift_size=4, num_heads=8,
    )
    t_count = sum(p.numel() for p in t_model.parameters() if p.requires_grad)
    assert t_count == 15404834

    from tfswa_tpu.models import TFSWAUNet

    j_model = TFSWAUNet(in_channels=2, out_channels=2)
    v = j_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16)))
    assert TFSWAUNet.count_parameters(v["params"]) == t_count


@needs_ref
def test_full_state_dict_roundtrip_conversion():
    """Every torch param in the full config maps; nothing is silently dropped."""
    t_model = _load_reference_model(
        in_channels=2, out_channels=2, depths=[2, 2, 6, 2],
        dims=[32, 64, 128, 256], window_size=8, shift_size=4, num_heads=8,
    )
    from tfswa_tpu.models import TFSWAUNet
    from tfswa_tpu.utils.torch_compat import torch_state_dict_to_variables

    variables = torch_state_dict_to_variables(t_model.state_dict(), [2, 2, 6, 2])
    assert TFSWAUNet.count_parameters(variables["params"]) == 15404834
