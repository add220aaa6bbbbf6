"""Real ONNX export + reference-format torch checkpoint interop.

Covers the reference's primary deployment artifact (reference:
export.py:17-139) end-to-end without the `onnx`/`onnxruntime` packages:
the torch mirror is verified elementwise against the JAX forward (that is
the traced graph's semantics), the serialized proto is sanity-checked, and
the emitted state_dict round-trips through the existing torch->flax
converter and loads into the actual reference implementation when present.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tfswa_tpu.models import TFSWAUNet  # noqa: E402
from tfswa_tpu.optimization import (  # noqa: E402
    export_to_onnx,
    export_torch_checkpoint,
    make_forward_fn,
)
from tfswa_tpu.utils.torch_compat import (  # noqa: E402
    torch_state_dict_to_variables,
    variables_to_torch_state_dict,
)

SMALL = dict(
    in_channels=2, out_channels=2, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
    window_size=4, shift_size=2, num_heads=2,
)
SHAPE = (1, 2, 32, 32)
REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def model_and_vars():
    model = TFSWAUNet(**SMALL)
    variables = model.init(jax.random.PRNGKey(7), jnp.zeros(SHAPE))
    # Non-trivial BN stats so conversion of running mean/var is exercised.
    variables = jax.tree_util.tree_map(np.asarray, variables)
    rng = np.random.default_rng(3)
    stats = variables["batch_stats"]

    def perturb(node):
        for k, v in node.items():
            if isinstance(v, dict):
                perturb(v)
            elif k == "mean":
                node[k] = rng.standard_normal(v.shape).astype(np.float32) * 0.1
            elif k == "var":
                node[k] = (1.0 + 0.3 * rng.random(v.shape)).astype(np.float32)

    perturb(stats)
    return TFSWAUNet(**SMALL), variables


def test_state_dict_round_trip(model_and_vars):
    """flax -> torch names -> flax must be the identity (exact)."""
    _, variables = model_and_vars
    sd = variables_to_torch_state_dict(variables, SMALL["depths"])
    back = torch_state_dict_to_variables(sd, SMALL["depths"])
    flat_a = jax.tree_util.tree_leaves_with_path(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), flat_b[path])


@pytest.mark.parametrize("use_shift_mask", [False, True])
def test_mirror_matches_jax(model_and_vars, use_shift_mask):
    """The torch mirror must reproduce the JAX eval forward elementwise,
    in both mask conventions (the reference quirk and the Swin fix)."""
    from tfswa_tpu.optimization.torch_mirror import mirror_from_variables

    _, variables = model_and_vars
    model = TFSWAUNet(**SMALL, use_shift_mask=use_shift_mask)
    mirror = mirror_from_variables(
        SMALL["in_channels"], SMALL["out_channels"], variables,
        depths=SMALL["depths"], dims=SMALL["dims"],
        window_size=SMALL["window_size"], shift_size=SMALL["shift_size"],
        num_heads=SMALL["num_heads"], use_shift_mask=use_shift_mask,
    )
    rng = np.random.default_rng(0)
    probe = rng.standard_normal(SHAPE).astype(np.float32)
    jax_out = np.asarray(make_forward_fn(model, variables)(jnp.asarray(probe)))
    with torch.no_grad():
        torch_out = mirror(torch.from_numpy(probe)).numpy()
    assert np.max(np.abs(jax_out - torch_out)) < 1e-5


def test_onnx_export(model_and_vars, tmp_path):
    model, variables = model_and_vars
    path = str(tmp_path / "model.onnx")
    info = export_to_onnx(model, variables, path, input_shape=SHAPE)
    assert info["max_abs_diff_vs_jax"] < 1e-4
    size = os.path.getsize(path)
    assert size == info["bytes"]
    with open(path, "rb") as fh:
        head = fh.read(2)
    # ModelProto field 1 (ir_version, varint) — a serialized ONNX proto
    # always starts with tag byte 0x08.
    assert head[0] == 0x08


def test_torch_checkpoint_reference_loadable(model_and_vars, tmp_path):
    """The exported .pt must load into the ACTUAL reference model
    (strict name/shape agreement), when the reference repo is present."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo unavailable")
    model, variables = model_and_vars
    path = str(tmp_path / "export.pt")
    export_torch_checkpoint(model, variables, path)

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from src.models.tfswa_unet import TFSWAUNet as TorchTFSWAUNet

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    t_model = TorchTFSWAUNet(
        in_channels=ckpt["config"]["in_channels"],
        out_channels=ckpt["config"]["out_channels"],
        depths=ckpt["config"]["depths"],
        dims=ckpt["config"]["dims"],
        window_size=ckpt["config"]["window_size"],
        shift_size=ckpt["config"]["shift_size"],
        num_heads=ckpt["config"]["num_heads"],
    )
    missing, unexpected = t_model.load_state_dict(
        ckpt["model_state_dict"], strict=False
    )
    # The reference registers one unused attn_mask buffer per SWA module
    # (reference: attention.py:318-343); everything else must match.
    assert not unexpected
    assert all("attn_mask" in k for k in missing), missing

    t_model.eval()
    rng = np.random.default_rng(1)
    probe = rng.standard_normal(SHAPE).astype(np.float32)
    jax_out = np.asarray(
        make_forward_fn(model, variables)(jnp.asarray(probe)))
    with torch.no_grad():
        ref_out = t_model(torch.from_numpy(probe)).numpy()
    assert np.max(np.abs(jax_out - ref_out)) < 1e-5
