"""Model-level invariants mirroring the reference's canonical tests
(reference: test_model.py:6-130): parameter count, output shape/range,
gradient flow; plus TPU-specific invariants the reference lacks.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: full-model forwards on CPU

import jax
import jax.numpy as jnp

from tfswa_tpu.models import TFSWAUNet

SMALL = dict(
    in_channels=2, out_channels=2, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
    window_size=4, shift_size=2, num_heads=2,
)


@pytest.fixture(scope="module")
def small_model_and_vars():
    model = TFSWAUNet(**SMALL)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 32, 32)))
    return model, variables


def test_param_count_parity():
    """Stock config must hit the published 15,404,834
    (reference: test_model.py:13-21, README.md:186)."""
    model = TFSWAUNet(in_channels=2, out_channels=2)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16)))
    assert TFSWAUNet.count_parameters(v["params"]) == 15404834


def test_forward_shape_and_range(small_model_and_vars):
    model, variables = small_model_and_vars
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 2, 64, 48)),
                    jnp.float32)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 2, 64, 48)
    y = np.asarray(y)
    assert y.min() >= 0.0 and y.max() <= 1.0  # sigmoid head


def test_odd_shapes(small_model_and_vars):
    """Odd (H, W) exercise SWA padding + decoder bilinear fix-ups
    (reference: attention.py:358-362, tfswa_unet.py:210-216)."""
    model, variables = small_model_and_vars
    x = jnp.zeros((1, 2, 65, 33))
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 2, 65, 33)


def test_gradient_flow(small_model_and_vars):
    """Every parameter receives a gradient (reference: test_model.py grad test)."""
    model, variables = small_model_and_vars
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 2, 32, 32)),
                    jnp.float32)

    def loss_fn(params):
        y, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(y ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    zero_grads = [
        jax.tree_util.keystr(path)
        for path, g in flat
        if float(jnp.max(jnp.abs(g))) == 0.0
    ]
    assert not zero_grads, f"params with zero grad: {zero_grads[:10]}"


def test_jit_and_batch_stats_update(small_model_and_vars):
    model, variables = small_model_and_vars

    @jax.jit
    def step(variables, x):
        return model.apply(variables, x, train=True, mutable=["batch_stats"])

    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 2, 32, 32)),
                    jnp.float32)
    y, updates = step(variables, x)
    before = variables["batch_stats"]["stem_bn"]["mean"]
    after = updates["batch_stats"]["stem_bn"]["mean"]
    assert float(jnp.max(jnp.abs(after - before))) > 0.0


def test_bfloat16_forward(small_model_and_vars):
    _, variables = small_model_and_vars
    model = TFSWAUNet(**SMALL, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 2, 32, 32)),
                    jnp.float32)
    y = model.apply(variables, x, train=False)
    assert y.dtype == jnp.float32  # head casts back to f32 for the sigmoid mask
    assert np.isfinite(np.asarray(y)).all()


def test_remat_matches(small_model_and_vars):
    _, variables = small_model_and_vars
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 2, 32, 32)),
                    jnp.float32)
    base = TFSWAUNet(**SMALL).apply(variables, x, train=False)
    remat = TFSWAUNet(**SMALL, remat=True).apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(base), np.asarray(remat), atol=1e-6)


def test_shift_mask_mode():
    """use_shift_mask=True is a documented deviation: valid outputs that
    differ from the parity default on a *shifted* window block (depth-1
    stages only instantiate shift=0 blocks, so test the module directly)."""
    from tfswa_tpu.models import ShiftedWindowAttention

    x = jnp.asarray(np.random.default_rng(5).standard_normal((1, 16, 16, 8)),
                    jnp.float32)
    base_mod = ShiftedWindowAttention(dim=8, window_size=4, num_heads=2,
                                      shift_size=2)
    variables = base_mod.init(jax.random.PRNGKey(0), x)
    base = base_mod.apply(variables, x)
    masked_mod = ShiftedWindowAttention(dim=8, window_size=4, num_heads=2,
                                        shift_size=2, use_shift_mask=True)
    masked = masked_mod.apply(variables, x)
    assert np.isfinite(np.asarray(masked)).all()
    assert float(jnp.max(jnp.abs(masked - base))) > 0.0


def test_model_info(small_model_and_vars):
    model, variables = small_model_and_vars
    info = model.get_model_info(variables["params"])
    assert info["num_parameters"] == TFSWAUNet.count_parameters(variables["params"])
    assert info["depths"] == [1, 1, 1, 1]
