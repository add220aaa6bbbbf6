"""Optimization subsystem: StableHLO export round-trip, AOT compile,
int8 quantization quality/size, remat utilities, benchmark output shape.
(reference capabilities: export.py, quantization.py, gradient_checkpoint.py)
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfswa_tpu.models import TFSWAUNet
from tfswa_tpu.optimization import (
    CheckpointConfig,
    aot_compile,
    benchmark_model,
    benchmark_quantized_model,
    checkpoint_sequential,
    compare_models,
    estimate_activation_memory,
    export_model_info,
    export_stablehlo,
    fake_quantize_params,
    load_stablehlo,
    make_forward_fn,
    quantize_dynamic,
)

SMALL = dict(
    in_channels=2, out_channels=2, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
    window_size=4, shift_size=2, num_heads=2,
)
SHAPE = (1, 2, 32, 32)


@pytest.fixture(scope="module")
def model_and_vars():
    model = TFSWAUNet(**SMALL)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(SHAPE))
    return model, variables


def test_stablehlo_export_roundtrip(model_and_vars, tmp_path):
    model, variables = model_and_vars
    path = str(tmp_path / "model.stablehlo")
    info = export_stablehlo(model, variables, path, input_shape=SHAPE)
    assert os.path.getsize(path) == info["bytes"]
    assert info["max_abs_diff"] < 1e-4

    fn = load_stablehlo(path)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(SHAPE), jnp.float32)
    out = fn(x)
    ref = model.apply(variables, x, train=False)
    # 1e-4: the exported module and the live jit can fuse/reassociate the
    # attention einsums differently; sigmoid outputs in [0, 1] land within
    # a few 1e-5 of each other (observed max 1.8e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_savedmodel_export_roundtrip(model_and_vars, tmp_path):
    """jax2tf SavedModel interchange: loadable by plain TF, output-exact."""
    pytest.importorskip("tensorflow")
    from tfswa_tpu.optimization.export import export_savedmodel

    model, variables = model_and_vars
    out_dir = str(tmp_path / "savedmodel")
    info = export_savedmodel(model, variables, out_dir, input_shape=SHAPE)
    assert info["max_abs_diff"] < 1e-4
    assert os.path.exists(os.path.join(out_dir, "saved_model.pb"))


def test_aot_compile(model_and_vars):
    model, variables = model_and_vars
    compiled = aot_compile(model, variables, SHAPE)
    x = jnp.zeros(SHAPE, jnp.float32)
    out = compiled(x)
    assert out.shape == SHAPE


def test_quantization_quality_and_size(model_and_vars):
    model, variables = model_and_vars
    qmodel, stats = quantize_dynamic(model, variables)
    assert stats["compression_ratio"] > 3.0  # ~4x minus fp32 1-D params
    diff = compare_models(model, variables, qmodel, input_shape=SHAPE)
    # masks live in [0,1]; int8 weight error must stay small
    assert diff["mae"] < 0.02
    bench = benchmark_quantized_model(model, variables, qmodel,
                                      input_shape=SHAPE, num_iters=2)
    assert bench["fp32_ms"] > 0 and bench["int8_ms"] > 0


def test_fake_quantize_structure(model_and_vars):
    _, variables = model_and_vars
    fq = fake_quantize_params(variables["params"])
    orig_leaves = jax.tree_util.tree_leaves(variables["params"])
    fq_leaves = jax.tree_util.tree_leaves(fq)
    assert len(orig_leaves) == len(fq_leaves)
    for a, b in zip(orig_leaves, fq_leaves):
        assert np.asarray(a).shape == np.asarray(b).shape


def test_benchmark_model(model_and_vars):
    model, variables = model_and_vars
    fwd = jax.jit(make_forward_fn(model, variables))
    res = benchmark_model(fwd, input_shape=SHAPE, num_warmup=1, num_iters=2,
                          hop_length=64, sample_rate=8000)
    for key in ("ms_per_iter", "audio_sec_per_sec", "rtf"):
        assert res[key] > 0


def test_checkpoint_sequential_matches():
    fns = [lambda x: x * 2, lambda x: x + 1, lambda x: x ** 2]
    chained = checkpoint_sequential(fns, segments=2)
    x = jnp.asarray(3.0)
    assert float(chained(x)) == float((x * 2 + 1) ** 2)
    g = jax.grad(lambda v: checkpoint_sequential(fns, 2)(v))(x)
    assert np.isfinite(float(g))


def test_checkpoint_config():
    from tfswa_tpu.config import ModelConfig

    cfg = CheckpointConfig(enabled=True).apply(ModelConfig())
    assert cfg.remat is True


def test_estimate_activation_memory():
    est = estimate_activation_memory(4, 1025, 259, (32, 64, 128, 256), (2, 2, 6, 2))
    assert est["no_remat_gb"] > est["with_remat_gb"] > 0
    assert 0 < est["savings_pct"] < 100


def test_export_model_info(model_and_vars, tmp_path):
    model, variables = model_and_vars
    path = str(tmp_path / "info.json")
    info = export_model_info(model, variables, path)
    assert os.path.isfile(path)
    assert info["num_parameters"] == TFSWAUNet.count_parameters(variables["params"])
    assert "stem_conv" in info["modules"]


def test_fold_batch_norms_exact(model_and_vars):
    """BN folding (optimize_for_inference) must be output-exact: the folded
    convs + identity BNs reproduce the eval-mode forward.  Perturbed BN
    stats make the test meaningful (init stats are already 0/1)."""
    from tfswa_tpu.optimization.export import fold_batch_norms, optimize_for_inference

    model, variables = model_and_vars
    rng = np.random.default_rng(0)
    # randomize batch_stats + BN affine so folding has real work to do
    def perturb(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        arr = np.asarray(leaf)
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 2.0, arr.shape), jnp.float32)
        if name == "mean":
            return jnp.asarray(rng.standard_normal(arr.shape) * 0.3, jnp.float32)
        return leaf
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree_util.tree_map_with_path(
            perturb, variables["batch_stats"]),
    }
    x = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    want = model.apply(variables, x, train=False)

    folded = fold_batch_norms(variables)
    got = model.apply(folded, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)

    # every BN is now an exact identity
    for leaf_path, leaf in jax.tree_util.tree_leaves_with_path(
            folded["batch_stats"]):
        name = leaf_path[-1].key
        val = np.asarray(leaf)
        if name == "mean":
            assert np.allclose(val, 0.0)
        if name == "var":
            assert np.allclose(val, 1.0)

    fwd, folded2 = optimize_for_inference(model, variables)
    np.testing.assert_allclose(np.asarray(fwd(x)), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
