"""Multi-chip scaling accounting (VERDICT round-4 top item): per-device
FLOPs from cost analysis, collective bytes from partitioned HLO, and the
structural assertions the scaling projection rests on — the serving forward
is collective-free and per-device work scales ~1/d.

tools/bench_mesh_scaling.py runs the same assertions at the flagship 15.4M
config; these tests pin them at CPU-quick shapes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfswa_tpu.parallel import (
    analyze_jitted,
    collective_stats,
    compiled_flops,
    create_mesh,
    ring_all_reduce_link_bytes,
    shard_batch,
    shard_variables,
)

SR = 8000


# ------------------------------------------------------------- HLO parsing
def test_collective_stats_parses_hlo_text():
    hlo = """
  %add (a: f32[], b: f32[]) -> f32[] { ... }
  %all-reduce.1 = f32[64,256]{1,0} all-reduce(f32[64,256]{1,0} %p0), replica_groups={}, to_apply=%add
  %ag = bf16[8,128]{1,0} all-gather(bf16[4,128]{1,0} %p1), dimensions={0}
  %normal = f32[2,2]{1,0} add(f32[2,2]{1,0} %x, f32[2,2]{1,0} %y)
"""
    stats = collective_stats(hlo)
    assert stats.counts == {"all-reduce": 1, "all-gather": 1}
    assert stats.bytes["all-reduce"] == 64 * 256 * 4
    assert stats.bytes["all-gather"] == 8 * 128 * 2
    assert stats.total_count == 2


def test_collective_stats_ignores_plain_ops():
    assert collective_stats(
        "%x = f32[4]{0} add(f32[4]{0} %a, f32[4]{0} %b)"
    ).total_count == 0


def test_ring_all_reduce_link_bytes():
    assert ring_all_reduce_link_bytes(100, 1) == 0.0
    assert ring_all_reduce_link_bytes(100, 2) == 100.0
    assert ring_all_reduce_link_bytes(100, 8) == pytest.approx(175.0)


# -------------------------------------------------- real compiled programs
def test_sharded_reduction_emits_all_reduce():
    """A cross-device reduction must show up in the collective accounting."""
    mesh = create_mesh(shape=(4, 1), devices=jax.devices()[:4])
    x = shard_batch(jnp.ones((8, 16), jnp.float32), mesh)
    flops, stats, _ = analyze_jitted(jax.jit(lambda v: jnp.sum(v)), x)
    assert stats.total_count >= 1
    assert any("all-reduce" in op or "all-gather" in op
               for op in stats.counts)


def test_batch_sharded_elementwise_is_collective_free():
    mesh = create_mesh(shape=(4, 1), devices=jax.devices()[:4])
    x = shard_batch(jnp.ones((8, 16), jnp.float32), mesh)
    from jax.sharding import NamedSharding, PartitionSpec

    f = jax.jit(lambda v: v * 2 + 1,
                out_shardings=NamedSharding(mesh, PartitionSpec("data")))
    _, stats, _ = analyze_jitted(f, x)
    assert stats.total_count == 0


# ------------------------------------------- model-level scaling structure
def _small_separator(dp: int, batch: int = 8):
    from tfswa_tpu.config import STFTConfig
    from tfswa_tpu.evaluation.inference import SourceSeparator
    from tfswa_tpu.models import TFSWAUNet
    from tfswa_tpu.ops.stft import STFTProcessor

    mesh = create_mesh(shape=(dp, 1), devices=jax.devices()[:dp])
    model = TFSWAUNet(
        in_channels=4, out_channels=4, depths=(1, 1, 1, 1),
        dims=(8, 16, 32, 64), window_size=4, shift_size=2, num_heads=2,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 129, 20), jnp.float32)
    )
    proc = STFTProcessor(STFTConfig(n_fft=256, hop_length=64, sample_rate=SR))
    return SourceSeparator(
        model, variables, proc, segment_length=1.0, mask_mode="trainer",
        segment_batch=batch, mesh=mesh,
    )


def test_serving_forward_collective_free_and_work_splits():
    """The sharded separator forward must stay embarrassingly parallel:
    zero collectives at any dp, per-device FLOPs ~1/d of dp=1."""
    flops = {}
    for dp in (1, 2, 4):
        sep = _small_separator(dp)
        block = jnp.zeros((8, sep.segment_samples), sep.transfer_dtype)
        f, stats, _ = analyze_jitted(sep._jit_separate, sep.variables, block)
        assert stats.total_count == 0, (
            f"dp={dp} serving forward has collectives: {stats.counts}"
        )
        flops[dp] = f
    assert flops[2] / flops[1] == pytest.approx(0.5, rel=0.05)
    assert flops[4] / flops[1] == pytest.approx(0.25, rel=0.05)


def test_train_step_work_splits_and_grad_allreduce_present():
    """The dp train step must split compute ~1/d and carry the gradient
    all-reduce (the only cross-chip traffic of pure data parallelism)."""
    from tfswa_tpu.config import Config, DataConfig, ModelConfig, STFTConfig
    from tfswa_tpu.ops.stft import STFTProcessor
    from tfswa_tpu.training import create_train_state, make_sharded_train_step

    cfg = Config(
        model=ModelConfig(
            in_channels=4, out_channels=4, depths=(1, 1, 1, 1),
            dims=(8, 16, 32, 64), window_size=4, shift_size=2, num_heads=2,
        ),
        stft=STFTConfig(n_fft=256, hop_length=64, sample_rate=SR),
        data=DataConfig(sample_rate=SR),
    )
    proc = STFTProcessor(cfg.stft)
    samples = 2048
    F, T = 129, samples // 64 + 1
    stems = ("vocals", "other")
    rng = np.random.default_rng(0)

    results = {}
    n_params = None
    for dp in (1, 2, 4):
        mesh = create_mesh(shape=(dp, 1), devices=jax.devices()[:dp])
        model, state = create_train_state(
            cfg, jax.random.PRNGKey(0), (1, 4, F, T), steps_per_epoch=10,
            mesh=mesh,
        )
        n_params = sum(
            int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(state.params)
        )
        mixtures = shard_batch(
            jnp.asarray(rng.standard_normal((8, 2, samples)), jnp.float32),
            mesh,
        )
        targets = {
            s: shard_batch(
                jnp.asarray(
                    rng.standard_normal((8, 2, samples)), jnp.float32),
                mesh,
            )
            for s in stems
        }
        step = jax.jit(make_sharded_train_step(model, proc, stems, mesh))
        f, stats, _ = analyze_jitted(step, state, mixtures, targets)
        results[dp] = (f, stats)

    f1, stats1 = results[1]
    for dp in (2, 4):
        f, stats = results[dp]
        # The batch compute splits 1/d; a dp-INDEPENDENT term (the
        # replicated optimizer update + grad norms, ~0.4 GF at this size)
        # rides on top.  Assert the fraction of work eliminated is >= 90%
        # of ideal — robust to the constant, still catches the GSPMD
        # failure mode (no split at all: eliminated fraction ~0).
        eliminated = (f1 - f) / f1
        ideal = 1.0 - 1.0 / dp
        assert eliminated >= 0.9 * ideal, (
            f"dp={dp}: per-device train work only dropped "
            f"{eliminated:.3f} (ideal {ideal:.3f}) — the chunked stages "
            "are not splitting"
        )
        # the gradient sync is present and sized at least the f32 param
        # payload (plus the handful of BN mean/var pmeans)
        assert stats.total_count >= 1, f"dp={dp}: no gradient collective"
        assert stats.total_bytes >= 4 * n_params, (
            f"dp={dp}: collective payload {stats.total_bytes} < gradient "
            f"size {4 * n_params}"
        )
