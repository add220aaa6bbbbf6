"""Train state, optimizer, and the jit-compiled train/eval steps.

Replaces the reference's imperative loop body (reference: trainer.py:120-257)
with one pure function compiled end-to-end: STFT -> model -> masks -> loss ->
grad -> clip -> AdamW -> BN-stats update all fuse into a single XLA program,
with bf16 compute replacing AMP/GradScaler (no loss scaling needed in bf16;
reference: trainer.py:98-101,209-220).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..models import TFSWAUNet
from ..ops.masking import apply_magnitude_masks
from ..ops.stft import STFTProcessor
from .losses import multi_resolution_stft_loss, source_separation_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_learning_rate_schedule(cfg: Config, steps_per_epoch: int) -> optax.Schedule:
    """Per-step cosine decay to lr_min over the whole run, optional warmup
    (reference: scripts/train.py:251-262 CosineAnnealingLR stepped per batch)."""
    total = cfg.train.max_epochs * steps_per_epoch
    lr, lr_min = cfg.train.learning_rate, cfg.train.lr_min
    cosine = optax.cosine_decay_schedule(
        init_value=lr, decay_steps=max(total - cfg.train.warmup_steps, 1),
        alpha=lr_min / lr,
    )
    if cfg.train.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, lr, cfg.train.warmup_steps)
        return optax.join_schedules([warmup, cosine], [cfg.train.warmup_steps])
    return cosine


def make_optimizer(cfg: Config, steps_per_epoch: int) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """clip-by-global-norm(1.0) -> AdamW(wd 1e-4) with cosine schedule
    (reference: scripts/train.py:251-262, trainer.py:213-219)."""
    schedule = make_learning_rate_schedule(cfg, steps_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.train.gradient_clip_val),
        optax.adamw(
            learning_rate=schedule,
            b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=cfg.train.weight_decay,
        ),
    )
    return tx, schedule


def create_train_state(
    cfg: Config,
    rng: jax.Array,
    sample_input_shape: Tuple[int, ...],
    steps_per_epoch: int = 1000,
    mesh=None,
) -> Tuple[TFSWAUNet, TrainState]:
    """Init model + optimizer; optionally place everything on a mesh.

    With a mesh the model carries bn_axis_name="data" so the shard_mapped
    train step (make_sharded_train_step) keeps BatchNorm statistics global.
    """
    model = TFSWAUNet.from_config(cfg.model)
    if mesh is not None:
        model = model.clone(bn_axis_name="data")
    variables = model.init(rng, jnp.zeros(sample_input_shape, jnp.float32))
    tx, _ = make_optimizer(cfg, steps_per_epoch)
    params, batch_stats = variables["params"], variables["batch_stats"]
    if mesh is not None:
        from ..parallel.sharding import shard_variables

        params = shard_variables({"params": params}, mesh)["params"]
        batch_stats = shard_variables({"batch_stats": batch_stats}, mesh)["batch_stats"]
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        tx=tx,
    )
    return model, state


def _crop_nyquist(spec: jnp.ndarray) -> jnp.ndarray:
    """Drop the odd Nyquist row of an (..., F, T) spectrogram (1025 -> 1024
    at the flagship STFT).  TPU shape policy: the odd bin forces a ragged
    ninth 128-lane tile on every stage-1 score matmul (measured 8-9% slower
    than the clean power-of-two at identical row counts); the Nyquist bin of
    44.1 kHz audio is noise-floor energy, so training without it is
    quality-neutral.  Gated by train.freq_policy="crop_pow2" (default
    "full" = reference-exact 1025)."""
    return spec[..., :-1, :] if spec.shape[-2] % 2 == 1 else spec


def make_train_step(
    model: TFSWAUNet,
    stft_processor: STFTProcessor,
    stems: Tuple[str, ...],
    l1_weight: float = 1.0,
    mrstft_weight: float = 0.5,
    use_mrstft: bool = False,
    spec_augment=None,
    rng_seed: int = 0,
    mask_mode: str = "parity",
    freq_policy: str = "full",
    data_axis: Optional[str] = None,
) -> Callable:
    """Build the jitted train step.

    Pipeline parity with Trainer.train_epoch (reference: trainer.py:129-224):
    stereo STFT -> mono complex mean -> magnitude; model on stereo [re, im];
    per-stem sigmoid(|re,im|) masks on mono magnitude; L1 vs mono target
    magnitudes; clip + AdamW + per-step schedule.  mask_mode="direct"
    replaces the parity double-sigmoid mask with the sigmoid head channels
    used directly (see ops/masking.apply_magnitude_masks).

    Per-step randomness (dropout, spec-augment) is derived from state.step
    via fold_in — deterministic, resume-stable, and no extra step argument.

    ``data_axis``: name of the MANUAL mesh axis when this step runs inside
    shard_map (use make_sharded_train_step) — gradients and losses pmean
    across it, and the model must carry bn_axis_name=data_axis so BN
    statistics stay global.  None (default) = single device or plain GSPMD.
    """
    n_stems = len(stems)
    use_dropout = getattr(model, "dropout", 0.0) > 0.0
    if data_axis is not None and getattr(model, "bn_axis_name", None) != data_axis:
        raise ValueError(
            f"data_axis={data_axis!r} needs the model built with "
            f"bn_axis_name={data_axis!r} (got "
            f"{getattr(model, 'bn_axis_name', None)!r}) so BatchNorm "
            "statistics reduce over the global batch"
        )

    def train_step(state: TrainState, mixtures: jnp.ndarray, targets: Dict[str, jnp.ndarray]):
        step_rng = jax.random.fold_in(jax.random.PRNGKey(rng_seed), state.step)
        spec_key, dropout_key = jax.random.split(step_rng)
        # STFT outside the grad closure: no gradient flows through analysis
        mixture_spec = stft_processor.stft(mixtures)           # (B, 2, F, T) c64
        if freq_policy == "crop_pow2":
            mixture_spec = _crop_nyquist(mixture_spec)
        mono = jnp.mean(mixture_spec, axis=1)
        mixture_mag = jnp.abs(mono)                            # (B, F, T)
        mixture_phase = jnp.angle(mono) if use_mrstft else None
        target_mags = {
            k: jnp.abs(jnp.mean(stft_processor.stft(v), axis=1))
            for k, v in targets.items()
        }
        if freq_policy == "crop_pow2":
            target_mags = {k: _crop_nyquist(v) for k, v in target_mags.items()}
        model_input = stft_processor.to_model_input(mixture_spec)
        if spec_augment is not None:
            # masks the model INPUT only; targets stay clean
            model_input = spec_augment(spec_key, model_input)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                model_input, train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_key} if use_dropout else None,
            )
            pred = apply_magnitude_masks(out, mixture_mag, n_stems, mask_mode)
            pred_mags = {k: pred[:, i] for i, k in enumerate(stems)}
            pred_audios = target_audios = None
            if use_mrstft:
                def _stem_audio(k):
                    pm = pred_mags[k] * jnp.exp(1j * mixture_phase)
                    if freq_policy == "crop_pow2":
                        # zero Nyquist row back for the 1025-bin ISTFT
                        pm = jnp.pad(pm, ((0, 0), (0, 1), (0, 0)))
                    return stft_processor.istft(
                        pm, length=mixtures.shape[-1]
                    )[:, None, :]

                pred_audios = {k: _stem_audio(k) for k in stems}
                target_audios = {k: targets[k].mean(axis=1, keepdims=True) for k in stems}
            loss_dict = source_separation_loss(
                pred_mags, target_mags, pred_audios, target_audios,
                l1_weight=l1_weight, mrstft_weight=mrstft_weight,
                use_mrstft=use_mrstft,
            )
            return loss_dict["total_loss"], (loss_dict, updates["batch_stats"])

        grads, (loss_dict, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        if data_axis is not None:
            # Under shard_map's vma semantics, jax.grad of the LOCAL loss
            # w.r.t. replicated params already returns the cross-device
            # psum (the transpose of the implicit pbroadcast) — i.e. the
            # gradient of the SUM of per-device losses, replicated on every
            # device.  The global-mean-loss gradient is that divided by the
            # axis size (a plain pmean here would be a no-op on the
            # already-replicated sum and leave grads d-times too large —
            # caught by the dp/tp equivalence tests, round 5).  This psum
            # is also the dp path's only cross-chip traffic; BN statistics
            # were already synced in-forward via bn_axis_name.
            d = jax.lax.psum(1, data_axis)
            grads = jax.tree_util.tree_map(lambda g: g / d, grads)
            # per-device loss scalars are genuinely varying: pmean them
            loss_dict = {
                k: jax.lax.pmean(v, data_axis) for k, v in loss_dict.items()
            }
        new_state = state.apply_gradients(grads, new_bs)
        loss_dict = {k: v.astype(jnp.float32) for k, v in loss_dict.items()}
        loss_dict["grad_norm"] = optax.global_norm(grads)
        return new_state, loss_dict

    return train_step


def make_sharded_train_step(
    model: TFSWAUNet,
    stft_processor: STFTProcessor,
    stems: Tuple[str, ...],
    mesh,
    **kwargs,
) -> Callable:
    """Data-parallel train step via shard_map: MANUAL over the 'data' axis
    (each chip computes its own batch shard end to end — collective-free
    except the explicit gradient pmean), GSPMD-auto over 'model' (Megatron
    TP).  Plain GSPMD batch sharding was measured NOT to scale the chunked
    attention stages: it all-gathers the rows entering every lax.map chunk
    loop, so every chip recomputed the full batch (caught by
    tools/bench_mesh_scaling.py, round 5).

    The model must be built with bn_axis_name="data"
    (create_train_state(mesh=...) does this).  Wrap the result in jax.jit.
    """
    from jax.sharding import PartitionSpec as P

    inner = make_train_step(
        model, stft_processor, stems, data_axis="data", **kwargs
    )
    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P()),
        axis_names={"data"},
    )


def make_eval_step(
    model: TFSWAUNet,
    stft_processor: STFTProcessor,
    stems: Tuple[str, ...],
    l1_weight: float = 1.0,
    mask_mode: str = "parity",
    freq_policy: str = "full",
    data_axis: Optional[str] = None,
) -> Callable:
    """Validation loss step (reference: trainer.py:453-523): same mask
    pipeline, eval-mode BN, no grads.  ``data_axis``: see make_train_step."""
    n_stems = len(stems)

    def eval_step(state: TrainState, mixtures, targets):
        mixture_spec = stft_processor.stft(mixtures)
        if freq_policy == "crop_pow2":
            mixture_spec = _crop_nyquist(mixture_spec)
        mono = jnp.mean(mixture_spec, axis=1)
        mixture_mag = jnp.abs(mono)
        target_mags = {
            k: jnp.abs(jnp.mean(stft_processor.stft(v), axis=1))
            for k, v in targets.items()
        }
        if freq_policy == "crop_pow2":
            target_mags = {k: _crop_nyquist(v) for k, v in target_mags.items()}
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            stft_processor.to_model_input(mixture_spec), train=False,
        )
        pred = apply_magnitude_masks(out, mixture_mag, n_stems, mask_mode)
        pred_mags = {k: pred[:, i] for i, k in enumerate(stems)}
        loss_dict = source_separation_loss(
            pred_mags, target_mags, l1_weight=l1_weight, use_mrstft=False
        )
        if data_axis is not None:
            loss_dict = {
                k: jax.lax.pmean(v, data_axis) for k, v in loss_dict.items()
            }
        return {k: v.astype(jnp.float32) for k, v in loss_dict.items()}

    return eval_step


def make_sharded_eval_step(
    model: TFSWAUNet,
    stft_processor: STFTProcessor,
    stems: Tuple[str, ...],
    mesh,
    **kwargs,
) -> Callable:
    """Validation step via shard_map over 'data' (see
    make_sharded_train_step for why plain GSPMD does not scale here).
    Eval-mode BN reads running stats, so no axis sync is involved — only
    the scalar losses pmean."""
    from jax.sharding import PartitionSpec as P

    inner = make_eval_step(
        model, stft_processor, stems, data_axis="data", **kwargs
    )
    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P(),
        axis_names={"data"},
    )
