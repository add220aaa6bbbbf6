"""Trainer: the full training loop (reference: trainer.py:22-655), TPU-native.

Differences from the reference by design:
  - the hot path is one jitted train step (see train_state.py) fed by a
    threaded loader with device prefetch, instead of an imperative per-batch
    Python pipeline;
  - bf16 compute replaces AMP/GradScaler;
  - augmentation (wired!) runs device-side under jit;
  - checkpoints are orbax trees with the reference's epoch/best/latest
    semantics;
  - metrics go to JSONL always, TensorBoard when available
    (reference: trainer.py:90 SummaryWriter).

Matched behaviours: loss pipeline (mono-magnitude trainer masks), per-step
cosine schedule, clip 1.0, SDR eval cadence (first validation then every
5th, first N val tracks; reference: trainer.py:607-609), best-model
selection by -avg_SDR when evaluated else val loss
(reference: trainer.py:624-641).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.augment import build_augmentations
from ..data.pipeline import DataLoader, prefetch_to_device
from ..evaluation.inference import SourceSeparator
from ..evaluation.metrics import sdr as sdr_metric, si_sdr as si_sdr_metric
from ..ops.stft import STFTProcessor
from ..utils.profiling import StepTimer, device_memory_report
from .checkpointing import CheckpointManager
from .train_state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)


class MetricLogger:
    """JSONL metric stream + optional TensorBoard."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._fh = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def log(self, tag_values: Dict[str, float], step: int) -> None:
        rec = {"step": step, "time": time.time(), **tag_values}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in tag_values.items():
                self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


class _NullLogger:
    """Metric sink for non-zero processes under multi-host training."""

    def log(self, tag_values, step) -> None:
        pass

    def close(self) -> None:
        pass


class Trainer:
    """End-to-end training owner (reference: trainer.py:22-118 ctor)."""

    def __init__(
        self,
        config: Config,
        train_dataset,
        val_dataset=None,
        mesh=None,
        state: Optional[TrainState] = None,
        model=None,
    ):
        self.config = config
        self.stems = tuple(config.data.stems)
        self.stft_processor = STFTProcessor(config.stft)
        self.mesh = mesh

        segment_samples = int(config.data.segment_seconds * config.data.sample_rate)
        F = config.stft.n_fft // 2 + 1
        T = segment_samples // config.stft.hop_length + 1

        # multi-host: each process loads only its contiguous slice of every
        # global batch (identical shuffle order on all processes —
        # parallel/distributed.py).  Single-process: 1 shard, unchanged.
        shard_index, num_shards = jax.process_index(), jax.process_count()
        self.train_loader = DataLoader(
            train_dataset,
            batch_size=config.data.batch_size,
            shuffle=True,
            num_workers=config.data.num_workers,
            seed=config.train.seed,
            num_shards=num_shards,
            shard_index=shard_index,
        )
        self.val_loader = (
            DataLoader(
                val_dataset,
                batch_size=config.data.batch_size,
                shuffle=False,
                num_workers=config.data.num_workers,
                drop_last=False,
                num_shards=num_shards,
                shard_index=shard_index,
            )
            if val_dataset is not None
            else None
        )
        self.val_dataset = val_dataset

        steps_per_epoch = config.train.steps_per_epoch or max(
            1, len(self.train_loader)
        )
        self.steps_per_epoch = steps_per_epoch

        if config.model.attention_impl == "int8":
            # int8 is a serving path: gradients through the quantization
            # rounding are zero, so the quantized matmuls' weights would
            # silently never train (ADVICE.md round 2).
            raise ValueError(
                "attention_impl='int8' is inference-only — rounding has "
                "zero gradient, so training would not learn.  Train with "
                "'pallas' or 'xla' and quantize the result "
                "(optimization/quantization.py)."
            )

        if state is None or model is None:
            model, state = create_train_state(
                config,
                jax.random.PRNGKey(config.train.seed),
                (1, config.model.in_channels, F, T),
                steps_per_epoch=steps_per_epoch,
                mesh=mesh,
            )
        self.model = model
        self.state = state

        self.audio_aug, self.mixup, self.spec_aug = build_augmentations(
            config.data, self.stft_processor
        )

        train_step_kw = dict(
            l1_weight=config.train.l1_weight,
            mrstft_weight=config.train.mrstft_weight,
            use_mrstft=config.train.use_mrstft_loss,
            spec_augment=self.spec_aug,
            rng_seed=config.train.seed + 2,
            mask_mode=config.train.train_mask_mode,
            freq_policy=config.train.freq_policy,
        )
        eval_step_kw = dict(
            mask_mode=config.train.train_mask_mode,
            freq_policy=config.train.freq_policy,
        )
        if mesh is not None:
            # shard_map over 'data': each chip computes its own batch shard
            # (collective-free forward; explicit gradient pmean + synced BN)
            # — plain GSPMD sharding does NOT scale the chunked attention
            # stages (see make_sharded_train_step).
            from .train_state import make_sharded_eval_step, make_sharded_train_step

            self._train_step = jax.jit(
                make_sharded_train_step(
                    model, self.stft_processor, self.stems, mesh,
                    **train_step_kw,
                ),
                donate_argnums=(0,),
            )
            self._eval_step = jax.jit(
                make_sharded_eval_step(
                    model, self.stft_processor, self.stems, mesh,
                    **eval_step_kw,
                )
            )
        else:
            self._train_step = jax.jit(
                make_train_step(
                    model, self.stft_processor, self.stems, **train_step_kw
                ),
                donate_argnums=(0,),
            )
            self._eval_step = jax.jit(
                make_eval_step(
                    model, self.stft_processor, self.stems, **eval_step_kw
                )
            )
        if self.audio_aug is not None or self.mixup is not None:
            self._augment = jax.jit(self._augment_impl)
        self._aug_rng = jax.random.PRNGKey(config.train.seed + 1)

        # multi-host: process 0 owns checkpoint/metric writes (pure-dp
        # params are replicated, i.e. fully host-addressable everywhere)
        self._is_main_process = shard_index == 0
        self.ckpt = (
            CheckpointManager(
                config.train.checkpoint_dir, config=config,
                keep=config.train.keep_checkpoints,
            )
            if self._is_main_process else None
        )
        self.logger = (
            MetricLogger(config.train.log_dir)
            if self._is_main_process else _NullLogger()
        )

        self.current_epoch = 0
        self.global_step = 0
        self.best_val_loss = float("inf")
        self.best_metric = float("inf")
        self._sdr_eval_count = 0
        # hoisted SDR separator: created once, only `variables` refreshed per
        # eval — rebuilding it would re-jit the full forward every 5th
        # validation (round-1 weakness)
        self._sdr_separator: Optional[SourceSeparator] = None
        self._step_timer: Optional[StepTimer] = None

        if mesh is not None:
            from ..parallel.sharding import batch_sharding

            self._batch_sharding = batch_sharding(mesh)
        else:
            self._batch_sharding = None

    # ----------------------------------------------------------- internals
    def _augment_impl(self, rng, mixtures, targets):
        k1, k2 = jax.random.split(rng)
        if self.audio_aug is not None:
            mixtures, targets = self.audio_aug(k1, mixtures, targets)
        if self.mixup is not None:
            mixtures, targets = self.mixup(k2, mixtures, targets)
        return mixtures, targets

    def _device_batches(self, loader: Iterable):
        return prefetch_to_device(
            iter(loader), size=self.config.data.prefetch,
            sharding=self._batch_sharding,
        )

    # -------------------------------------------------------------- epochs
    def _epoch_batches(self):
        """Exactly ``steps_per_epoch`` batches per epoch: when
        train.steps_per_epoch overrides the dataset-derived length, the
        loader is cycled (fresh random segments each pass) so epoch size is
        a real training knob rather than only a schedule input."""
        done = 0
        while done < self.steps_per_epoch:
            yielded_this_pass = 0
            for batch in self._device_batches(self.train_loader):
                yield batch
                done += 1
                yielded_this_pass += 1
                if done >= self.steps_per_epoch:
                    return
            if yielded_this_pass == 0:
                # Empty loader OR a one-shot iterable exhausted on a prior
                # pass — either way another pass cannot make progress.
                return

    def train_epoch(self) -> Dict[str, float]:
        """(reference: trainer.py:120-257)"""
        sums: Dict[str, float] = {}
        count = 0
        t0 = time.time()
        for mixtures, targets in self._epoch_batches():
            if self.audio_aug is not None or self.mixup is not None:
                self._aug_rng, key = jax.random.split(self._aug_rng)
                mixtures, targets = self._augment(key, mixtures, targets)
            if self._step_timer is None:
                self._step_timer = StepTimer(
                    flops_per_step=self._train_step_flops(mixtures, targets),
                    items_per_step=int(mixtures.shape[0]),
                )
            self.state, loss_dict = self._train_step(self.state, mixtures, targets)
            self._step_timer.tick()
            count += 1
            self.global_step += 1
            if self.global_step % self.config.train.log_every_n_steps == 0:
                host = {f"train/{k}": float(v) for k, v in loss_dict.items()}
                host["train/steps_per_sec"] = count / (time.time() - t0)
                for k, v in self._step_timer.metrics().items():
                    host[f"train/{k}"] = v
                self.logger.log(host, self.global_step)
            for k, v in loss_dict.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        out = {k: v / max(count, 1) for k, v in sums.items()}
        out.update(self._step_timer.metrics() if self._step_timer else {})
        mem = next(iter(device_memory_report().values()), {})
        for k, v in mem.items():
            out[f"mem/{k}"] = v
        return out

    def _train_step_flops(self, mixtures, targets) -> Optional[float]:
        """Compiler cost-analysis FLOPs of the jitted train step (for MFU).
        Uses the already-compiled executable — no extra compilation."""
        try:
            compiled = self._train_step.lower(
                self.state, mixtures, targets
            ).compile()
            analysis = compiled.cost_analysis()
            if isinstance(analysis, list):
                analysis = analysis[0]
            return float(analysis.get("flops", 0.0)) or None
        except Exception:
            return None

    def validate(self) -> Dict[str, float]:
        """(reference: trainer.py:453-523)"""
        if self.val_loader is None:
            return {}
        sums: Dict[str, float] = {}
        count = 0
        for mixtures, targets in self._device_batches(self.val_loader):
            loss_dict = self._eval_step(self.state, mixtures, targets)
            for k, v in loss_dict.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
        return {k: v / max(count, 1) for k, v in sums.items()}

    def evaluate_sdr(self) -> Dict[str, float]:
        """In-training SDR eval on the first N validation tracks
        (reference: trainer.py:259-347): full-track trainer-convention
        separation (10 s, 50% overlap), custom SDR/SI-SDR."""
        if self.val_dataset is None or not hasattr(self.val_dataset, "get_full_track"):
            return {}
        variables = {
            "params": self.state.params, "batch_stats": self.state.batch_stats
        }
        if self._sdr_separator is None:
            # separation convention follows the training mask mode so the
            # SDR eval measures what was actually trained
            sep_mode = (
                "trainer"
                if self.config.train.train_mask_mode == "parity"
                else "mag_direct"
            )
            self._sdr_separator = SourceSeparator(
                self.model,
                variables,
                self.stft_processor,
                segment_length=self.config.train.sdr_eval_segment_seconds,
                overlap=self.config.train.sdr_eval_overlap,
                mask_mode=sep_mode,
                stem_names=self.stems,
                # under mesh training the params stay sharded (TP included)
                # and the separator's jit carries matching in_shardings —
                # without this, TP-sharded params would hit an unsharded jit
                mesh=self.mesh,
            )
        else:
            # refresh weights only: variables are jit ARGUMENTS, so the
            # compiled separation pipeline is reused across evals
            self._sdr_separator.update_variables(variables)
        separator = self._sdr_separator
        n = min(
            self.config.train.sdr_eval_num_tracks,
            len(self.val_dataset.track_names),
        )
        per_stem: Dict[str, list] = {s: [] for s in self.stems}
        si_per_stem: Dict[str, list] = {s: [] for s in self.stems}
        for i in range(n):
            try:
                mixture, refs = self.val_dataset.get_full_track(i)
                ests = separator.separate(mixture)
                for s in self.stems:
                    ref = np.asarray(refs[s]).mean(axis=0)
                    est = np.asarray(ests[s])[0]
                    per_stem[s].append(float(sdr_metric(jnp.asarray(est), jnp.asarray(ref))))
                    si_per_stem[s].append(
                        float(si_sdr_metric(jnp.asarray(est), jnp.asarray(ref)))
                    )
            except Exception as exc:  # noqa: BLE001 (parity: skip bad tracks)
                import warnings

                warnings.warn(f"SDR eval failed on track {i}: {exc}")
        out = {}
        for s in self.stems:
            if per_stem[s]:
                out[f"sdr/{s}"] = float(np.mean(per_stem[s]))
                out[f"si_sdr/{s}"] = float(np.mean(si_per_stem[s]))
        if out:
            out["sdr/avg"] = float(
                np.mean([out[f"sdr/{s}"] for s in self.stems if f"sdr/{s}" in out])
            )
        return out

    # ----------------------------------------------------------------- run
    def train(self) -> Dict[str, float]:
        """Epoch loop with validation, SDR cadence, checkpointing
        (reference: trainer.py:575-655)."""
        cfg = self.config.train
        final_metrics: Dict[str, float] = {}
        val_count = 0
        for epoch in range(self.current_epoch, cfg.max_epochs):
            self.current_epoch = epoch
            train_metrics = self.train_epoch()
            self.logger.log(
                {f"epoch_train/{k}": v for k, v in train_metrics.items()},
                self.global_step,
            )
            final_metrics = train_metrics

            metric_for_best = None
            if self.val_loader is not None and (
                (epoch + 1) % cfg.val_every_n_epochs == 0
            ):
                val_count += 1
                val_metrics = self.validate()
                self.logger.log(
                    {f"val/{k}": v for k, v in val_metrics.items()}, self.global_step
                )
                metric_for_best = val_metrics.get("total_loss")
                # cadence: first validation, then every 5th
                # (reference: trainer.py:607-609)
                if val_count == 1 or val_count % 5 == 0:
                    sdr_metrics = self.evaluate_sdr()
                    if sdr_metrics:
                        self.logger.log(sdr_metrics, self.global_step)
                        # best by negative avg SDR (reference: trainer.py:624-641)
                        metric_for_best = -sdr_metrics.get(
                            "sdr/avg", -metric_for_best if metric_for_best else 0.0
                        )

            is_best = False
            if metric_for_best is not None and metric_for_best < self.best_metric:
                self.best_metric = metric_for_best
                is_best = True
            if self.ckpt is None:   # non-zero process under multi-host
                continue
            self.ckpt.save(
                self.state,
                epoch=epoch,
                global_step=self.global_step,
                best_val_loss=self.best_metric,
                is_best=is_best,
            )
        self.logger.close()
        return final_metrics

    # -------------------------------------------------------------- resume
    def load_checkpoint(self, which: str = "latest") -> None:
        """(reference: trainer.py:556-573)"""
        if self.ckpt is None:
            # non-zero multi-host process: restore through a read-only
            # manager (every process must load the same replicated weights)
            self.ckpt = CheckpointManager(
                self.config.train.checkpoint_dir, config=None,
                keep=self.config.train.keep_checkpoints,
            )
            tree, meta = self.ckpt.restore(which, state=self.state)
            self.ckpt = None
        else:
            tree, meta = self.ckpt.restore(which, state=self.state)
        self.state = self.state.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            step=jnp.asarray(meta.get("global_step", 0), jnp.int32),
        )
        self.current_epoch = int(meta.get("epoch", -1)) + 1
        self.global_step = int(meta.get("global_step", 0))
        self.best_metric = float(meta.get("best_val_loss", float("inf")))
