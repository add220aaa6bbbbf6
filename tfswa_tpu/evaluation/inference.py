"""Full-track source separation with overlap-add (reference: inference.py).

TPU-native redesign of the reference's one-segment-at-a-time loop
(reference: inference.py:159-225):
  - the per-segment pipeline (STFT -> model -> mask -> ISTFT) is one jitted
    function with a static segment length, compiled once per track length
    class;
  - segments are processed in device batches (``segment_batch``) so the MXU
    sees large batched matmuls instead of B=1 dribbles;
  - the Hann-windowed overlap-add accumulation runs on host over small audio
    arrays (it is O(samples), never the bottleneck).

Both reference mask conventions are supported (see ops/masking.py).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EvalConfig, ModelConfig, STFTConfig
from ..models import TFSWAUNet
from ..ops.masking import apply_direct_masks, trainer_masked_complex
from ..ops.stft import STFTProcessor, SpectrogramNormalizer, get_window


def _hann(length: int) -> np.ndarray:
    """Periodic Hann, matching torch.hann_window (reference: inference.py:227-237)."""
    return get_window("hann", length).astype(np.float32)


# int16 transfer scaling: 4x headroom over full-scale audio (the device-OLA
# d2h carries pre-normalization Hann-weighted sums, which can slightly exceed
# the input peak), ~78 dB SNR at typical levels — far below separation SDR.
_INT16_SCALE = 8192.0


class SourceSeparator:
    """High-level separation interface (reference: inference.py:19-237).

    Parity notes:
      - input is forced mono like the reference (reference: inference.py:83-85);
      - 'direct' mask mode reproduces reference inference exactly
        (raw head channels as complex masks, reference: inference.py:139-150);
      - 'trainer' mask mode reproduces Trainer._separate_track
        (sigmoid(|re,im|) x mono magnitude x mixture phase,
        reference: trainer.py:415-436) — the convention the model was
        trained under, and therefore the default here.
    """

    def __init__(
        self,
        model: TFSWAUNet,
        variables: Dict,
        stft_processor: STFTProcessor,
        normalizer: Optional[SpectrogramNormalizer] = None,
        segment_length: float = 10.0,
        overlap: float = 0.25,
        mask_mode: str = "trainer",
        stem_names: Sequence[str] = ("vocals", "other"),
        segment_batch: int = 8,
        transfer_dtype: str = "float32",
        device_ola: bool = False,
        ola_bucket_seconds: float = 60.0,
        freq_policy: str = "full",
        mesh=None,
    ):
        self.model = model
        self.variables = variables
        self.stft_processor = stft_processor
        self.normalizer = normalizer
        self.segment_length = segment_length
        self.overlap = overlap
        self.mask_mode = mask_mode
        self.default_stems = tuple(stem_names)
        self.segment_batch = segment_batch
        # float16 halves host<->device audio traffic vs f32 (66 dB SNR, far
        # below separation noise floors); int16 is scaled PCM at the same
        # 2 bytes (what WAV files store — measured throughput-equivalent to
        # f16); "int8" halves the OUTPUT d2h again with per-stem dynamic
        # scaling (~42 dB below stem peak, three orders under stem error —
        # device-OLA path only; input audio rides f16).  float32 is the
        # parity default.  On the serialized dev tunnel the d2h bytes are
        # fully wall-exposed (f32 vs f16 measured -12-22% end to end,
        # runs/round4/f32_probe.log), so int8 output is a real lever there.
        self.int8_output = transfer_dtype == "int8"
        self.transfer_dtype = np.dtype(
            "float16" if self.int8_output else transfer_dtype)
        # device_ola: run the ENTIRE overlap-add on device — stems come back
        # as per-window accumulations.  Off by default: the host path
        # reproduces the reference's exact last-segment clamping
        # (reference: inference.py:193-196); the device path uses a uniform
        # zero-padded grid (same values except within the final partial hop).
        #
        # The track is processed as fixed windows of ``ola_window_segments``
        # consecutive segments (sized from ola_bucket_seconds) — ONE compile
        # for every track length.  Each window rides its own h2d and every
        # window call is dispatched before any fetch.  NOTE (measured,
        # BENCH.md round 4): the dev tunnel serializes transfers with
        # compute (marginal per-window wall = compute + full transfer time;
        # copy_to_host_async measured WORSE), so on that link the win comes
        # from fewer transfer bytes (f16 / int8 codecs), not overlap.  On
        # locally-attached TPUs the async dispatch order still lets DMA
        # overlap compute.
        self.device_ola = device_ola
        self.ola_bucket_samples = int(
            ola_bucket_seconds * stft_processor.sample_rate
        )
        # freq_policy="crop_pow2": run the MODEL on the spectrogram minus its
        # Nyquist row (n_fft/2+1 = 1025 -> 1024 bins at the flagship STFT)
        # and edge-replicate the predicted mask back onto the Nyquist row.
        # TPU rationale: 1025 forces a ragged ninth 128-lane tile on every
        # stage-1 score matmul (measured 8-9% slower than 1024 at identical
        # row counts) and a pad/crop at every skip concat; 1024 tiles
        # cleanly end to end.  The Nyquist bin of 44.1 kHz audio is
        # inaudible noise-floor energy, and masks vary smoothly in
        # frequency, so replicating the last computed mask row is
        # quality-neutral (validated vs "full" on a trained checkpoint:
        # tools/overlap_ab.py --freq_policy).  "full" (default) keeps
        # reference-exact behaviour.
        if freq_policy not in ("full", "crop_pow2"):
            raise ValueError(f"unknown freq_policy {freq_policy!r}")
        self.freq_policy = freq_policy

        self.sample_rate = stft_processor.sample_rate
        self.segment_samples = int(segment_length * self.sample_rate)
        self.hop_samples = int(self.segment_samples * (1 - overlap))
        # segments per device-OLA window, sized so a window spans roughly
        # ola_bucket_seconds of audio
        self.ola_window_segments = max(
            1,
            round((self.ola_bucket_samples - self.segment_samples)
                  / max(self.hop_samples, 1)) + 1,
        )
        self.n_stems = model.out_channels // 2
        # model input channels decide mono duplication:
        #   in_channels==2 -> mono [re, im]   (reference: inference.py:319-332)
        #   in_channels==4 -> mono duplicated to stereo (reference: trainer.py:393-394)
        self.model_audio_channels = model.in_channels // 2

        # Multi-chip separation: with a jax.sharding.Mesh, the segment batch
        # is split over the 'data' axis via shard_map — MANUAL partitioning,
        # so the per-chip forward is collective-free BY CONSTRUCTION (each
        # chip separates its own segments) while the 'model' axis stays in
        # GSPMD auto mode ('model' > 1 adds Megatron TP inside).  Plain
        # GSPMD batch sharding was measured NOT to scale here: it
        # all-gathers the rows entering every chunked-attention lax.map, so
        # each chip recomputed the full batch (caught by
        # tools/bench_mesh_scaling.py, round 5; the shard_map form compiles
        # to zero collectives and exactly 1/d per-device FLOPs).
        # The reference is single-GPU only (reference: inference.py:29).
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.sharding import (
                batch_sharding,
                shard_variables,
                variables_shardings,
            )

            d = mesh.shape.get("data", 1)
            # round the batch up so every chip gets equal work
            self.segment_batch = -(-segment_batch // d) * d
            self.variables = shard_variables(self.variables, mesh)
            self._batch_sharding = batch_sharding(mesh)
            var_shardings = variables_shardings(self.variables, mesh)
            self._jit_separate = jax.jit(
                jax.shard_map(
                    self._separate_batch_impl, mesh=mesh,
                    in_specs=(P(), P("data")), out_specs=P("data"),
                    axis_names={"data"},
                ),
                in_shardings=(var_shardings, self._batch_sharding),
                out_shardings=self._batch_sharding,
            )
            # device_ola composes with the mesh: the whole track rides one
            # h2d, the per-window segment batches run through a shard_mapped
            # lax.map (each chip separates batch/d segments of every window)
            # and the stems ride one d2h — multi-chip serving keeps the
            # single-transfer track path.
            self._sharded_window_map = jax.shard_map(
                lambda v, b: jax.lax.map(
                    lambda s: self._separate_core(v, s), b
                ),
                mesh=mesh,
                in_specs=(P(), P(None, "data")),
                out_specs=P(None, "data"),
                axis_names={"data"},
            )
            replicated = NamedSharding(mesh, P())
            self._jit_device_ola = jax.jit(
                self._device_ola_impl,
                in_shardings=(var_shardings, replicated, replicated),
                out_shardings=replicated,
            )
        else:
            self._jit_separate = jax.jit(self._separate_batch_impl)
            self._jit_device_ola = jax.jit(self._device_ola_impl)

    def update_variables(self, variables: Dict) -> None:
        """Swap model weights in place (e.g. per in-training SDR eval: the
        jitted pipeline takes variables as ARGUMENTS, so no recompile).
        Under a mesh the tree is re-placed per the sharding rules — a no-op
        device_put when the caller's arrays are already sharded that way
        (the Trainer's state under the same mesh is)."""
        if self.mesh is not None:
            from ..parallel.sharding import shard_variables

            variables = shard_variables(variables, self.mesh)
        self.variables = variables

    # ----------------------------------------------------- transfer codecs
    def _encode_host(self, x: np.ndarray) -> np.ndarray:
        """f32 host audio -> transfer dtype (int16 is scaled PCM)."""
        if self.transfer_dtype == np.int16:
            return np.clip(
                np.rint(x * _INT16_SCALE), -32768, 32767
            ).astype(np.int16)
        return x.astype(self.transfer_dtype)

    def _decode_host(self, x) -> np.ndarray:
        x = np.asarray(x)
        if self.transfer_dtype == np.int16:
            return x.astype(np.float32) / _INT16_SCALE
        return x.astype(np.float32)

    def _encode_dev(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.transfer_dtype == np.int16:
            return jnp.clip(
                jnp.round(x * _INT16_SCALE), -32768, 32767
            ).astype(jnp.int16)
        return x.astype(jnp.dtype(self.transfer_dtype))

    def _decode_dev(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.transfer_dtype == np.int16:
            return x.astype(jnp.float32) / _INT16_SCALE
        return x.astype(jnp.float32)

    # --------------------------------------------------------------- core
    def _separate_batch_impl(self, variables, segments: jnp.ndarray) -> jnp.ndarray:
        """(B, S) mono segments -> (B, n_stems, S) in the transfer dtype."""
        return self._encode_dev(
            self._separate_core(variables, self._decode_dev(segments))
        )

    def _separate_core(self, variables, segments: jnp.ndarray) -> jnp.ndarray:
        """(B, S) mono segments -> (B, n_stems, S) separated audio (f32)."""
        B, S = segments.shape
        segments = segments.astype(jnp.float32)
        wav = jnp.repeat(segments[:, None, :], self.model_audio_channels, axis=1)
        spec = self.stft_processor.stft(wav)                # (B, C, F, T)
        model_input = self.stft_processor.to_model_input(spec)
        F_full = model_input.shape[2]
        if self.freq_policy == "crop_pow2" and F_full % 2 == 1:
            # drop the Nyquist row for clean 128-tiling (see __init__ note)
            model_input = model_input[:, :, :-1, :]
        stats = None
        if self.normalizer is not None:
            model_input, mean, std = self.normalizer(model_input, return_stats=True)
            stats = (mean, std)
        out = self.model.apply(variables, model_input, train=False)
        if stats is not None:
            # reference denormalizes the masks with the input stats
            # (reference: inference.py:131-133)
            out = self.normalizer.denormalize(out, *stats)
        if out.shape[2] != F_full:
            # edge-replicate the last computed mask row onto the Nyquist bin
            out = jnp.concatenate([out, out[:, :, -1:, :]], axis=2)

        if self.mask_mode == "trainer":
            mono = jnp.mean(spec, axis=1)                   # (B, F, T) complex
            masked = trainer_masked_complex(
                out, jnp.abs(mono), jnp.angle(mono), self.n_stems
            )                                               # (B, n_stems, F, T)
            audio = self.stft_processor.istft(masked, length=S)
        elif self.mask_mode == "mag_direct":
            # single-sigmoid magnitude masks (train_mask_mode="direct"):
            # head channels 0..n_stems-1 x mono magnitude, mixture phase
            from ..ops.masking import apply_magnitude_masks

            mono = jnp.mean(spec, axis=1)
            pred_mags = apply_magnitude_masks(
                out, jnp.abs(mono), self.n_stems, "direct"
            )
            masked = pred_mags * jnp.exp(1j * jnp.angle(mono)[:, None])
            audio = self.stft_processor.istft(masked, length=S)
        else:  # direct
            masked = apply_direct_masks(out, spec, self.n_stems)  # (B, S, C, F, T)
            audio = self.stft_processor.istft(masked, length=S)
            audio = jnp.mean(audio, axis=2)                 # mono out
        return audio                                        # (B, n_stems, S) f32

    def _device_ola_impl(
        self, variables, window: jnp.ndarray, n_valid: jnp.ndarray,
    ) -> jnp.ndarray:
        """One OLA window: ola_window_segments consecutive segments of the
        (W,)-sample window, masked to the first ``n_valid``; returns the
        UN-normalized Hann-weighted accumulation (n_stems, W).  The window
        length is fixed, so one compile serves every track length;
        normalization happens on host (the norm is analytic — no device
        traffic needed for it).  Each window rides its own h2d (window
        slices overlap by seg-hop, so total traffic matches one whole-track
        transfer), keeping per-call transfers small and letting DMA overlap
        compute on locally-attached devices (the dev tunnel serializes
        them — see the __init__ note)."""
        seg, hop = self.segment_samples, self.hop_samples
        K = self.ola_window_segments
        W = (K - 1) * hop + seg
        window = self._decode_dev(window)
        idx = np.arange(K)[:, None] * hop + np.arange(seg)[None, :]
        segments = window[idx]                               # (K, seg)

        # Minimal-waste batch split: padded segments are fully-computed
        # garbage (a whole wasted model forward each), so pick the largest
        # batch size <= segment_batch with the least padding.
        step = 1 if self.mesh is None else self.mesh.shape.get("data", 1)
        bs = min(
            range(step, max(self.segment_batch, step) + 1, step),
            key=lambda b: ((-(-K // b)) * b - K, -b),
        )
        nb = -(-K // bs)
        pad = nb * bs - K
        if pad:
            segments = jnp.pad(segments, ((0, pad), (0, 0)))
        batches = segments.reshape(nb, bs, seg)
        if self.mesh is not None:
            # shard_mapped map: every chip runs bs/d segments of each window
            # batch, collective-free; only the OLA scatter below gathers.
            outs = self._sharded_window_map(variables, batches)
        elif nb == 1:
            outs = self._separate_core(variables, batches[0])[None]
        else:
            outs = jax.lax.map(
                lambda s: self._separate_core(variables, s), batches
            )                                                # (nb, bs, St, seg)
        outs = outs.reshape(nb * bs, self.n_stems, seg)[:K]

        valid = (jnp.arange(K) < n_valid[0]).astype(jnp.float32)
        hann = jnp.asarray(_hann(seg))
        weighted = (
            outs * (hann[None, None, :] * valid[:, None, None])
        ).transpose(1, 0, 2)
        acc = jnp.zeros((self.n_stems, W), jnp.float32)
        acc = acc.at[:, idx].add(weighted)
        if self.int8_output:
            # Dynamic per-stem int8 halves the (wall-exposed) d2h bytes.
            # Quantize the ENVELOPE-NORMALIZED signal, not the raw Hann
            # accumulation: raw-acc quantization noise is constant-amplitude,
            # so the final divide by the (near-zero at track edges) OLA
            # envelope would blow it up ~50x there.  y = acc/env is bounded
            # at signal scale everywhere (acc <= env * peak), the error of
            # env * round(y) scales WITH the envelope, and the host rebuilds
            # acc = env * y exactly (env depends only on hann/valid, known
            # on both sides).  Scales ride back as a small padded f32 array
            # (the tunnel rejects single-element transfers).
            # eps only guards exact 0/0 (uncovered samples have acc == 0
            # exactly); anywhere covered, y = acc/env is an env-weighted
            # average of per-segment signals, bounded at signal scale even
            # as env -> 0 — so the DECODED error env*dy vanishes at the
            # edges instead of being amplified by the final 1/norm
            env = jnp.zeros((W,), jnp.float32).at[idx].add(
                hann[None, :] * valid[:, None])
            y = acc / jnp.maximum(env, 1e-12)[None]
            smax = jnp.maximum(jnp.max(jnp.abs(y), axis=1), 1e-12)
            q = jnp.clip(
                jnp.round(y * (127.0 / smax)[:, None]), -127, 127
            ).astype(jnp.int8)
            pad = max(8, self.n_stems) - self.n_stems
            return q, jnp.pad(smax, (0, pad))
        return self._encode_dev(acc)

    def _dispatch_long_device(self, audio: np.ndarray) -> Dict:
        """Enqueue every OLA window call for one track; returns collectable
        metadata.  Dispatch is async, so a caller may enqueue the NEXT
        track before collecting this one (separate_stream) — device compute
        of track k+1 then overlaps track k's result transfers."""
        total = audio.shape[1]
        seg, hop = self.segment_samples, self.hop_samples
        K = self.ola_window_segments
        W = (K - 1) * hop + seg
        # first uniform grid covering the whole track
        n_seg = -(-max(total - seg, 0) // hop) + 1
        n_win = -(-n_seg // K)
        S_needed = (n_win * K - 1) * hop + seg
        track = self._encode_host(np.pad(audio[0], (0, S_needed - total)))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            put = functools.partial(
                jax.device_put,
                device=NamedSharding(self.mesh, PartitionSpec()),
            )
        else:
            put = jnp.asarray

        handles = []
        for w in range(n_win):
            o = w * K * hop
            nv = jnp.asarray([min(K, n_seg - w * K)], jnp.int32)
            handles.append(
                self._jit_device_ola(self.variables, put(track[o:o + W]), nv)
            )
        return {"handles": handles, "total": total, "n_seg": n_seg,
                "S_needed": S_needed}

    def _collect_long_device(
        self, meta: Dict, stems: List[str]
    ) -> Dict[str, np.ndarray]:
        """Fetch + decode + normalize one dispatched track."""
        total, n_seg, S_needed = (
            meta["total"], meta["n_seg"], meta["S_needed"])
        seg, hop = self.segment_samples, self.hop_samples
        K = self.ola_window_segments
        W = (K - 1) * hop + seg
        acc = np.zeros((self.n_stems, S_needed), np.float32)
        hann_np = _hann(seg)
        idx_np = np.arange(K)[:, None] * hop + np.arange(seg)[None, :]
        for w, h in enumerate(meta["handles"]):
            o = w * K * hop
            if self.int8_output:
                # rebuild acc = env * (dequantized y); env mirrors the
                # device's hann/valid scatter exactly (see _device_ola_impl)
                q, smax = h
                s = np.asarray(smax)[: self.n_stems].astype(np.float32)
                nv = min(K, n_seg - w * K)
                env = np.zeros(W, np.float32)
                np.add.at(env, idx_np[:nv].ravel(),
                          np.broadcast_to(hann_np, (nv, seg)).ravel())
                y = np.asarray(q).astype(np.float32) * (s / 127.0)[:, None]
                acc[:, o : o + W] += np.maximum(env, 1e-12)[None] * y
            else:
                acc[:, o : o + W] += self._decode_host(h)

        norm = np.zeros(S_needed, dtype=np.float32)
        for i in range(n_seg):
            norm[i * hop : i * hop + seg] += hann_np
        out = acc[:, :total] / np.maximum(norm[:total], 1e-8)[None]
        return {name: out[i : i + 1] for i, name in enumerate(stems)}

    def _separate_long_device(
        self, audio: np.ndarray, stems: List[str]
    ) -> Dict[str, np.ndarray]:
        """Windowed device OLA: all window calls are dispatched before any
        result is fetched, with PER-WINDOW h2d transfers (overlappable DMA
        on local devices; serialized — so byte-count-bound — on the dev
        tunnel)."""
        return self._collect_long_device(
            self._dispatch_long_device(audio), stems)

    def separate_stream(
        self,
        tracks: Sequence,
        stem_names: Optional[Sequence[str]] = None,
        max_in_flight: int = 2,
    ) -> List[Dict[str, np.ndarray]]:
        """Pipelined multi-track separation (serving-throughput path).

        Keeps up to ``max_in_flight`` tracks' window programs enqueued on
        the device before collecting results in order, so track k+1's
        compute overlaps track k's result transfers — the throughput mode
        the reference's sequential BatchSeparator loop
        (reference: inference.py:367-425) never had.  Results match
        per-track :meth:`separate` exactly (same programs, same decode).
        Falls back to sequential separate() for tracks the device-OLA path
        does not cover (device_ola off, or track <= one segment).
        ``max_in_flight`` bounds device-side live buffers:
        ~n_win x (stems x W) accumulations per in-flight track.
        """
        stems = list(stem_names or self.default_stems)[: self.n_stems]
        queue: List[Tuple[int, Dict]] = []   # (index, dispatch meta)
        results: List[Optional[Dict[str, np.ndarray]]] = [None] * len(tracks)

        def drain_one() -> None:
            i, meta = queue.pop(0)
            results[i] = self._collect_long_device(meta, stems)

        for i, audio in enumerate(tracks):
            audio = np.asarray(audio, dtype=np.float32)
            if audio.ndim == 1:
                audio = audio[None]
            if audio.shape[0] > 1:
                audio = audio.mean(axis=0, keepdims=True)
            if not self.device_ola or audio.shape[1] <= self.segment_samples:
                while queue:           # preserve output order
                    drain_one()
                results[i] = self.separate(audio, stems)
                continue
            # drain BEFORE dispatching so at most max_in_flight tracks'
            # window programs are ever live on device at once
            while len(queue) >= max_in_flight:
                drain_one()
            queue.append((i, self._dispatch_long_device(audio)))
        while queue:
            drain_one()
        return results

    # ---------------------------------------------------------------- api
    def separate(
        self, audio, stem_names: Optional[Sequence[str]] = None
    ) -> Dict[str, np.ndarray]:
        """Separate a mixture [channels, time] or [time] -> {stem: (1, time)}
        (reference: inference.py:61-96)."""
        stems = list(stem_names or self.default_stems)[: self.n_stems]
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 1:
            audio = audio[None]
        if audio.shape[0] > 1:
            audio = audio.mean(axis=0, keepdims=True)       # force mono
        total = audio.shape[1]
        seg = self.segment_samples

        if total <= seg:
            padded = self._encode_host(np.pad(audio[0], (0, seg - total)))
            block = padded[None]
            if self.mesh is not None:
                # batch dim must tile evenly over the 'data' axis
                d = self.mesh.shape.get("data", 1)
                block = np.pad(block, ((0, d - 1), (0, 0)))
            out = self._decode_host(
                self._jit_separate(self.variables, jnp.asarray(block))
            )[0, :, :total]
            return {name: out[i : i + 1] for i, name in enumerate(stems)}
        if self.device_ola:
            return self._separate_long_device(audio, stems)
        return self._separate_long(audio, stems)

    def _separate_long(
        self, audio: np.ndarray, stems: List[str]
    ) -> Dict[str, np.ndarray]:
        """Hann overlap-add over fixed segments (reference: inference.py:159-225),
        with segments batched through the jitted pipeline."""
        total = audio.shape[1]
        seg, hop = self.segment_samples, self.hop_samples
        num_segments = (total - seg) // hop + 1
        window = _hann(seg)

        # segment start offsets, reference last-segment clamping
        bounds = []
        for i in range(num_segments):
            start = i * hop
            end = start + seg
            if end > total:
                end = total
                start = max(0, end - seg)
            bounds.append((start, end))

        batch = np.zeros((len(bounds), seg), dtype=np.float32)
        for j, (start, end) in enumerate(bounds):
            chunk = audio[0, start:end]
            batch[j, : end - start] = chunk
        batch = self._encode_host(batch)

        bs = self.segment_batch
        n = len(bounds)
        # Dispatch every batch before fetching any result: device compute for
        # batch j+1 overlaps the (slow, ~35 MB/s through the tunnel) d2h
        # transfer of batch j.
        handles = []
        for j0 in range(0, n, bs):
            block = batch[j0 : j0 + bs]
            if block.shape[0] < bs:
                # pad to the compiled batch size to avoid a recompile
                block = np.pad(block, ((0, bs - block.shape[0]), (0, 0)))
            handles.append(
                self._jit_separate(self.variables, jnp.asarray(block))
            )
        outs = [
            self._decode_host(res)[: min(bs, n - j0)]
            for j0, res in zip(range(0, n, bs), handles)
        ]
        separated_segments = np.concatenate(outs, axis=0)   # (n, n_stems, seg)

        out = {name: np.zeros((1, total), dtype=np.float32) for name in stems}
        norm = np.zeros(total, dtype=np.float32)
        for j, (start, end) in enumerate(bounds):
            length = end - start
            w = window[:length]
            for i, name in enumerate(stems):
                out[name][0, start:end] += separated_segments[j, i, :length] * w
            norm[start:end] += w
        norm = np.maximum(norm, 1e-8)
        for name in stems:
            out[name] /= norm[None]
        return out

    # --------------------------------------------------------------- file
    def separate_file(
        self,
        input_path: str,
        output_dir: str,
        stem_names: Optional[Sequence[str]] = None,
    ) -> Dict[str, str]:
        """Load -> separate -> save per-stem wavs (reference: inference.py:239-297).
        Requires soundfile."""
        import os

        import soundfile as sf

        audio, sr = sf.read(input_path, dtype="float32", always_2d=True)
        audio = audio.T                                     # (channels, time)
        if sr != self.sample_rate:
            audio = _resample_poly(audio, sr, self.sample_rate)
        separated = self.separate(audio, stem_names)
        os.makedirs(output_dir, exist_ok=True)
        base = os.path.splitext(os.path.basename(input_path))[0]
        paths = {}
        for name, wav in separated.items():
            path = os.path.join(output_dir, f"{base}_{name}.wav")
            sf.write(path, wav[0], self.sample_rate)
            paths[name] = path
        return paths


def _resample_poly(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr_in, sr_out)
    return resample_poly(audio, sr_out // g, sr_in // g, axis=-1).astype(np.float32)


class BatchSeparator:
    """Sequential multi-file separation with per-file error capture
    (reference: inference.py:367-425)."""

    def __init__(self, separator: SourceSeparator):
        self.separator = separator

    def separate_files(
        self, input_paths: Sequence[str], output_dir: str
    ) -> Dict[str, Dict]:
        results = {}
        for path in input_paths:
            try:
                results[path] = {
                    "status": "ok",
                    "outputs": self.separator.separate_file(path, output_dir),
                }
            except Exception as exc:  # noqa: BLE001 (parity: keep going)
                results[path] = {"status": "error", "error": str(exc)}
        return results


def load_separator_from_checkpoint(
    checkpoint_path: str,
    model_config: Optional[ModelConfig] = None,
    stft_config: Optional[STFTConfig] = None,
    eval_config: Optional[EvalConfig] = None,
    stem_names: Sequence[str] = ("vocals", "other"),
    mesh=None,
) -> SourceSeparator:
    """Build a SourceSeparator from a checkpoint (reference: inference.py:300-364;
    the reference version crashes on a bad window_fn kwarg — fixed here).

    Accepts either an orbax checkpoint directory produced by our Trainer or a
    PyTorch ``.pt`` file from the reference repo (converted on load).
    Every EvalConfig serving knob (device_ola, transfer_dtype, freq_policy,
    stft_precision, ...) is honored — pass ``EvalConfig.fast_serving()`` for
    the benchmarked TPU throughput path.
    """
    import dataclasses as _dc
    import os

    stft_config = stft_config or STFTConfig()
    eval_config = eval_config or EvalConfig()
    if eval_config.stft_precision:
        stft_config = _dc.replace(
            stft_config, precision=eval_config.stft_precision)

    if os.path.isfile(checkpoint_path) and checkpoint_path.endswith((".pt", ".pth")):
        import torch

        from ..utils.torch_compat import torch_state_dict_to_variables

        ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
        state_dict = ckpt.get("model_state_dict", ckpt)
        cfg_dict = ckpt.get("config", {}) if isinstance(ckpt, dict) else {}
        if model_config is None:
            model_config = ModelConfig(
                in_channels=cfg_dict.get("in_channels", 2),
                out_channels=cfg_dict.get("out_channels", 2),
                depths=tuple(cfg_dict.get("depths", (2, 2, 6, 2))),
                dims=tuple(cfg_dict.get("dims", (32, 64, 128, 256))),
                window_size=cfg_dict.get("window_size", 8),
                shift_size=cfg_dict.get("shift_size", 4),
                num_heads=cfg_dict.get("num_heads", 8),
            )
        variables = torch_state_dict_to_variables(state_dict, model_config.depths)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    else:
        from ..training.checkpointing import restore_variables

        variables, saved_cfg = restore_variables(checkpoint_path)
        if model_config is None and saved_cfg is not None:
            model_config = ModelConfig(**saved_cfg["model"])
        if model_config is None:
            raise ValueError("model_config required for this checkpoint")

    model = TFSWAUNet.from_config(model_config)
    normalizer = (
        SpectrogramNormalizer(mode="instance") if eval_config.normalize else None
    )
    return SourceSeparator(
        model=model,
        variables=variables,
        stft_processor=STFTProcessor(stft_config),
        normalizer=normalizer,
        segment_length=eval_config.segment_seconds,
        overlap=eval_config.overlap,
        mask_mode=eval_config.mask_mode,
        stem_names=stem_names,
        segment_batch=eval_config.segment_batch,
        transfer_dtype=eval_config.transfer_dtype,
        device_ola=eval_config.device_ola,
        ola_bucket_seconds=eval_config.ola_bucket_seconds,
        freq_policy=eval_config.freq_policy,
        mesh=mesh,
    )
