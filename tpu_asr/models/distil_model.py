"""DistilCTCModel — the KD student model family, covering the reference's
`DistilEncDecCTCModelBPE` (asr_train.py:314-467), `DistilFlowMatchingCTCModelBPE`
(asr_train.py:469-788) and the diffm variant (asr_train_diffm.py:500-829) as ONE
config-driven module (the reference pastes ~80% of this code 4x; SURVEY.md §2.1).

Architecture (TPU-first):
- Student and frozen teacher are submodules of one flax module, so the whole
  KD training step (student fwd + teacher fwd + all KD losses) is a single
  XLA program. Teacher outputs are wrapped in stop_gradient; the optimizer
  additionally masks teacher params (see tpu_asr/train/optim.py).
- Per-layer features come from the encoder scan's stacked outputs (L, B, T, D)
  instead of forward hooks (asr_train.py:528-541).
- The per-layer FM / router / DiffKD / diffm computations are vmapped over the
  layer axis L: layers are independent given the layer-id embedding, so the
  16 per-layer meta-encoder calls batch into single large MXU matmuls.
- The dynamic router's data-dependent step counts run through the masked-scan
  Euler loop (see kd/flow_matching.py) — no dynamic control flow.

Reference-faithful behaviors kept (see SURVEY.md §7.3 quirk list):
- FM uses the SAME FlowMatchingModule weights for every layer; only the router
  sees the layer id (asr_train.py:506-518).
- With use_flow_matching, the decoder consumes the LAST layer's FM output
  instead of the encoder output, in training AND eval (asr_train.py:664-670).
- Teacher runs in eval mode (dropout off, BN running stats): asr_train.py:1723-1725.
- layerwise KD: per-layer MSE averaged over layers, shared Linear projection.
- diffkd losses summed over layers (not averaged) in the FM model
  (asr_train.py:754-757); diffm version losses summed (asr_train_diffm.py:788-792).
- diffm's layerwise path draws a FRESH random Linear projection every call
  (asr_train_diffm.py:767 — a never-trained projection); reproduced with an
  rng-drawn projection when `diffm_fresh_layer_proj=True`.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_asr.config import DistillationConfig, ModelConfig
from tpu_asr.kd.diffkd import DiffKDModule
from tpu_asr.kd.diffm import LatentKDPipeline
from tpu_asr.kd.flow_matching import FlowMatchingModule
from tpu_asr.kd.losses import layerwise_mse_loss, logit_kl_loss
from tpu_asr.kd.router import DynamicStepRouter, aggregate_steps
from tpu_asr.models.ctc_model import CTCModel
from tpu_asr.ops.ctc import ctc_loss


class DistilOutput(NamedTuple):
    log_probs: jnp.ndarray       # (B, T', V+1)
    encoded_len: jnp.ndarray     # (B,)
    greedy: jnp.ndarray          # (B, T')
    losses: Dict[str, jnp.ndarray]
    metrics: Dict[str, jnp.ndarray]
    # teacher last-layer feature (B, T', Dt) when the teacher ran in-graph —
    # harvested by the teacher-feature cache (train/loop.py); None otherwise
    tch_last: Optional[jnp.ndarray] = None
    # ALL teacher layer features (L, B, T', Dt) when the teacher ran —
    # harvested by the all-layer cache (covers FM/DiffKD/diffm/full-layerwise
    # KD, which the last-layer cache cannot); None otherwise
    tch_feats: Optional[jnp.ndarray] = None


class DistilCTCModel(nn.Module):
    student_cfg: ModelConfig
    teacher_cfg: ModelConfig
    distill: DistillationConfig

    def setup(self):
        d = self.distill
        self.student = CTCModel(self.student_cfg)
        self.teacher = CTCModel(self.teacher_cfg)
        dtype = jnp.dtype(self.student_cfg.compute_dtype)

        self._needs_teacher_encoder = (
            d.use_logit_distillation or d.use_layerwise_distillation
            or d.use_flow_matching or d.use_diffkd or d.use_diffm)
        if d.use_flow_matching:
            assert d.flow is not None
            self.flow_matching = FlowMatchingModule(d.flow, dtype)
            if d.flow.use_dynamic_steps:
                assert d.router is not None
                self.router = DynamicStepRouter(d.router, dtype)
        if d.use_diffkd:
            assert d.diffkd is not None
            self.diffkd_mod = DiffKDModule(d.diffkd, dtype)
        if d.use_diffm:
            assert d.diffm is not None
            self.diffm_pipeline = LatentKDPipeline(d.diffm, dtype=dtype)
        if d.use_layerwise_distillation or d.use_flow_matching or d.use_diffkd:
            # shared student->teacher projection (asr_train.py:529)
            self.layer_proj = nn.Dense(self.teacher_cfg.encoder.d_model, dtype=dtype)

    # ------------------------------------------------------------------
    def _flow_matching_all_layers(
        self,
        stu_feats: jnp.ndarray,      # (L, B, T, Ds)
        tch_feats: jnp.ndarray,      # (L, B, T, Dt)
        train: bool,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Returns (flow_loss, router_loss, fm_out_last_layer, metrics)."""
        d = self.distill
        f = d.flow
        n_layers = stu_feats.shape[0]
        layer_ids = jnp.arange(n_layers, dtype=jnp.int32)
        metrics: Dict[str, jnp.ndarray] = {}

        if f.use_dynamic_steps:
            # router over all layers at once (vmap: shared params, per-layer rng)
            router_vmap = nn.vmap(
                lambda mod, s, t, lid: mod(s, t, lid, train=train),
                variable_axes={"params": None},
                split_rngs={"params": False, "gumbel": True},
                in_axes=(0, 0, 0),
            )
            steps_lb, router_losses, aux = router_vmap(
                self.router, stu_feats, tch_feats, layer_ids)   # (L,B), (L,), dict
            router_loss = jnp.sum(router_losses)
            metrics["router/batch_mean_sampling_steps_mean"] = jnp.mean(
                steps_lb.astype(jnp.float32))

            if d.flow.router_strategy == "group":
                steps_arg = steps_lb                              # (L, B) per-sample
                group = True
            else:
                steps_arg = jax.vmap(
                    lambda s: aggregate_steps(s, d.flow.router_strategy,
                                              f.router_max_sampling_steps))(steps_lb)
                steps_arg = jnp.broadcast_to(steps_arg[:, None], steps_lb.shape)
                group = False
            max_steps = f.router_max_sampling_steps
        else:
            router_loss = jnp.zeros((), jnp.float32)
            if f.sampling_steps_per_layer is not None:
                per_layer = jnp.asarray(f.sampling_steps_per_layer, jnp.int32)  # (L,)
                max_steps = int(max(f.sampling_steps_per_layer))
            else:
                per_layer = jnp.full((n_layers,), f.training_sampling, jnp.int32)
                max_steps = f.training_sampling
            steps_arg = jnp.broadcast_to(per_layer[:, None],
                                         (n_layers, stu_feats.shape[1]))
            group = False

        from tpu_asr.kd.flow_matching import resolve_euler_backend
        if resolve_euler_backend(f) == "pallas":
            # Fused-kernel path (ops/pallas_fm.py): the FM weights are shared
            # across layers, so instead of vmapping the module over L we
            # stack layers into the batch (B-MAJOR: row = b*L + l, keeping
            # the dp-sharded B axis major through the reshape) and run the
            # multi-step Euler kernel ONCE over (B*L, T, Ds). loss_layers=L
            # reproduces the vmap path's per-layer-summed loss semantics.
            b_sz = stu_feats.shape[1]
            stack = lambda z: z.transpose(1, 0, 2, 3).reshape(
                (b_sz * n_layers,) + z.shape[2:])
            steps_r = steps_arg.transpose(1, 0).reshape(b_sz * n_layers)
            flow_loss, fm_flat = self.flow_matching(
                stack(stu_feats), stack(tch_feats) if train else None,
                steps=steps_r, max_steps=max_steps, train=train,
                group_loss=group, loss_layers=n_layers)
            fm_last = fm_flat.reshape(
                (b_sz, n_layers) + fm_flat.shape[1:])[:, n_layers - 1]
            return flow_loss, router_loss, fm_last, metrics

        if train:
            fm_vmap = nn.vmap(
                lambda mod, s, t, st: mod(s, t, steps=st, max_steps=max_steps,
                                          train=True, group_loss=group),
                variable_axes={"params": None},
                split_rngs={"params": False, "dropout": True},
                in_axes=(0, 0, 0),
            )
            flow_losses, fm_out = fm_vmap(self.flow_matching, stu_feats,
                                          tch_feats, steps_arg)   # (L,), (L,B,T,Ds)
        else:
            fm_vmap = nn.vmap(
                lambda mod, s, st: mod(s, None, steps=st, max_steps=max_steps,
                                       train=False),
                variable_axes={"params": None},
                split_rngs={"params": False, "dropout": False},
                in_axes=(0, 0),
            )
            flow_losses, fm_out = fm_vmap(self.flow_matching, stu_feats, steps_arg)
        flow_loss = jnp.sum(flow_losses)
        return flow_loss, router_loss, fm_out[-1], metrics

    # ------------------------------------------------------------------
    def __call__(
        self,
        input_signal: jnp.ndarray,          # (B, L) waveform
        input_signal_length: jnp.ndarray,   # (B,)
        transcripts: Optional[jnp.ndarray] = None,       # (B, S)
        transcript_lengths: Optional[jnp.ndarray] = None,
        train: bool = False,
        tch_last_feat: Optional[jnp.ndarray] = None,     # (B, T', Dt) cached
        tch_all_feat: Optional[jnp.ndarray] = None,      # (L, B, T', Dt)
    ) -> DistilOutput:
        """`tch_last_feat`: cached teacher last-layer features (the teacher-
        feature cache, train/loop.py). The reference teacher consumes the
        UNAUGMENTED signal in eval mode (asr_train.py:591-592: its own
        preprocessor, no specaug, no_grad), so its outputs are deterministic
        per utterance — feeding them back skips the whole teacher forward
        with bit-identical loss semantics (pad rows are exactly zero after
        the encoder's final re-mask, so decode_logits reproduces the padded-
        frame log-probs too). Only valid when the teacher's sole consumers
        are logit KD and/or last-scope layerwise KD.

        `tch_all_feat`: ALL per-layer cached teacher features (L, B, T', Dt)
        — same determinism argument, covers every KD mode (the all-layer
        teacher cache, train/loop.py)."""
        # ----- student encode -----
        encoded, encoded_len, stu_feats = self.student.encode(
            input_signal, input_signal_length, train=train)
        return self.forward_with_student_encode(
            encoded, encoded_len, stu_feats, input_signal,
            input_signal_length, transcripts, transcript_lengths,
            train=train, tch_last_feat=tch_last_feat,
            tch_all_feat=tch_all_feat)

    def forward_packed_train(
        self,
        input_signal: jnp.ndarray,          # (B, L) waveform
        input_signal_length: jnp.ndarray,   # (B,)
        transcripts: Optional[jnp.ndarray],
        transcript_lengths: Optional[jnp.ndarray],
        pk_src_utt: jnp.ndarray,            # (R, Tp) utt index per frame
        pk_src_pos: jnp.ndarray,            # (R, Tp) source frame position
        pk_seg: jnp.ndarray,                # (R, Tp) segment map, 0 = guard
        pk_row: jnp.ndarray,                # (B,) packed row of utt b
        pk_start: jnp.ndarray,              # (B,) start frame of utt b
        train: bool = True,
    ) -> DistilOutput:
        """Packed-segment KD TRAINING step forward (round 5; the reference
        pads per duration bucket — ctc_bpe_models.py:98-215 — and has no
        equivalent). The encoder stacks (student AND frozen teacher, ~85% of
        step FLOPs) run on dense packed rows (data/packing.py plan arrays,
        computed host-side from the deterministic length arithmetic);
        per-layer features are then gathered back into the bucketed
        (B, T', D) layout, so every loss in forward_with_student_encode is
        computed on tensors IDENTICAL to the unpacked step's — exact loss
        parity at dropout=0 (tests/test_packed_train.py).

        Notes: with conv_norm_type='batch_norm' the BN batch statistics are
        computed over the packed layout (guard instead of bucket padding —
        a different padding population, same class of approximation as the
        reference's padded-batch BN); 'layer_norm' is exact. Plan arrays
        must be shard-local under dp (pack each shard's utterances into its
        own row block)."""
        d = self.distill
        # --- student: per-utterance featurize (+specaug) + pre-encode ---
        x_src, enc_len = self.student.pre_encode_aug(
            input_signal, input_signal_length, train=train)
        t_prime = x_src.shape[1]
        t_pack = pk_seg.shape[1]
        valid_rows = pk_seg > 0
        packed = jnp.where(valid_rows[..., None],
                           x_src[pk_src_utt, pk_src_pos], 0)
        encoded_p, _, stu_feats_p = self.student.encode_packed(
            packed, pk_seg, train=train)

        # --- gather back to the bucketed per-utterance layout ---
        pos = pk_start[:, None] + jnp.arange(t_prime)[None, :]     # (B, T')
        pos_c = jnp.minimum(pos, t_pack - 1)
        valid = jnp.arange(t_prime)[None, :] < enc_len[:, None]
        encoded_u = jnp.where(valid[..., None],
                              encoded_p[pk_row[:, None], pos_c], 0)
        stu_feats_u = jnp.where(valid[None, ..., None],
                                stu_feats_p[:, pk_row[:, None], pos_c], 0)

        # --- frozen teacher: packed too (eval mode, same plan — the
        #     teacher's subsampled lengths equal the student's) ---
        needs_teacher = self._needs_teacher_encoder if train else (
            d.use_flow_matching and d.flow is not None
            and d.flow.use_dynamic_steps)
        tch_all = None
        if needs_teacher:
            xt_src, _ = self.teacher.pre_encode_aug(
                input_signal, input_signal_length, train=False)
            packed_t = jnp.where(valid_rows[..., None],
                                 xt_src[pk_src_utt, pk_src_pos], 0)
            _, _, tch_feats_p = self.teacher.encode_packed(
                packed_t, pk_seg, train=False)
            tch_all = jnp.where(valid[None, ..., None],
                                tch_feats_p[:, pk_row[:, None], pos_c], 0)
            tch_all = jax.lax.stop_gradient(tch_all)

        return self.forward_with_student_encode(
            encoded_u, enc_len, stu_feats_u, input_signal,
            input_signal_length, transcripts, transcript_lengths,
            train=train, tch_all_feat=tch_all)

    def forward_with_student_encode(
        self,
        encoded: jnp.ndarray,               # (B, T', D) student encoder out
        encoded_len: jnp.ndarray,           # (B,)
        stu_feats: jnp.ndarray,             # (L, B, T', D) per-layer feats
        input_signal: jnp.ndarray,          # (B, L) waveform (teacher input)
        input_signal_length: jnp.ndarray,
        transcripts: Optional[jnp.ndarray] = None,
        transcript_lengths: Optional[jnp.ndarray] = None,
        train: bool = False,
        tch_last_feat: Optional[jnp.ndarray] = None,
        tch_all_feat: Optional[jnp.ndarray] = None,
    ) -> DistilOutput:
        """Everything after the student encode: teacher forward + every KD
        loss + decode. Split out so alternative student-encode executions
        (the GPipe pipeline, parallel/pipeline.py; the packed-segment train
        step, forward_packed_train) reuse the loss semantics verbatim.

        `tch_all_feat` (L, B, T', Dt): precomputed per-layer teacher
        features — from the all-layer teacher cache (train/loop.py) or a
        packed teacher forward. Unlike `tch_last_feat` it covers EVERY
        teacher consumer (FM, DiffKD, diffm, full-layerwise): the teacher
        input is unaugmented and eval-mode (asr_train.py:591-592), so the
        full feature stack is deterministic per utterance."""
        d = self.distill
        losses: Dict[str, jnp.ndarray] = {}
        metrics: Dict[str, jnp.ndarray] = {}
        zero = jnp.zeros((), jnp.float32)

        # ----- teacher encode (frozen, eval mode, stop-gradient) -----
        # In eval only the FM path needs the teacher (router input); the KD
        # losses are train-only (reference computes them in training_step).
        needs_teacher = self._needs_teacher_encoder if train else (
            d.use_flow_matching and d.flow is not None and d.flow.use_dynamic_steps)
        tch_feats = None
        tch_encoded = None
        tch_last = None
        if tch_all_feat is not None:
            tch_feats = jax.lax.stop_gradient(
                tch_all_feat.astype(encoded.dtype))
            tch_last = tch_feats[-1]
            needs_teacher = False
        elif tch_last_feat is not None:
            cacheable = not (
                d.use_flow_matching or d.use_diffkd or d.use_diffm
                or (d.use_layerwise_distillation
                    and d.layer_kd_scope != "last"))
            if not cacheable:
                raise ValueError(
                    "cached teacher features (tch_last_feat) support only "
                    "logit KD and last-scope layerwise KD; FM/DiffKD/diffm/"
                    "full-layerwise need all 16 teacher layers")
            tch_last = jax.lax.stop_gradient(
                tch_last_feat.astype(encoded.dtype))
            needs_teacher = False
        if needs_teacher:
            tch_encoded, _, tch_feats = self.teacher.encode(
                input_signal, input_signal_length, train=False)
            tch_encoded = jax.lax.stop_gradient(tch_encoded)
            tch_feats = jax.lax.stop_gradient(tch_feats)
            tch_last = tch_feats[-1]

        # ----- flow matching over all layers -----
        decoder_in = encoded
        if d.use_flow_matching:
            flow_loss, router_loss, fm_last, fm_metrics = \
                self._flow_matching_all_layers(stu_feats, tch_feats, train)
            losses["flow_matching"] = flow_loss
            if d.flow.use_dynamic_steps:
                losses["router"] = d.flow.router_weight * router_loss
            metrics.update(fm_metrics)
            # FM output of the LAST layer replaces the decoder input
            # (asr_train.py:664-670), in training and eval alike.
            decoder_in = fm_last

        # ----- decode -----
        log_probs = self.student.decode_logits(decoder_in)
        greedy = jnp.argmax(log_probs, axis=-1)

        # ----- CTC (+ optional intermediate CTC on selected layers) -----
        if transcripts is not None:
            if d.use_ctc:
                main_ctc = ctc_loss(
                    log_probs, transcripts, encoded_len, transcript_lengths,
                    reduction=self.student_cfg.ctc_reduction)
                if train and d.interctc_layers:
                    w = d.interctc_weight
                    aux_sum = zero
                    for l in d.interctc_layers:
                        aux_lp = self.student.decode_logits(stu_feats[l])
                        aux = ctc_loss(aux_lp, transcripts, encoded_len,
                                       transcript_lengths,
                                       reduction=self.student_cfg.ctc_reduction)
                        metrics[f"interctc/layer{l}"] = aux
                        aux_sum = aux_sum + aux
                    main_ctc = (1.0 - w) * main_ctc + \
                        (w / len(d.interctc_layers)) * aux_sum
                losses["ctc"] = main_ctc
            else:
                losses["ctc"] = zero

        # ----- logit KL (teacher decoder on its last-layer feature,
        #       asr_train.py:725-731) -----
        if train and d.use_logit_distillation and tch_last is not None:
            tch_log_probs = self.teacher.decode_logits(tch_last)
            tch_log_probs = jax.lax.stop_gradient(tch_log_probs)
            losses["logit_kd"] = d.kd_alpha * logit_kl_loss(
                log_probs, tch_log_probs, d.kd_temperature)

        # ----- layerwise MSE (shared projection, layer-averaged,
        #       asr_train.py:736-748) -----
        if train and d.use_layerwise_distillation and tch_last is not None \
                and d.layer_kd_scope == "last":
            # final-layer feature MSE only (DistilEncDecCTCModelBPE path)
            proj = self.layer_proj(stu_feats[-1])
            losses["layer_kd"] = d.layer_kd_alpha * layerwise_mse_loss(
                proj[None], tch_last[None], average_layers=True)
        elif train and d.use_layerwise_distillation and tch_feats is not None:
            if d.diffm_fresh_layer_proj:
                # diffm quirk: fresh random (never-trained) per-layer Linear,
                # torch default init U(-1/sqrt(fan_in), +) (asr_train_diffm.py:767)
                n_l = stu_feats.shape[0]
                d_s = stu_feats.shape[-1]
                d_t = tch_feats.shape[-1]
                bound = 1.0 / (d_s ** 0.5)
                kw, kb = jax.random.split(self.make_rng("noise"))
                w = jax.random.uniform(kw, (n_l, d_s, d_t), stu_feats.dtype,
                                       -bound, bound)
                bias = jax.random.uniform(kb, (n_l, 1, 1, d_t),
                                          stu_feats.dtype, -bound, bound)
                proj = jnp.einsum("lbts,lsd->lbtd", stu_feats, w) + bias
            else:
                proj = self.layer_proj(stu_feats)                # (L,B,T,Dt)
            losses["layer_kd"] = d.layer_kd_alpha * layerwise_mse_loss(
                proj, tch_feats, average_layers=True)

        # ----- DiffKD: summed over layers (asr_train.py:754-757) -----
        if train and d.use_diffkd and tch_feats is not None:
            diffkd_vmap = nn.vmap(
                lambda mod, s, t: mod(s, t),
                variable_axes={"params": None},
                split_rngs={"params": False},
                in_axes=(0, 0),
            )
            losses["diffkd"] = jnp.sum(
                diffkd_vmap(self.diffkd_mod, stu_feats, tch_feats))

        # ----- diffm latent pipeline: summed over layers
        #       (asr_train_diffm.py:772-792) -----
        if train and d.use_diffm and tch_feats is not None:
            # layers stacked into the batch B-MAJOR (row = b * L + l; dp
            # sharding on the batch axis survives the reshape) — params are
            # shared across layers (the nn.vmap this replaces used
            # variable_axes={'params': None}), so one big-batch pass is
            # equivalent, and the fused multi-step Euler kernel
            # (ops/pallas_fm.py, custom_partitioning: no batching rule)
            # now covers the latent FM too. loss_layers=L reproduces the
            # reference's per-layer-summed loss aggregation.
            n_l, b_sz = stu_feats.shape[0], stu_feats.shape[1]
            stack = lambda z: z.transpose(1, 0, 2, 3).reshape(
                (b_sz * n_l,) + z.shape[2:])
            v_losses = self.diffm_pipeline(
                stack(stu_feats), stack(tch_feats), train=train,
                loss_layers=n_l)
            for key, val in v_losses.items():
                losses[f"diffm/{key}"] = val

        total = zero
        for v in losses.values():
            total = total + v
        losses["total"] = total
        return DistilOutput(log_probs, encoded_len, greedy, losses, metrics,
                            tch_last=tch_last if needs_teacher else None,
                            tch_feats=tch_feats if needs_teacher else None)
