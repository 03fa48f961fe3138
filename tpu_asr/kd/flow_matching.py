"""Flow-matching KD (FM-KT) module — TPU-native rebuild of the reference
FlowMatchingModule (asr_train.py:1220-1377).

Semantics reproduced exactly:
- Euler sampling loop `x <- x - v(x, t) / N` for t = N/N, (N-1)/N, ..., 1/N
  (asr_train.py:1318-1360), with the time embedding Linear(1 -> time_embed_dim)
  concatenated to the features on the channel axis.
- The training loss uses only the LAST iteration's velocity (t = 1/N):
  x_hat = (dalpha_dt * s_f - velocity) / (-dsigma_dt), then shape-transform and
  MSE (or cosine) against the teacher feature (asr_train.py:1362-1373).
- `cosine` loss: the reference calls torch CosineEmbeddingLoss without a target
  (would crash upstream); implemented here as mean(1 - cos_sim) over (B, T).

TPU-first design (vs. the reference's data-dependent Python loop):
- The Euler loop is a `flax.linen.scan` over a STATIC trip count `max_steps` with
  per-sample active masks: sample b with step count N_b only updates while
  j < N_b, and its "last velocity" is captured at j == N_b - 1. For a uniform
  static step count this is exactly the reference loop; for the dynamic router's
  per-sample counts (`group` strategy, asr_train.py:627-635) it reproduces the
  reference's per-group loops in one fixed-shape program (SURVEY.md §7.3).
- `group_loss=True` reproduces the reference's sum-of-per-group-MSE aggregation
  (one MSE per unique step count, summed) with a static K-way masked reduction.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_asr.config import FlowMatchingConfig
from tpu_asr.kd.meta_encoders import build_meta_encoder
from tpu_asr.kd.schedules import get_noise_schedule


def resolve_euler_backend(cfg: FlowMatchingConfig) -> str:
    """'pallas' = fused multi-step VMEM-resident kernel (ops/pallas_fm.py),
    implemented for the `mlp` meta encoder (the reference default and the
    only meta encoder that is a pure per-position map). 'auto' resolves to
    pallas on TPU when eligible; explicit 'pallas' with another meta encoder
    is a config error. On CPU an explicit 'pallas' runs the kernel in
    interpret mode (used by the parity tests and the multichip dryrun)."""
    backend = cfg.euler_backend
    if backend == "auto":
        return ("pallas" if (cfg.meta_encoder_type == "mlp"
                             and jax.default_backend() == "tpu") else "xla")
    if backend == "pallas" and cfg.meta_encoder_type != "mlp":
        raise ValueError(
            "euler_backend='pallas' implements only the 'mlp' meta encoder "
            f"(got meta_encoder_type={cfg.meta_encoder_type!r}); use 'xla'")
    return backend


class _DenseParams(nn.Module):
    """Raw (kernel, bias) under the same param paths/shapes/inits as
    nn.Dense — the fused-kernel path declares these so checkpoints are
    backend-interchangeable with the nn.scan path."""

    features: int
    d_in: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.d_in, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class _MLPMetaParams(nn.Module):
    """Param mirror of MLPMetaEncoder (fc1/fc2 Dense paths)."""

    in_dim: int
    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return (_DenseParams(self.hidden_dim, self.in_dim, name="fc1")(),
                _DenseParams(self.out_dim, self.hidden_dim, name="fc2")())


class _EulerMLPParams(nn.Module):
    """Param mirror of the scanned _EulerStep (time_embed + mlp meta
    encoder) for the fused kernel path: identical param tree to the
    nn.scan(variable_broadcast='params') layout."""

    cfg: FlowMatchingConfig

    @nn.compact
    def __call__(self):
        c = self.cfg
        te = _DenseParams(c.time_embed_dim, 1, name="time_embed")()
        mlp = _MLPMetaParams(c.student_dim + c.time_embed_dim, c.hidden_dim,
                             c.student_dim, name="meta_encoder")()
        return te, mlp


class _EulerStep(nn.Module):
    """One masked Euler iteration; scanned over j = 0..max_steps-1 with params
    broadcast (the meta encoder and time embedding are shared across iterations,
    like the single torch modules reused in the reference loop)."""

    cfg: FlowMatchingConfig
    dtype: Any
    train: bool

    @nn.compact
    def __call__(self, carry, j, steps_b):
        c = self.cfg
        x, last_v = carry
        b, t_len, _ = x.shape
        steps_f = steps_b.astype(jnp.float32)[:, None, None]        # (B,1,1)

        i_active = steps_f - j
        t_val = (i_active / steps_f).astype(x.dtype)
        t_full = jnp.broadcast_to(t_val, (b, t_len, 1))
        emb = nn.Dense(c.time_embed_dim, dtype=self.dtype, name="time_embed")(t_full)

        meta = build_meta_encoder(
            c.meta_encoder_type,
            in_dim=c.student_dim + c.time_embed_dim,
            out_dim=c.student_dim,
            hidden_dim=c.hidden_dim,
            n_heads=c.student_head_num,
            dtype=self.dtype,
        )
        velocity = meta(jnp.concatenate([x, emb], axis=-1), train=self.train)

        active = (j < steps_b)[:, None, None]
        x = jnp.where(active, x - velocity / steps_f.astype(x.dtype), x)
        last_v = jnp.where((j == steps_b - 1)[:, None, None], velocity, last_v)
        return (x, last_v), None


class FlowMatchingModule(nn.Module):
    cfg: FlowMatchingConfig
    dtype: Any = jnp.float32

    def _shape_transform(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        if c.shape_transform == "identity":
            return x
        if c.shape_transform == "linear":
            return nn.Dense(c.teacher_dim, dtype=self.dtype, name="shape_transform")(x)
        if c.shape_transform == "conv1d":
            return nn.Conv(c.teacher_dim, kernel_size=(1,), dtype=self.dtype,
                           name="shape_transform_conv")(x)
        raise ValueError(f"Unknown shape_transform type: {c.shape_transform}")

    def _metric_loss(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Elementwise loss map, later reduced by mean (or group-mean)."""
        c = self.cfg
        pred = pred.astype(jnp.float32)
        target = target.astype(jnp.float32)
        if c.loss == "mse":
            return jnp.square(pred - target)                        # (B, T, C)
        if c.loss == "cosine":
            num = jnp.sum(pred * target, axis=-1)
            den = jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(target, axis=-1)
            return (1.0 - num / jnp.maximum(den, 1e-8))[..., None]  # (B, T, 1)
        raise ValueError(f"Unknown loss type: {c.loss}")

    @nn.compact
    def __call__(
        self,
        s_f: jnp.ndarray,                    # (B, T, C_s) student feature
        t_f: Optional[jnp.ndarray] = None,   # (B, T, C_t) teacher feature
        steps: Any = None,                   # int | (B,) int array; default cfg sampling
        max_steps: Optional[int] = None,     # static Euler trip count (>= any steps)
        train: bool = False,
        group_loss: bool = False,
        loss_layers: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """`loss_layers=L` declares that the batch rows are L stacked encoder
        layers in B-MAJOR order (row = b * L + l, see
        DistilCTCModel._flow_matching_all_layers' fused path): the loss then
        reproduces the per-layer-summed aggregation of the vmap path — for
        the plain loss, sum_l mean_l == L * mean_all (equal-size layer
        slabs); for group_loss, groups are (layer, step-count) pairs."""
        c = self.cfg
        b, t_len, c_s = s_f.shape
        if steps is None:
            steps = c.training_sampling if train else c.inference_sampling
        static_steps = isinstance(steps, int)
        if max_steps is None:
            max_steps = steps if static_steps else c.router_max_sampling_steps
        steps_b = jnp.broadcast_to(jnp.asarray(steps, jnp.int32), (b,))
        steps_f = steps_b.astype(jnp.float32)[:, None, None]        # (B,1,1)

        x0 = s_f.astype(self.dtype)
        if resolve_euler_backend(c) == "pallas":
            # fused VMEM-resident multi-step kernel (mlp meta encoder);
            # identical param tree to the scan branch below
            from tpu_asr.ops.pallas_fm import fused_fm_euler
            (te_k, te_b), ((w1, b1), (w2, b2)) = \
                _EulerMLPParams(c, name="euler")()
            w1x, w1t = w1[:c.student_dim], w1[c.student_dim:]
            x, last_v = fused_fm_euler(
                x0, steps_b, w1x, te_k[0] @ w1t, te_b @ w1t + b1, w2, b2,
                max_steps=max_steps, compute_dtype=self.dtype,
                interpret=jax.default_backend() != "tpu")
        else:
            scan = nn.scan(
                _EulerStep,
                variable_broadcast="params",
                split_rngs={"params": False, "dropout": True},
                in_axes=(0, nn.broadcast),
            )
            (x, last_v), _ = scan(c, self.dtype, train, name="euler")(
                (x0, jnp.zeros_like(x0)),
                jnp.arange(max_steps, dtype=jnp.int32), steps_b)

        loss = jnp.zeros((), jnp.float32)
        if train and t_f is not None:
            _, schedule_deriv = get_noise_schedule(c.noise_schedule)
            t_last = 1.0 / steps_f                                  # (B,1,1) fp32
            dalpha_dt, dsigma_dt = schedule_deriv(t_last)
            x_hat = (dalpha_dt * s_f.astype(jnp.float32)
                     - last_v.astype(jnp.float32)) / (-dsigma_dt)
            transformed = self._shape_transform(x_hat.astype(self.dtype))
            err = self._metric_loss(transformed, t_f)               # (B,T,C')
            if group_loss and loss_layers is not None:
                # rows are B-major stacked layers: the reference's per-layer
                # group loop (asr_train.py:630-635) summed over layers ==
                # one segment-mean per (layer, step-count) pair. Group mean
                # over full group elements == mean of per-row means (equal
                # row sizes).
                per_row = jnp.mean(err.reshape(b, -1), axis=1)      # (B*L,)
                lay = jnp.arange(b, dtype=jnp.int32) % loss_layers
                seg = lay * (max_steps + 1) + jnp.minimum(steps_b, max_steps)
                n_seg = loss_layers * (max_steps + 1)
                sums = jax.ops.segment_sum(per_row, seg, n_seg)
                counts = jax.ops.segment_sum(jnp.ones((b,), jnp.float32),
                                             seg, n_seg)
                means = sums / jnp.maximum(counts, 1.0)
                loss = jnp.sum(jnp.where(counts > 0, means, 0.0))
            elif group_loss:
                # sum over unique step counts of the per-group MSE mean
                # (reference group loop, asr_train.py:630-635)
                per_elem = err.reshape(b, -1)
                elems_per_sample = per_elem.shape[1]
                loss = jnp.zeros((), jnp.float32)
                for k in range(1, max_steps + 1):
                    in_group = (steps_b == k).astype(jnp.float32)
                    count = jnp.sum(in_group)
                    group_sum = jnp.sum(per_elem * in_group[:, None])
                    group_mean = group_sum / jnp.maximum(count * elems_per_sample, 1.0)
                    loss = loss + jnp.where(count > 0, group_mean, 0.0)
            elif loss_layers is not None:
                loss = loss_layers * jnp.mean(err)
            else:
                loss = jnp.mean(err)
        return loss, x
