"""Pipeline parallelism for the conformer layer stack (GPipe-style
microbatch pipelining over a 'pipe' mesh axis, expressed TPU-natively).

The reference inventories Megatron pipeline parallelism but never exercises
it for ASR (SURVEY.md §2.4). Here PP exists for the scale rows of the
reference size table (Large 121 M, XLarge 635 M — conformer_ctc_bpe.yaml:
7-18) and is built the TPU way — no per-stage processes, no send/recv
threads:

- The encoder's layers are ALREADY stacked `(L, ...)` (the `nn.scan`
  encoder). Sharding that leading axis over a `pipe` mesh axis IS the stage
  assignment: stage s holds layers [s*L/S, (s+1)*L/S).
- One `jax.shard_map` manual ONLY over 'pipe' (`axis_names={'pipe'}`) runs
  the classic GPipe schedule as a `lax.scan` over M + S - 1 ticks: every
  stage applies its local layers to its in-flight microbatch, then a single
  `ppermute` ring-shifts activations to the next stage. 'data' (and
  'model') stay in GSPMD auto mode, so batch sharding and the tensor-
  parallel rules (parallel/sharding.py) compose with the pipeline body
  unchanged — dp x pp x tp on one mesh.
- Warmup/drain bubbles are the standard (S-1)/(M+S-1) fraction; stages
  compute on zero/stale microbatches during them and the results are simply
  never written. The whole schedule (fwd AND the reverse-pipeline bwd,
  which jax derives by transposing the scan + ppermute) is one XLA program.

Scope: the regular encode path (no streaming caches, no packed segments).
Deterministic compute only — dropout must be 0 when train=True and the conv
module must use layer_norm (BatchNorm batch-stats mutation across stages is
a host-level concern PP does not need at these model sizes).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_asr.config import EncoderConfig


def make_pp_mesh(dp_size: int = 1, pp_size: int = 2, tp_size: int = 1,
                 devices: Optional[Any] = None) -> Mesh:
    """('data', 'pipe') or ('data', 'pipe', 'model') mesh."""
    devices = list(devices if devices is not None else jax.devices())
    n = dp_size * pp_size * tp_size
    assert n <= len(devices), f"mesh {dp_size}x{pp_size}x{tp_size} > {len(devices)}"
    devices = devices[:n]
    if tp_size == 1:
        return Mesh(np.asarray(devices).reshape(dp_size, pp_size),
                    ("data", "pipe"))
    return Mesh(np.asarray(devices).reshape(dp_size, pp_size, tp_size),
                ("data", "pipe", "model"))


class _LayerStack(nn.Module):
    """A slice of the encoder's scanned ConformerLayer stack: applies
    `n_layers` stacked layers (the per-stage compute of the pipeline).
    Param tree: {'layers': <stacked slice>} — the SAME paths as the full
    encoder's scan, so stage params are literally the encoder's stacked
    params sharded over 'pipe' on their leading axis."""

    cfg: EncoderConfig
    dtype: Any
    n_layers: int
    train: bool = False
    collect: bool = False   # also return the (n_layers, ...) feature stack

    @nn.compact
    def __call__(self, x, pos_emb, mask):
        from tpu_asr.models.conformer import ConformerLayer

        layer = ConformerLayer(self.cfg, self.dtype, name="layers")
        collect = self.collect

        def body(mod, carry, _):
            y = mod(carry, pos_emb, mask, train=self.train)
            return y, (y if collect else None)

        scanned = nn.scan(
            body,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True, "layerdrop": True},
            length=self.n_layers,
        )
        y, feats = scanned(layer, x, None)
        return (y, feats) if collect else y


def _pre_encoder_dropout(x, drng, rate):
    """Pre-encoder dropout for the pipelined encode paths (shared so the
    CTC and KD pipelines cannot drift). 0x7E5C0DE: a fold level no
    (microbatch, stage) derivation reaches."""
    keep = jax.random.bernoulli(jax.random.fold_in(drng, 0x7E5C0DE),
                                1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _stage_apply(stack, vs, xs, pos_emb, ms, key):
    """Apply a stage, wiring the per-(stage, microbatch) dropout key the
    pipeline derives; nn.scan's split_rngs then gives each LOCAL layer its
    own stream."""
    if key is None:
        return stack.apply(vs, xs, pos_emb, ms)
    return stack.apply(vs, xs, pos_emb, ms,
                       rngs={"dropout": key,
                             "layerdrop": jax.random.fold_in(key, 1)})


def pipeline_layer_stack(apply_stage, stage_variables, x_micro, mask_micro,
                         mesh: Mesh, pipe_axis: str = "pipe",
                         dropout_rng=None):
    """Run `apply_stage` as an S-stage pipeline over `pipe_axis`.

    apply_stage(stage_variables_local, x (mb, T, D), mask (mb, T), rng) ->
    y — the per-stage compute; `stage_variables` leaves are stacked (L, ...)
    and get sharded over `pipe_axis` on axis 0 (L % S must be 0).
    x_micro (M, mb, T, D) / mask_micro (M, mb, T): M microbatches.
    Returns (M, mb, T, D) outputs, replicated over `pipe_axis` (psum of the
    last stage's buffer; a production serving layout would keep it
    stage-local — this keeps the API mesh-agnostic).

    `dropout_rng` (per-microbatch RNG plumbing): each tick derives
    fold_in(fold_in(rng, microbatch), stage) so every (stage, microbatch)
    gets an independent stream — real-dropout pipelined TRAINING; None
    keeps the deterministic-compute contract (rng arg arrives as None).
    """
    n_stages = mesh.shape[pipe_axis]
    n_micro = x_micro.shape[0]

    def stage_fn(variables, xm, mm, rng):
        s = jax.lax.axis_index(pipe_axis)
        last = n_stages - 1

        def tick(carry, step):
            x_c, m_c, buf = carry
            idx = jnp.clip(step, 0, n_micro - 1)
            inj = jax.lax.dynamic_index_in_dim(xm, idx, 0, keepdims=False)
            inj_m = jax.lax.dynamic_index_in_dim(mm, idx, 0, keepdims=False)
            # stage 0 consumes the next microbatch; others, the ring input
            x_in = jnp.where(s == 0, inj, x_c)
            m_in = jnp.where(s == 0, inj_m, m_c)
            if rng is not None:
                mi = jnp.clip(step - s, 0, n_micro - 1)
                key = jax.random.fold_in(jax.random.fold_in(rng, mi), s)
            else:
                key = None
            y = apply_stage(variables, x_in, m_in, key)
            # ring-shift to the next stage (stage `last` sends nowhere;
            # stage 0 receives zeros, which it overwrites with `inj`)
            perm = [(i, i + 1) for i in range(n_stages - 1)]
            x_n = jax.lax.ppermute(y, pipe_axis, perm)
            m_n = jax.lax.ppermute(m_in.astype(jnp.int8), pipe_axis,
                                   perm).astype(bool)
            # the last stage emits microbatch step-(S-1) at this tick
            out_idx = step - last
            oi = jnp.clip(out_idx, 0, n_micro - 1)
            write = (s == last) & (out_idx >= 0)
            prev = jax.lax.dynamic_index_in_dim(buf, oi, 0, keepdims=False)
            buf = jax.lax.dynamic_update_index_in_dim(
                buf, jnp.where(write, y, prev), oi, 0)
            return (x_n, m_n, buf), None

        buf0 = jnp.zeros_like(xm)
        carry0 = (jnp.zeros_like(xm[0]), mm[0], buf0)
        (_, _, buf), _ = jax.lax.scan(
            tick, carry0, jnp.arange(n_micro + n_stages - 1))
        # only the last stage wrote into buf; psum broadcasts it everywhere
        return jax.lax.psum(buf, pipe_axis)

    var_specs = jax.tree.map(lambda _: P(pipe_axis), stage_variables)
    fn = jax.shard_map(
        stage_fn, mesh=mesh, axis_names={pipe_axis},
        in_specs=(var_specs, P(), P(), P()), out_specs=P(),
        check_vma=False)
    return fn(stage_variables, x_micro, mask_micro, dropout_rng)


def pipeline_layer_stack_feats(apply_stage, stage_variables, x_micro,
                               mask_micro, mesh: Mesh, n_local: int,
                               pipe_axis: str = "pipe", dropout_rng=None):
    """Feature-collecting variant of `pipeline_layer_stack` for the KD
    pipeline: `apply_stage(vars, x, m, rng) -> (y, feats)` with `feats`
    (n_local, mb, T, D) = this stage's per-layer outputs. Each stage writes
    its layers' features for microbatch m at the tick it processes it; the
    per-stage buffers concatenate over `pipe_axis` into the full
    (M, L, mb, T, D) stack (stage-major == layer order). The global encoder
    output is the stack's last layer, so no separate output psum is needed.
    """
    n_stages = mesh.shape[pipe_axis]
    n_micro = x_micro.shape[0]

    def stage_fn(variables, xm, mm, rng):
        s = jax.lax.axis_index(pipe_axis)

        def tick(carry, step):
            x_c, m_c, fbuf = carry
            idx = jnp.clip(step, 0, n_micro - 1)
            inj = jax.lax.dynamic_index_in_dim(xm, idx, 0, keepdims=False)
            inj_m = jax.lax.dynamic_index_in_dim(mm, idx, 0, keepdims=False)
            x_in = jnp.where(s == 0, inj, x_c)
            m_in = jnp.where(s == 0, inj_m, m_c)
            if rng is not None:
                mi2 = jnp.clip(step - s, 0, n_micro - 1)
                key = jax.random.fold_in(jax.random.fold_in(rng, mi2), s)
            else:
                key = None
            y, feats = apply_stage(variables, x_in, m_in, key)
            perm = [(i, i + 1) for i in range(n_stages - 1)]
            x_n = jax.lax.ppermute(y, pipe_axis, perm)
            m_n = jax.lax.ppermute(m_in.astype(jnp.int8), pipe_axis,
                                   perm).astype(bool)
            # stage s processes microbatch (step - s) at this tick
            mi = step - s
            fi = jnp.clip(mi, 0, n_micro - 1)
            write = (mi >= 0) & (mi < n_micro)
            prev = jax.lax.dynamic_index_in_dim(fbuf, fi, 0, keepdims=False)
            fbuf = jax.lax.dynamic_update_index_in_dim(
                fbuf, jnp.where(write, feats, prev), fi, 0)
            return (x_n, m_n, fbuf), None

        fbuf0 = jnp.zeros((n_micro, n_local) + xm.shape[1:], xm.dtype)
        carry0 = (jnp.zeros_like(xm[0]), mm[0], fbuf0)
        (_, _, fbuf), _ = jax.lax.scan(
            tick, carry0, jnp.arange(n_micro + n_stages - 1))
        return fbuf

    var_specs = jax.tree.map(lambda _: P(pipe_axis), stage_variables)
    fn = jax.shard_map(
        stage_fn, mesh=mesh, axis_names={pipe_axis},
        in_specs=(var_specs, P(), P(), P()),
        out_specs=P(None, pipe_axis), check_vma=False)
    return fn(stage_variables, x_micro, mask_micro, dropout_rng)


def apply_pp_sharding(params, mesh: Mesh, encoder_path: str = "student"):
    """device_put a DistilCTCModel (or CTCModel) param tree for a
    ('data', 'pipe'[, 'model']) mesh — the dp x pp x tp composition in ONE
    program: the pipelined encoder's stacked layer params shard over 'pipe'
    on their leading (L) axis AND (when the mesh has a 'model' axis) the
    attention/FF/decoder weight dims shard by the tensor-parallel rules
    (parallel/sharding.py TP_RULES); everything else replicates. The batch
    stays on 'data' (caller's device_put)."""
    from tpu_asr.parallel.sharding import _path_names, _spec_for

    tp = mesh.shape.get("model", 1) if "model" in mesh.axis_names else 1

    def leaf(path, x):
        names = _path_names(path)
        shape = getattr(x, "shape", ())
        spec_t = tuple(_spec_for(names, shape, tp))
        if len(spec_t) < len(shape):
            spec_t = (None,) * (len(shape) - len(spec_t)) + spec_t
        if ("layers" in names and "encoder" in names
                and (encoder_path in names or encoder_path == "")
                and len(shape) >= 1):
            spec_t = ("pipe",) + tuple(spec_t[1:])
        return jax.device_put(x, NamedSharding(mesh, P(*spec_t)))

    return jax.tree_util.tree_map_with_path(leaf, params)


def _check_cfg(cfg: EncoderConfig, train: bool,
               have_rng: bool = False) -> None:
    if train and not have_rng and (cfg.dropout > 0 or cfg.dropout_att > 0
                                   or cfg.dropout_pre_encoder > 0):
        raise ValueError("pipelined training with dropout needs a "
                         "dropout rng (pass rngs={'dropout': key}); "
                         "without one, set the dropout rates to 0")
    if train and cfg.stochastic_depth_drop_prob > 0:
        raise ValueError("stochastic depth is not supported in the "
                         "pipelined encode path")
    if train and cfg.conv_norm_type == "batch_norm":
        raise ValueError("pipelined training requires "
                         "conv_norm_type='layer_norm' (BN batch-stats "
                         "mutation is not pipelined)")
    if cfg.reduction is not None and cfg.reduction_factor > 1:
        raise ValueError("mid-stack reduction cannot be pipelined "
                         "(changes T between stages)")
    if getattr(cfg, "feat_out", -1) > 0 and cfg.feat_out != cfg.d_model:
        raise ValueError("feat_out projection not supported in the "
                         "pipelined encode path")


def encode_pipelined(model, variables, features, lengths, mesh: Mesh,
                     n_micro: int, train: bool = False, rngs=None):
    """Full ConformerEncoder forward with the layer stack pipelined over the
    mesh's 'pipe' axis. `model` is a CTCModel (its `pre_encode` split point
    provides the subsampling front half); pre/post-stack work runs in GSPMD
    auto mode (batch over 'data'). Returns (encoded (B,T',D), out_len (B,)).

    Parity contract: identical math to `model.encoder(features, lengths)`
    for deterministic passes (tests/test_pipeline.py pins it on the virtual
    mesh).
    """
    from tpu_asr.models.conformer import rel_positional_encoding
    from tpu_asr.models.ctc_model import CTCModel

    cfg = model.cfg.encoder
    drng = (rngs or {}).get("dropout")
    _check_cfg(cfg, train, have_rng=drng is not None)
    n_stages = mesh.shape["pipe"]
    if cfg.n_layers % n_stages:
        raise ValueError(f"n_layers={cfg.n_layers} not divisible by "
                         f"pipe={n_stages}")
    dtype = jnp.dtype(model.cfg.compute_dtype)

    x, out_len = model.apply(variables, features, lengths,
                             method=CTCModel.pre_encode)
    b, t, d = x.shape
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by n_micro={n_micro}")
    if cfg.xscaling:
        x = x * math.sqrt(cfg.d_model)
    pos_emb = rel_positional_encoding(t, cfg.d_model, dtype)
    mask = jnp.arange(t)[None, :] < out_len[:, None]
    x = jnp.where(mask[..., None], x, 0.0)
    if train and cfg.dropout_pre_encoder > 0 and drng is not None:
        x = _pre_encoder_dropout(x, drng, cfg.dropout_pre_encoder)

    mb = b // n_micro
    x_micro = x.reshape(n_micro, mb, t, d)
    mask_micro = mask.reshape(n_micro, mb, t)

    stack = _LayerStack(cfg, dtype, cfg.n_layers // n_stages, train=train)
    enc_vars = variables["params"]["encoder"]
    stage_vars = {"params": {"layers": enc_vars["layers"]}}
    if "batch_stats" in variables and "encoder" in variables["batch_stats"]:
        bs = variables["batch_stats"]["encoder"]
        if "layers" in bs:
            stage_vars["batch_stats"] = {"layers": bs["layers"]}

    def apply_stage(vs, xs, ms, key):
        return _stage_apply(stack, vs, xs, pos_emb, ms, key)

    y_micro = pipeline_layer_stack(apply_stage, stage_vars, x_micro,
                                   mask_micro, mesh, dropout_rng=drng)
    return y_micro.reshape(b, t, d), out_len


def encode_pipelined_feats(model, variables, features, lengths, mesh: Mesh,
                           n_micro: int, train: bool = False, rngs=None):
    """`encode_pipelined` variant that ALSO returns the full per-layer
    feature stack (L, B, T', D) — the KD losses' input. Same parity
    contract; the encoder output is the stack's last layer."""
    from tpu_asr.models.conformer import rel_positional_encoding
    from tpu_asr.models.ctc_model import CTCModel

    cfg = model.cfg.encoder
    drng = (rngs or {}).get("dropout")
    _check_cfg(cfg, train, have_rng=drng is not None)
    n_stages = mesh.shape["pipe"]
    if cfg.n_layers % n_stages:
        raise ValueError(f"n_layers={cfg.n_layers} not divisible by "
                         f"pipe={n_stages}")
    dtype = jnp.dtype(model.cfg.compute_dtype)

    x, out_len = model.apply(variables, features, lengths,
                             method=CTCModel.pre_encode)
    b, t, d = x.shape
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by n_micro={n_micro}")
    if cfg.xscaling:
        x = x * math.sqrt(cfg.d_model)
    pos_emb = rel_positional_encoding(t, cfg.d_model, dtype)
    mask = jnp.arange(t)[None, :] < out_len[:, None]
    x = jnp.where(mask[..., None], x, 0.0)
    if train and cfg.dropout_pre_encoder > 0 and drng is not None:
        x = _pre_encoder_dropout(x, drng, cfg.dropout_pre_encoder)

    mb = b // n_micro
    x_micro = x.reshape(n_micro, mb, t, d)
    mask_micro = mask.reshape(n_micro, mb, t)

    n_local = cfg.n_layers // n_stages
    stack = _LayerStack(cfg, dtype, n_local, train=train, collect=True)
    enc_vars = variables["params"]["encoder"]
    stage_vars = {"params": {"layers": enc_vars["layers"]}}
    if "batch_stats" in variables and "encoder" in variables["batch_stats"]:
        bs = variables["batch_stats"]["encoder"]
        if "layers" in bs:
            stage_vars["batch_stats"] = {"layers": bs["layers"]}

    def apply_stage(vs, xs, ms, key):
        return _stage_apply(stack, vs, xs, pos_emb, ms, key)

    f_micro = pipeline_layer_stack_feats(apply_stage, stage_vars, x_micro,
                                         mask_micro, mesh, n_local,
                                         dropout_rng=drng)
    # (M, L, mb, T, D) -> (L, B, T, D); microbatch m holds rows m*mb..+mb
    n_l = cfg.n_layers
    layer_feats = jnp.transpose(f_micro, (1, 0, 2, 3, 4)).reshape(
        n_l, b, t, d)
    return layer_feats[-1], out_len, layer_feats


def distil_forward_pipelined(model, variables, signal, signal_len,
                             transcripts, transcript_lengths, mesh: Mesh,
                             n_micro: int, rngs=None, train: bool = True):
    """Full `DistilCTCModel` KD forward with the STUDENT encoder stack
    pipelined over the mesh's 'pipe' axis — the reference's DDP KD training
    step (asr_train.py:1708-1715) at pipeline scale, TPU-natively: the
    frozen teacher forward, every KD loss (flow matching + router, logit
    KL, layerwise MSE, DiffKD, diffm) and the CTC head all run in GSPMD
    auto mode (batch over 'data') on the student's pipelined per-layer
    features, reusing `forward_with_student_encode` verbatim.

    Training randomness (round 5): when `rngs` carries 'dropout'/'specaug'
    keys, the pipeline derives an independent stream per (stage,
    microbatch) via fold_in — real dropout, dither and specaug in the
    pipelined step (matching the reference DDP step's regularization);
    without rngs the deterministic-compute contract applies (dropout must
    be 0, featurization eval-mode). conv must stay layer_norm either way
    (BN batch-stats mutation is not pipelined).
    Returns DistilOutput."""
    from tpu_asr.models.ctc_model import CTCModel
    from tpu_asr.models.distil_model import DistilCTCModel
    from tpu_asr.ops.features import FilterbankFeatures
    from tpu_asr.ops.specaug import spec_augment

    stu_model = CTCModel(model.student_cfg)
    stu_vars = {"params": variables["params"]["student"]}
    if "batch_stats" in variables and "student" in variables["batch_stats"]:
        stu_vars["batch_stats"] = variables["batch_stats"]["student"]
    feat = FilterbankFeatures(model.student_cfg.preprocessor)
    srng = (rngs or {}).get("specaug")
    aug = train and srng is not None
    feats, feat_len = feat(signal, signal_len, train=aug, rng=srng)
    if aug and model.student_cfg.spec_augment is not None:
        feats = spec_augment(feats, feat_len,
                             model.student_cfg.spec_augment,
                             jax.random.fold_in(srng, 1))
    encoded, out_len, stu_feats = encode_pipelined_feats(
        stu_model, stu_vars, feats, feat_len, mesh, n_micro, train=train,
        rngs=rngs)
    return model.apply(
        variables, encoded, out_len, stu_feats, signal, signal_len,
        transcripts, transcript_lengths, train=train,
        method=DistilCTCModel.forward_with_student_encode,
        rngs=rngs or {})


def ctc_forward_pipelined(model, variables, signal, signal_len, mesh: Mesh,
                          n_micro: int):
    """Featurize -> pipelined encode -> decode: the CTCModel eval forward
    with the encoder stack pipelined. Returns (log_probs, encoded_len)."""
    from tpu_asr.models.ctc_model import CTCModel
    from tpu_asr.ops.features import FilterbankFeatures

    feat = FilterbankFeatures(model.cfg.preprocessor)
    feats, feat_len = feat(signal, signal_len, train=False, rng=None)
    encoded, out_len = encode_pipelined(model, variables, feats, feat_len,
                                        mesh, n_micro)
    log_probs = model.apply(variables, encoded,
                            method=CTCModel.decode_logits)
    return log_probs, out_len
