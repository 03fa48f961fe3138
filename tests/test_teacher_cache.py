"""Teacher-feature cache (TrainConfig.cache_teacher).

The frozen teacher consumes the UNAUGMENTED signal in eval mode
(reference asr_train.py:591-592), so its last-layer features are
deterministic per utterance. The cache must therefore be a pure
optimization: cached steps produce the SAME losses/updates as in-graph
teacher steps.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_asr.config import (DistillationConfig, OptimConfig, TrainConfig,
                            make_student_config)
from tpu_asr.models.distil_model import DistilCTCModel
from tpu_asr.train.optim import build_optimizer
from tpu_asr.train.trainer import DistilTrainState, make_distil_train_step

from tests.test_train import _setup


def _state(model, variables):
    tx = build_optimizer(OptimConfig(lr=1e-3, sched_name="none", d_model=16),
                         variables["params"])
    return DistilTrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx)


@pytest.mark.parametrize("distill", [
    DistillationConfig(use_logit_distillation=True, kd_alpha=0.3),
    DistillationConfig(use_layerwise_distillation=True,
                       layer_kd_scope="last", layer_kd_alpha=0.2),
])
def test_cached_step_matches_harvest_step(distill):
    """One harvest step == one cached step fed the harvested features:
    identical losses and identical parameter updates (fp32)."""
    model, variables, batch = _setup(distill=distill)
    rng = jax.random.PRNGKey(7)
    harvest = jax.jit(make_distil_train_step(model, harvest_teacher=True))
    cached = jax.jit(make_distil_train_step(model, cached_teacher=True))

    s1, m1, (tch_last, _tf, enc_len) = harvest(_state(model, variables), batch, rng)
    assert tch_last is not None and tch_last.shape[0] == batch["signal"].shape[0]

    batch2 = dict(batch)
    batch2["tch_last_feat"] = tch_last
    s2, m2 = cached(_state(model, variables), batch2, rng)

    for k in m1:
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("distill_mode", ["flow", "layer_all"])
def test_all_layer_cached_step_matches_harvest_step(distill_mode):
    """The ALL-layer cache (cached_all_layers / batch['tch_all_feat'])
    covers the KD modes the last-layer cache cannot: one harvest step ==
    one cached step fed the full (L, B, T', Dt) stack — identical losses
    and parameter updates (fp32)."""
    from tpu_asr.config import FlowMatchingConfig

    if distill_mode == "flow":
        flow = FlowMatchingConfig(meta_encoder_type="mlp", student_dim=16,
                                  teacher_dim=32, student_head_num=2,
                                  teacher_head_num=4, time_embed_dim=8,
                                  hidden_dim=16, training_sampling=2,
                                  inference_sampling=2)
        distill = DistillationConfig(use_logit_distillation=True,
                                     kd_alpha=0.3, use_flow_matching=True,
                                     flow=flow)
    else:
        distill = DistillationConfig(use_layerwise_distillation=True,
                                     layer_kd_scope="all",
                                     layer_kd_alpha=0.2)
    model, variables, batch = _setup(distill=distill)
    rng = jax.random.PRNGKey(7)
    harvest = jax.jit(make_distil_train_step(model, harvest_teacher=True,
                                             harvest_all=True))
    cached = jax.jit(make_distil_train_step(model, cached_all_layers=True))

    s1, m1, (tch_last, tch_feats, enc_len) = harvest(
        _state(model, variables), batch, rng)
    assert tch_feats is not None
    assert tch_feats.shape[1] == batch["signal"].shape[0]

    batch2 = dict(batch)
    # batch-major (B, L, T', Dt): the dp-sharded feed splits on axis 0
    batch2["tch_all_feat"] = jnp.transpose(tch_feats, (1, 0, 2, 3))
    s2, m2 = cached(_state(model, variables), batch2, rng)

    for k in m1:
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_trainer_fit_cache_teacher_all_equivalence(tmp_path):
    """Trainer.fit with cache_teacher_all (disk spill dir) over a flowkd
    config == the uncached run: identical final params (fp32), per-utt .npy
    files written, cached step exercised in epoch 1."""
    from tests.test_loop import corpus as _unused  # noqa: F401
    from tests.test_loop import _small_cfg, TEXTS
    from tpu_asr.data.audio import write_wav
    from tpu_asr.data.manifest import ManifestEntry, write_manifest
    from tpu_asr.data.tokenizer import train_bpe
    from tpu_asr.config import DataConfig, FlowMatchingConfig
    from tpu_asr.train.loop import Trainer

    root = tmp_path / "corpus"
    root.mkdir()
    rng = np.random.default_rng(0)
    entries = []
    for i, text in enumerate(TEXTS):
        dur = 0.8 + 0.1 * i
        x = (rng.normal(size=int(16000 * dur)) * 0.1).astype(np.float32)
        p = root / f"utt{i}.wav"
        write_wav(p, x, 16000)
        entries.append(ManifestEntry(str(p), dur, text))
    man = root / "train.jsonl"
    write_manifest(man, entries)
    tok = train_bpe(TEXTS * 5, vocab_size=48)

    teacher_cfg = _small_cfg(48)
    student_cfg = make_student_config(teacher_cfg)
    flow = FlowMatchingConfig(meta_encoder_type="mlp", student_dim=16,
                              teacher_dim=32, student_head_num=2,
                              teacher_head_num=4, time_embed_dim=8,
                              hidden_dim=16, training_sampling=2,
                              inference_sampling=2)
    distill = DistillationConfig(use_logit_distillation=True, kd_alpha=0.3,
                                 use_flow_matching=True, flow=flow)

    def run(cache: bool, workdir):
        model = DistilCTCModel(student_cfg, teacher_cfg, distill)
        cfg = TrainConfig(
            model=student_cfg, distillation=distill,
            optim=OptimConfig(lr=1e-3, sched_name="none", d_model=16),
            train_ds=DataConfig(batch_size=3, shuffle=False),
            max_epochs=2, cache_teacher_all=cache,
            cache_teacher_dir=str(workdir / "tcache") if cache else None,
            dp_size=1)
        trainer = Trainer(model, cfg, tok, workdir, log_every=100)
        n_cached = 0
        if cache:
            orig = trainer._train_step_cached

            def counting(*a, **kw):
                nonlocal n_cached
                n_cached += 1
                return orig(*a, **kw)

            trainer._train_step_cached = counting
        state = trainer.fit(str(man), rng_seed=0)
        return state, trainer, n_cached

    s_off, _, _ = run(False, tmp_path / "off")
    s_on, tr_on, n_cached = run(True, tmp_path / "on")

    spill = list((tmp_path / "on" / "tcache").glob("*.npy"))
    assert len(spill) == len(TEXTS)
    assert n_cached > 0, "all-layer cached step never ran in epoch 1"
    assert int(s_on.step) == int(s_off.step)
    for a, b in zip(jax.tree.leaves(s_off.params),
                    jax.tree.leaves(s_on.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_cache_bf16_storage_no_fp16_overflow(tmp_path):
    """Under bf16 compute the cache stores ml_dtypes.bfloat16, NOT fp16:
    mid-stack residual features are unnormalized and can exceed fp16's
    65504 max. Round-trips exactly through the disk spill (where .npy
    loads bf16 back as raw void2 — the view fix)."""
    import ml_dtypes

    from tpu_asr.train.loop import TeacherFeatureCache

    cache = TeacherFeatureCache(ml_dtypes.bfloat16, all_layers=True,
                                spill_dir=str(tmp_path / "spill"))
    # values far beyond fp16 range, representable in bf16
    feats = (np.arange(2 * 3 * 4 * 2, dtype=np.float32)
             .reshape(2, 3, 4, 2) * 1e5 + 1e5)          # (L, B, T, D)
    feats_bf = feats.astype(ml_dtypes.bfloat16).astype(np.float32)
    cache.put_batch([10, 11], feats, lengths=[4, 3], l_pad=8000)
    out = cache.assemble([10, 11], t_prime=4, d_t=2)    # (B, L, T, D)
    assert out.dtype == ml_dtypes.bfloat16
    outf = out.astype(np.float32)
    assert np.all(np.isfinite(outf))
    np.testing.assert_array_equal(outf[0], feats_bf[:, 0])
    np.testing.assert_array_equal(outf[1, :, :3], feats_bf[:, 1, :3])
    assert np.all(outf[1, :, 3] == 0)                   # padded frame


def test_cached_step_rejects_fm():
    from tpu_asr.config import FlowMatchingConfig, RouterConfig

    flow = FlowMatchingConfig(meta_encoder_type="mlp", student_dim=16,
                              teacher_dim=32, time_embed_dim=8, hidden_dim=16,
                              training_sampling=2, inference_sampling=2)
    distill = DistillationConfig(use_flow_matching=True, flow=flow)
    model, variables, batch = _setup(distill=distill)
    batch["tch_last_feat"] = jnp.zeros((2, 51, 32), jnp.float32)
    step = make_distil_train_step(model, cached_teacher=True)
    with pytest.raises(ValueError):
        step(_state(model, variables), batch, jax.random.PRNGKey(0))


def test_trainer_fit_cache_teacher_equivalence(tmp_path):
    """Two epochs of Trainer.fit with cache_teacher on vs off give the same
    final parameters (fp32 compute: the cache stores fp32 — exact), and the
    cached step actually runs in epoch 1."""
    from tests.test_loop import corpus as _unused  # noqa: F401  (fixture dep)
    from tests.test_loop import _small_cfg, TEXTS
    from tpu_asr.data.audio import write_wav
    from tpu_asr.data.manifest import ManifestEntry, write_manifest
    from tpu_asr.data.tokenizer import train_bpe
    from tpu_asr.config import DataConfig
    from tpu_asr.train.loop import Trainer

    root = tmp_path / "corpus"
    root.mkdir()
    rng = np.random.default_rng(0)
    entries = []
    for i, text in enumerate(TEXTS):
        dur = 0.8 + 0.1 * i
        x = (rng.normal(size=int(16000 * dur)) * 0.1).astype(np.float32)
        p = root / f"utt{i}.wav"
        write_wav(p, x, 16000)
        entries.append(ManifestEntry(str(p), dur, text))
    man = root / "train.jsonl"
    write_manifest(man, entries)
    tok = train_bpe(TEXTS * 5, vocab_size=48)

    teacher_cfg = _small_cfg(48)
    student_cfg = make_student_config(teacher_cfg)
    distill = DistillationConfig(use_logit_distillation=True, kd_alpha=0.3)

    def run(cache: bool, workdir):
        model = DistilCTCModel(student_cfg, teacher_cfg, distill)
        cfg = TrainConfig(
            model=student_cfg, distillation=distill,
            optim=OptimConfig(lr=1e-3, sched_name="none", d_model=16),
            train_ds=DataConfig(batch_size=3, shuffle=False),
            max_epochs=2, cache_teacher=cache, dp_size=1)
        trainer = Trainer(model, cfg, tok, workdir, log_every=100)
        n_cached = 0
        if cache:
            orig = trainer._train_step_cached

            def counting(*a, **kw):
                nonlocal n_cached
                n_cached += 1
                return orig(*a, **kw)

            trainer._train_step_cached = counting
        state = trainer.fit(str(man), rng_seed=0)
        return state, trainer, n_cached

    s_off, _, _ = run(False, tmp_path / "off")
    s_on, tr_on, n_cached = run(True, tmp_path / "on")

    assert len(tr_on._cache.data) == len(TEXTS)
    assert n_cached > 0, "cached step never ran in epoch 1"
    assert int(s_on.step) == int(s_off.step)
    for a, b in zip(jax.tree.leaves(s_off.params),
                    jax.tree.leaves(s_on.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_trainer_rejects_cache_with_fm_or_spd(tmp_path):
    from tpu_asr.config import (DataConfig, FlowMatchingConfig)
    from tpu_asr.train.loop import Trainer
    from tpu_asr.data.tokenizer import train_bpe
    from tests.test_loop import _small_cfg, TEXTS

    teacher_cfg = _small_cfg(48)
    student_cfg = make_student_config(teacher_cfg)
    tok = train_bpe(TEXTS, vocab_size=48)
    flow = FlowMatchingConfig(meta_encoder_type="mlp", student_dim=16,
                              teacher_dim=32, time_embed_dim=8,
                              hidden_dim=16, training_sampling=2,
                              inference_sampling=2)
    fm = DistillationConfig(use_flow_matching=True, flow=flow)
    cfg = TrainConfig(model=student_cfg, distillation=fm,
                      optim=OptimConfig(d_model=16),
                      train_ds=DataConfig(batch_size=2),
                      cache_teacher=True, dp_size=1)
    with pytest.raises(ValueError):
        Trainer(DistilCTCModel(student_cfg, teacher_cfg, fm), cfg, tok,
                tmp_path / "a")

    lk = DistillationConfig(use_logit_distillation=True)
    cfg2 = dataclasses.replace(cfg, distillation=lk, steps_per_dispatch=2)
    with pytest.raises(ValueError):
        Trainer(DistilCTCModel(student_cfg, teacher_cfg, lk), cfg2, tok,
                tmp_path / "b")
