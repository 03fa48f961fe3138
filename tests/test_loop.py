"""End-to-end fast_dev_run-style test (SURVEY.md §4 tier 3): synthetic wav
corpus -> manifest -> tokenizer -> KD Trainer.fit (few steps on the 8-device
mesh) -> checkpoint -> resume -> evaluate WER. Mirrors the reference's
`--test_mode` smoke path (asr_train.py:1663-1681) without network/data deps.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from tpu_asr.config import (DataConfig, DecoderConfig, DistillationConfig,
                            EncoderConfig, ModelConfig, OptimConfig,
                            PreprocessorConfig, TrainConfig,
                            make_student_config)
from tpu_asr.data.manifest import ManifestEntry, write_manifest
from tpu_asr.data.audio import write_wav
from tpu_asr.data.tokenizer import train_bpe
from tpu_asr.models.distil_model import DistilCTCModel
from tpu_asr.train.loop import Trainer
from tpu_asr.utils.checkpoint import (export_student, load_student,
                                      restore_train_state, rotate_last,
                                      save_train_state)


TEXTS = ["the cat sat", "a dog ran fast", "hello world again",
         "speech is fun", "jax on tpu", "the quick brown fox"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
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
    return root, str(man), tok


def _small_cfg(vocab_size):
    teacher = ModelConfig(
        preprocessor=PreprocessorConfig(features=24),
        spec_augment=None,
        encoder=EncoderConfig(feat_in=24, n_layers=2, d_model=32, n_heads=4,
                              conv_kernel_size=7, conv_norm_type="layer_norm",
                              dropout=0.0, dropout_pre_encoder=0.0,
                              dropout_att=0.0),
        decoder=DecoderConfig(feat_in=32, num_classes=vocab_size),
        compute_dtype="float32",
    )
    return teacher


def test_trainer_fit_checkpoint_resume_eval(corpus, tmp_path):
    root, manifest, tok = corpus
    teacher_cfg = _small_cfg(tok.vocab_size)
    student_cfg = make_student_config(teacher_cfg)
    distill = DistillationConfig(use_logit_distillation=True, kd_alpha=0.1)
    model = DistilCTCModel(student_cfg, teacher_cfg, distill)

    cfg = TrainConfig(
        model=student_cfg, distillation=distill,
        optim=OptimConfig(lr=1e-3, sched_name="none", d_model=16,
                          gradient_clip_val=1.0),
        train_ds=DataConfig(batch_size=3, num_buckets=2, max_duration=2.0,
                            seed=0),
        test_ds=DataConfig(batch_size=3, num_buckets=2, max_duration=2.0,
                           shuffle=False),
        max_epochs=2, dp_size=1)

    workdir = tmp_path / "run1"
    trainer = Trainer(model, cfg, tok, workdir, log_every=1)
    import signal
    before = signal.getsignal(signal.SIGTERM)
    state = trainer.fit(manifest, max_steps=4)
    # the preemption hook must not leak past fit (a leaked handler turns any
    # later SIGTERM into a checkpoint-save-and-exit inside unrelated code)
    assert signal.getsignal(signal.SIGTERM) is before
    assert int(state.step) == 4
    assert (workdir / "checkpoints" / "last").exists()
    assert (workdir / "metrics.jsonl").exists()
    rows = [json.loads(l) for l in open(workdir / "metrics.jsonl")]
    assert any("loss/total" in r for r in rows)

    # evaluate produces a finite WER
    metrics = trainer.evaluate(manifest)
    assert metrics["num_utts"] == len(TEXTS)
    assert 0.0 <= metrics["wer"] <= 3.0

    # resume continues the step counter
    import jax
    from tpu_asr.data.dataset import AudioToBPEDataset, make_dataloader

    trainer2 = Trainer(model, cfg, tok, workdir, log_every=10)
    ds = AudioToBPEDataset(manifest, tok, 16000, 0.1, 2.0)
    first = next(iter(make_dataloader(ds, cfg.train_ds, epoch=0)))
    trainer2.init_state(first)
    trainer2.state = restore_train_state(workdir / "checkpoints", trainer2.state)
    assert int(trainer2.state.step) == 4

    # student-only export loads back into a bare student template
    export_student(workdir / "checkpoints", trainer2.state, student_cfg)
    params, stats = load_student(workdir / "checkpoints" / "student",
                                 trainer2.state.params["student"])
    leaves_a = jax.tree.leaves(params)
    leaves_b = jax.tree.leaves(trainer2.state.params["student"])
    assert len(leaves_a) == len(leaves_b)
    np.testing.assert_array_equal(np.asarray(leaves_a[0]),
                                  np.asarray(leaves_b[0]))


def test_trainer_dp8_uneven_batches(corpus, tmp_path):
    """dp=8 end-to-end fit+evaluate with 6 utts and batch_size 4: every batch
    is uneven (6 = 4+2, neither divisible by 8). The loader's cyclic-repeat
    padding must make each batch shard over the 8-way data axis, and eval WER
    must count only the real utterances (VERDICT r1 weak #6)."""
    root, manifest, tok = corpus
    teacher_cfg = _small_cfg(tok.vocab_size)
    student_cfg = make_student_config(teacher_cfg)
    distill = DistillationConfig()
    model = DistilCTCModel(student_cfg, teacher_cfg, distill)

    cfg = TrainConfig(
        model=student_cfg, distillation=distill,
        optim=OptimConfig(lr=1e-3, sched_name="none", d_model=16),
        train_ds=DataConfig(batch_size=4, num_buckets=1, max_duration=2.0,
                            seed=0),
        test_ds=DataConfig(batch_size=4, num_buckets=1, max_duration=2.0,
                           shuffle=False),
        max_epochs=1, dp_size=8)

    trainer = Trainer(model, cfg, tok, tmp_path / "dp8", log_every=1)
    assert trainer._dp_size() == 8
    state = trainer.fit(manifest, max_steps=2)
    assert int(state.step) == 2

    metrics = trainer.evaluate(manifest)
    assert metrics["num_utts"] == len(TEXTS)      # padding rows not counted
    assert np.isfinite(metrics["loss"])
    assert 0.0 <= metrics["wer"] <= 3.0


def test_eval_loss_invariant_to_dp_padding(corpus, tmp_path):
    """evaluate() loss must not change with the dp pad amount (VERDICT r2
    weak #2): with batch_size=3 and dp=8, each 3-real-row batch pads to 8 by
    cyclic repeat (rows 0,1 duplicated 3x, row 2 only 2x) — a padded-batch
    mean over-weights rows 0,1. Per-sample aggregation over real rows only
    makes dp=1 and dp=8 eval losses identical."""
    root, manifest, tok = corpus
    teacher_cfg = _small_cfg(tok.vocab_size)
    student_cfg = make_student_config(teacher_cfg)
    distill = DistillationConfig()

    def eval_with_dp(dp):
        model = DistilCTCModel(student_cfg, teacher_cfg, distill)
        cfg = TrainConfig(
            model=student_cfg, distillation=distill,
            optim=OptimConfig(lr=1e-3, sched_name="none", d_model=16),
            train_ds=DataConfig(batch_size=3, num_buckets=1, max_duration=2.0,
                                seed=0),
            test_ds=DataConfig(batch_size=3, num_buckets=1, max_duration=2.0,
                               shuffle=False),
            max_epochs=1, dp_size=dp)
        trainer = Trainer(model, cfg, tok, tmp_path / f"dp{dp}", log_every=10)
        from tpu_asr.data.dataset import AudioToBPEDataset, make_dataloader
        ds = AudioToBPEDataset(manifest, tok, 16000, 0.1, 2.0)
        first = next(iter(make_dataloader(ds, cfg.test_ds, epoch=0,
                                          pad_batch_to=dp)))
        trainer.init_state(first, rng_seed=7)   # same seed => same params
        return trainer.evaluate(manifest)

    m1 = eval_with_dp(1)
    m8 = eval_with_dp(8)
    assert m1["num_utts"] == m8["num_utts"] == len(TEXTS)
    np.testing.assert_allclose(m1["loss"], m8["loss"], rtol=2e-5)


def test_rotate_last(tmp_path):
    ck = tmp_path / "checkpoints"
    (ck / "last").mkdir(parents=True)
    rotate_last(ck)
    assert (ck / "last-v1").exists() and not (ck / "last").exists()
    (ck / "last").mkdir()
    rotate_last(ck)
    assert (ck / "last-v2").exists()


def test_trainer_fit_steps_per_dispatch(corpus, tmp_path):
    """steps_per_dispatch > 1: the fit loop stacks same-bucket batches and
    runs K optimizer steps per device dispatch; training still progresses,
    logs, and checkpoints."""
    root, manifest, tok = corpus
    teacher_cfg = _small_cfg(tok.vocab_size)
    student_cfg = make_student_config(teacher_cfg)
    distill = DistillationConfig()
    model = DistilCTCModel(student_cfg, teacher_cfg, distill)

    cfg = TrainConfig(
        model=student_cfg, distillation=distill,
        optim=OptimConfig(lr=1e-3, sched_name="none", d_model=16,
                          gradient_clip_val=1.0),
        train_ds=DataConfig(batch_size=3, num_buckets=1, max_duration=2.0,
                            seed=0),
        test_ds=DataConfig(batch_size=3, num_buckets=1, max_duration=2.0,
                           shuffle=False),
        max_epochs=2, dp_size=1, steps_per_dispatch=2)

    workdir = tmp_path / "run_spd"
    trainer = Trainer(model, cfg, tok, workdir, log_every=2)
    state = trainer.fit(manifest)
    # 6 utts / batch 3 -> 2 same-shape batches per epoch -> one stacked
    # 2-step dispatch per epoch x 2 epochs; every batch trains
    assert int(state.step) == 4
    rows = [json.loads(l) for l in open(workdir / "metrics.jsonl")]
    assert any("loss/total" in r for r in rows)


def test_evaluate_packed_matches_evaluate(corpus, tmp_path):
    """Packed-segment evaluation (Trainer.evaluate_packed) must reproduce
    the bucketed evaluate(): same WER (identical greedy ids — exact packed
    logits, tests/test_packing.py) and the same per-utterance loss up to
    float accumulation order."""
    root, manifest, tok = corpus
    teacher_cfg = _small_cfg(tok.vocab_size)
    student_cfg = make_student_config(teacher_cfg)
    distill = DistillationConfig(use_logit_distillation=True, kd_alpha=0.2)
    model = DistilCTCModel(student_cfg, teacher_cfg, distill)
    cfg = TrainConfig(
        model=student_cfg, distillation=distill,
        optim=OptimConfig(lr=1e-3, sched_name="none", d_model=16),
        train_ds=DataConfig(batch_size=3, num_buckets=2, max_duration=2.0,
                            seed=0),
        test_ds=DataConfig(batch_size=3, num_buckets=2, max_duration=2.0,
                           shuffle=False),
        max_epochs=1, dp_size=1)
    trainer = Trainer(model, cfg, tok, tmp_path / "pk", log_every=10)
    from tpu_asr.data.dataset import AudioToBPEDataset, make_dataloader
    ds = AudioToBPEDataset(manifest, tok, 16000, 0.1, 2.0)
    first = next(iter(make_dataloader(ds, cfg.test_ds, epoch=0)))
    trainer.init_state(first, rng_seed=3)

    ref = trainer.evaluate(manifest)
    got = trainer.evaluate_packed(manifest, t_pack=64, utt_chunk=4)
    assert got["num_utts"] == ref["num_utts"] == len(TEXTS)
    assert got["wer"] == ref["wer"]
    np.testing.assert_allclose(got["loss"], ref["loss"], rtol=1e-4)


def test_evaluate_packed_rejects_flow_matching(corpus, tmp_path):
    from tpu_asr.config import FlowMatchingConfig
    root, manifest, tok = corpus
    teacher_cfg = _small_cfg(tok.vocab_size)
    student_cfg = make_student_config(teacher_cfg)
    flow = FlowMatchingConfig(meta_encoder_type="mlp", student_dim=16,
                              teacher_dim=32, student_head_num=2,
                              training_sampling=2, inference_sampling=2)
    distill = DistillationConfig(use_flow_matching=True, flow=flow)
    model = DistilCTCModel(student_cfg, teacher_cfg, distill)
    cfg = TrainConfig(
        model=student_cfg, distillation=distill,
        optim=OptimConfig(lr=1e-3, sched_name="none", d_model=16),
        test_ds=DataConfig(batch_size=3, num_buckets=1, max_duration=2.0,
                           shuffle=False),
        max_epochs=1, dp_size=1)
    trainer = Trainer(model, cfg, tok, tmp_path / "pkfm", log_every=10)
    from tpu_asr.data.dataset import AudioToBPEDataset, make_dataloader
    ds = AudioToBPEDataset(manifest, tok, 16000, 0.1, 2.0)
    first = next(iter(make_dataloader(ds, cfg.test_ds, epoch=0)))
    trainer.init_state(first, rng_seed=3)
    with pytest.raises(ValueError, match="plain CTC decode path"):
        trainer.evaluate_packed(manifest)


def test_evaluate_packed_invariant_to_dp_mesh(corpus, tmp_path):
    """evaluate_packed under a dp=8 mesh (row_multiple lifted to the dp
    size, state replicated) must equal the dp=1 result — mirrors the
    bucketed-evaluate dp-padding invariance test."""
    root, manifest, tok = corpus
    teacher_cfg = _small_cfg(tok.vocab_size)
    student_cfg = make_student_config(teacher_cfg)
    distill = DistillationConfig()

    def run(dp):
        model = DistilCTCModel(student_cfg, teacher_cfg, distill)
        cfg = TrainConfig(
            model=student_cfg, distillation=distill,
            optim=OptimConfig(lr=1e-3, sched_name="none", d_model=16),
            test_ds=DataConfig(batch_size=3, num_buckets=1, max_duration=2.0,
                               shuffle=False),
            max_epochs=1, dp_size=dp)
        trainer = Trainer(model, cfg, tok, tmp_path / f"pkdp{dp}",
                          log_every=10)
        from tpu_asr.data.dataset import AudioToBPEDataset, make_dataloader
        ds = AudioToBPEDataset(manifest, tok, 16000, 0.1, 2.0)
        first = next(iter(make_dataloader(ds, cfg.test_ds, epoch=0,
                                          pad_batch_to=dp)))
        trainer.init_state(first, rng_seed=7)
        return trainer.evaluate_packed(manifest, t_pack=64, utt_chunk=4)

    m1 = run(1)
    m8 = run(8)
    assert m1["num_utts"] == m8["num_utts"] == len(TEXTS)
    assert m1["wer"] == m8["wer"]
    np.testing.assert_allclose(m1["loss"], m8["loss"], rtol=2e-5)
