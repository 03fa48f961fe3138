"""Scoped-down multi-process fit/eval worker (default-suite version of
scripts/multiprocess_sim.py — VERDICT r4 next #7).

Modes:
  fit  <coordinator> <nproc> <pid> <workdir>
      2-process Trainer.fit (a few steps, dp over 2x2 virtual devices) +
      distributed evaluate; process 0 writes eval metrics to
      <workdir>/fit_metrics.json. Exercises manifest striping, gloo
      cross-process grad psum, cross_process_sum metric reduction, orbax
      multi-process checkpoint save, rank-0 gating.
  eval <workdir>
      single-process (2 local devices) CROSS-RESTORE of the 2-process
      checkpoint + evaluate; writes <workdir>/eval_metrics.json.

Driven by tests/test_multiprocess.py::test_scoped_fit_eval_cross_restore.
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TEXTS = ["the cat sat on a mat", "a dog ran far", "hello wide world",
         "speech is fun to model", "jax runs on tpu pods",
         "quick brown fox jumps"]


def _setup_jax(coordinator=None, nproc=1, pid=0):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if nproc > 1:
        jax.distributed.initialize(coordinator, nproc, pid)
    return jax


def _build(workdir: Path):
    from tpu_asr.config import (DataConfig, DecoderConfig, DistillationConfig,
                                EncoderConfig, ModelConfig, OptimConfig,
                                PreprocessorConfig, TrainConfig,
                                make_student_config)
    from tpu_asr.data.tokenizer import train_bpe
    from tpu_asr.models.distil_model import DistilCTCModel
    from tpu_asr.train.loop import Trainer

    teacher_cfg = ModelConfig(
        preprocessor=PreprocessorConfig(features=24),
        spec_augment=None,
        encoder=EncoderConfig(feat_in=24, n_layers=2, d_model=16, n_heads=2,
                              conv_kernel_size=7, conv_norm_type="layer_norm",
                              dropout=0.0, dropout_pre_encoder=0.0,
                              dropout_att=0.0),
        decoder=DecoderConfig(feat_in=16, num_classes=48),
        compute_dtype="float32")
    student_cfg = make_student_config(teacher_cfg)
    distill = DistillationConfig(use_logit_distillation=True, kd_alpha=0.3)
    tok = train_bpe(TEXTS * 3, vocab_size=48)   # deterministic per process
    model = DistilCTCModel(student_cfg, teacher_cfg, distill)
    cfg = TrainConfig(model=student_cfg, distillation=distill,
                      optim=OptimConfig(lr=1e-3, sched_name="none",
                                        d_model=16),
                      train_ds=DataConfig(batch_size=4, shuffle=False),
                      test_ds=DataConfig(batch_size=4, shuffle=False),
                      max_epochs=1, dp_size=-1)
    return Trainer(model, cfg, tok, workdir / "run", log_every=100)


def main():
    mode = sys.argv[1]
    if mode == "fit":
        coordinator, nproc, pid, workdir = sys.argv[2:6]
        jax = _setup_jax(coordinator, int(nproc), int(pid))
        workdir = Path(workdir)
        trainer = _build(workdir)
        trainer.fit(str(workdir / "train.jsonl"), max_steps=3)
        m = trainer.evaluate(str(workdir / "val.jsonl"))
        # multi-host PACKED eval (round 5): each process packs its own
        # manifest stripe, sums cross-process — must reproduce the bucketed
        # distributed eval's WER exactly and its loss to float tolerance
        mp = trainer.evaluate_packed(str(workdir / "val.jsonl"), t_pack=128)
        assert mp["num_utts"] == m["num_utts"], (mp, m)
        assert mp["wer"] == m["wer"], (mp, m)
        assert abs(mp["loss"] - m["loss"]) < 1e-4, (mp, m)
        if jax.process_index() == 0:
            (workdir / "fit_metrics.json").write_text(
                json.dumps({k: float(v) for k, v in m.items()}))
        print(f"MP_FIT_OK {pid}", flush=True)
    elif mode == "eval":
        workdir = Path(sys.argv[2])
        _setup_jax()
        from tpu_asr.data.dataset import AudioToBPEDataset, make_dataloader
        from tpu_asr.utils.checkpoint import restore_train_state

        trainer = _build(workdir)
        ds = AudioToBPEDataset(str(workdir / "train.jsonl"),
                               trainer.tokenizer, 16000, 0.1, 16.7)
        first = next(iter(make_dataloader(ds, trainer.cfg.train_ds)))
        trainer.init_state(first)
        trainer.state = restore_train_state(trainer.ckpt_dir, trainer.state)
        m = trainer.evaluate(str(workdir / "val.jsonl"))
        (workdir / "eval_metrics.json").write_text(
            json.dumps({k: float(v) for k, v in m.items()}))
        print("MP_EVAL_OK", flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
