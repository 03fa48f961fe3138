"""Shared CLI plumbing for the entry-point scripts.

The reference ships 7 entry scripts that re-paste ~80% of each other
(asr_train.py / asr_train_GS.py / asr_train_diffm.py / asr_train_diffm_GS.py /
asr_inference.py / asr_inference_CV.py / asr_inference_diffm.py — SURVEY.md
§2.1 R1-R4, R15-R17). Here each script is a thin wrapper over this module;
flag names and defaults mirror the reference argparse surface
(asr_train.py:1380-1585, asr_inference.py:205-305, asr_train_diffm.py:1636-1647).

Offline adaptations (this environment has no network egress):
- `--teacher_nemo PATH` imports a local `.nemo` via the converter (replaces
  `from_pretrained("stt_en_conformer_ctc_small")` + release_nemoAPI);
  without it the teacher is randomly initialized (stated loudly).
- `--train_manifest/--val_manifest/--test_manifest` accept pre-built JSONL
  manifests directly; the HF `--data_script_path` path still works when the
  dataset is already cached locally.
- `--tokenizer` points at a SentencePiece `.model` or this framework's JSON
  tokenizer; defaults to the tokenizer shipped inside `--teacher_nemo`.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def str2bool(v):
    if isinstance(v, bool):
        return v
    v = v.lower()
    if v in ("yes", "true", "t", "y", "1"):
        return True
    if v in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected (true/false).")


def parse_sampling_steps_per_layer(s):
    """'random' -> 16 random picks from {1,2,4,8} (asr_train.py:1522-1528)."""
    if s == "random":
        return [random.choice([1, 2, 4, 8]) for _ in range(16)]
    return json.loads(s)


def parse_model_version(s) -> int:
    """'ver3' | '3' | 3 -> 3."""
    if isinstance(s, int):
        return s
    s = str(s)
    return int(s[3:]) if s.startswith("ver") else int(s)


# ---------------------------------------------------------------------------
# argument surfaces
# ---------------------------------------------------------------------------

def add_common_data_args(p: argparse.ArgumentParser):
    p.add_argument("--platform", type=str, default="", choices=["", "cpu"],
                   help="force a JAX platform; 'cpu' + --host_devices N gives "
                        "an N-device virtual CPU mesh for podless dev/CI")
    p.add_argument("--host_devices", type=int, default=0,
                   help="with --platform cpu: number of virtual CPU devices")
    p.add_argument("--data_dir", type=str, default="data")
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--data_sample_rate", type=int, default=16000)
    p.add_argument("--decode_cache_dir", type=str, default=None,
                   help="decoded-audio disk cache dir: repeated eval passes skip the host decode (data/dataset.py)")
    p.add_argument("--data_script_path", type=str, default="./librispeech_asr.py")
    p.add_argument("--data_config_name", type=str, default="train_100")
    p.add_argument("--data_train_split", type=str, default="train.clean.100")
    p.add_argument("--data_val_split", type=str, default="dev.clean")
    p.add_argument("--data_test_split", type=str, default="test.clean")
    p.add_argument("--test_mode", action="store_true")
    # framework knob (no reference equivalent): K optimizer steps per device
    # dispatch — lax.scan over stacked same-bucket batches (TrainConfig)
    p.add_argument("--steps_per_dispatch", type=int, default=1)
    # framework knob (no reference equivalent): cache the frozen teacher's
    # last-layer features per utterance after epoch 0 and skip the teacher
    # forward — exact for logit/last-layerwise KD (TrainConfig.cache_teacher)
    p.add_argument("--cache_teacher", action="store_true")
    # all-layer variant: covers FM/DiffKD/diffm/full-layerwise too
    # (TrainConfig.cache_teacher_all); --cache_teacher_dir spills per-utt
    # .npy files to disk instead of host RAM
    p.add_argument("--cache_teacher_all", action="store_true")
    p.add_argument("--cache_teacher_dir", type=str, default=None)
    # framework knob (no reference equivalent): run the FROZEN teacher's
    # forward through the int8 serving path (EncoderConfig.quantization=
    # 'int8' — fused int8 FFN kernel on TPU, ops/pallas_ffn.py). Numerics-
    # changing for the KD targets only (teacher features feed MSE/KL
    # losses, never the CTC path); the student always trains full-precision
    p.add_argument("--teacher_int8", action="store_true")
    # offline extensions
    p.add_argument("--train_manifest", type=str, default=None)
    p.add_argument("--val_manifest", type=str, default=None)
    p.add_argument("--test_manifest", type=str, default=None)
    p.add_argument("--teacher_nemo", type=str, default=None,
                   help="local .nemo of the teacher (offline replacement for "
                        "from_pretrained stt_en_conformer_ctc_small)")
    p.add_argument("--tokenizer", type=str, default=None)


def add_kd_args(p: argparse.ArgumentParser):
    p.add_argument("--use_ctc", type=str2bool, default=True)
    p.add_argument("--use_logit_distillation", type=str2bool, default=False)
    p.add_argument("--kd_alpha", type=float, default=1.0)
    p.add_argument("--kd_temperature", type=float, default=1.0)
    p.add_argument("--use_layerwise_distillation", type=str2bool, default=False)
    p.add_argument("--layer_kd_alpha", type=float, default=1.0)
    p.add_argument("--layer_kd_scope", type=str, default="all",
                   choices=["all", "last"])
    p.add_argument("--use_flow_matching", type=str2bool, default=False)
    p.add_argument("--flow_steps", type=int, default=8)
    p.add_argument("--dirac_ratio", type=float, default=0.1)   # parsed, unused
    p.add_argument("--flow_weight", type=float, default=1.0)
    p.add_argument("--flow_schedule", type=str, default="rectified",
                   choices=["rectified", "vp_ode", "ve_ode"])
    p.add_argument("--meta_encoder_type", type=str, default="mlp",
                   choices=["mlp", "cnn", "swin", "conformer", "unet"])
    p.add_argument("--shape_transform_type", type=str, default="linear",
                   choices=["identity", "linear", "conv1d"])
    p.add_argument("--sampling_steps_per_layer",
                   type=parse_sampling_steps_per_layer, default=None)
    p.add_argument("--use_diffkd", type=str2bool, default=False)
    p.add_argument("--diffkd_steps", type=int, default=5)
    p.add_argument("--use_dynamic_steps", type=str2bool, default=False)
    p.add_argument("--router_weight", type=float, default=1.0)
    p.add_argument("--router_temperature", type=float, default=1.0)
    p.add_argument("--router_max_sampling_steps", type=int, default=8)
    p.add_argument("--router_strategy", type=str, default="batch_mode",
                   choices=["batch_mode", "batch_avg", "batch_median", "group"])


def build_train_parser(description: str, gigaspeech: bool = False,
                       diffm: bool = False) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    add_common_data_args(p)
    add_kd_args(p)
    p.add_argument("--config", type=str, default="configs/conformer_ctc_small.yaml")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--gpus", type=int, default=1,
                   help="accelerator count (data-parallel mesh size; -1 = all)")
    p.add_argument("--resume_ckpt", type=str, default=None)
    if gigaspeech:
        p.add_argument("--train_student_model", type=str2bool, default=True)
    p.add_argument("--train_teacher_model", type=str2bool, default=False)
    if diffm:
        p.add_argument("--model_version", type=parse_model_version, default=1)
        p.add_argument("--latent_dim", type=int, default=96)
        p.add_argument("--kd_loss_type", type=str, default="mse",
                       choices=["mse", "l1"])
    return p


def build_inference_parser(description: str, diffm: bool = False):
    p = argparse.ArgumentParser(description=description)
    add_common_data_args(p)
    add_kd_args(p)
    p.add_argument("--ckpt_path", type=str, required=True)
    p.add_argument("--config", type=str, default=None,
                   help="model-config yaml for checkpoints trained WITHOUT a "
                        "teacher .nemo (offline fallback); must match the "
                        "training run's --config")
    p.add_argument("--gpus", type=int, default=1)
    p.add_argument("--eval_data", type=str, default="librispeech",
                   choices=["librispeech", "tedlium2", "commonvoice",
                            "gigaspeech"])
    p.add_argument("--is_teacher", type=str2bool, default=False)
    # framework knob (no reference equivalent): packed-segment evaluation —
    # several utterances per encoder row (exact per-utterance logits),
    # 1.2-1.3x on realistic duration mixes (Trainer.evaluate_packed)
    p.add_argument("--packed_eval", action="store_true")
    # framework knob: serialized serving artifact (StableHLO via jax.export;
    # the ExportableEncDecModel equivalent, convert/export.py)
    p.add_argument("--export_path", type=str, default=None,
                   help="write a .tasrx serialized-inference artifact of "
                        "the restored student and exit before evaluation")
    p.add_argument("--export_buckets", type=str, default="8:4,8:8,8:16",
                   help="comma-separated batch:seconds static shapes for "
                        "--export_path")
    if diffm:
        p.add_argument("--model_ver", type=parse_model_version, default=1)
        p.add_argument("--latent_dim", type=int, default=96)
    return p


# ---------------------------------------------------------------------------
# config assembly
# ---------------------------------------------------------------------------

def assemble_distill_config(args, student_cfg, teacher_cfg, diffm_version=None):
    from tpu_asr.config import (DiffKDConfig, DiffmConfig, DistillationConfig,
                                FlowMatchingConfig, RouterConfig)

    s_d = student_cfg.encoder.d_model
    t_d = teacher_cfg.encoder.d_model
    flow = None
    router = None
    if args.use_flow_matching or args.use_diffkd or diffm_version is not None:
        flow = FlowMatchingConfig(
            meta_encoder_type=args.meta_encoder_type,
            time_embed_dim=32,
            hidden_dim=getattr(args, "latent_dim", None) or 128,
            training_sampling=args.flow_steps,
            inference_sampling=args.flow_steps,
            weight=args.flow_weight,
            student_dim=s_d, teacher_dim=t_d,
            student_head_num=student_cfg.encoder.n_heads,
            teacher_head_num=teacher_cfg.encoder.n_heads,
            shape_transform=args.shape_transform_type,
            loss="mse",
            noise_schedule=args.flow_schedule,
            sampling_steps_per_layer=(tuple(args.sampling_steps_per_layer)
                                      if args.sampling_steps_per_layer else None),
            use_dynamic_steps=args.use_dynamic_steps,
            router_strategy=args.router_strategy,
            router_weight=args.router_weight,
            router_max_sampling_steps=args.router_max_sampling_steps,
            router_temperature=args.router_temperature,
        )
        router = RouterConfig(
            max_steps=args.router_max_sampling_steps, min_steps=1,
            stu_dim=s_d, tch_dim=t_d,
            use_layer_id=True, num_layers=student_cfg.encoder.n_layers,
            layer_emb_dim=32, temperature=args.router_temperature,
            budget_target=8.0, budget_weight=0.05, entropy_weight=0.001)

    diffkd = None
    if args.use_diffkd:
        diffkd = DiffKDConfig(steps=args.diffkd_steps, teacher_dim=t_d,
                              student_dim=s_d, latent_dim=s_d)
    diffm = None
    if diffm_version is not None:
        diffm = DiffmConfig(model_version=diffm_version,
                            latent_dim=getattr(args, "latent_dim", 96),
                            student_dim=s_d, teacher_dim=t_d, fm=flow)

    return DistillationConfig(
        use_ctc=args.use_ctc,
        use_logit_distillation=args.use_logit_distillation,
        kd_alpha=args.kd_alpha, kd_temperature=args.kd_temperature,
        use_layerwise_distillation=args.use_layerwise_distillation,
        layer_kd_alpha=args.layer_kd_alpha,
        layer_kd_scope=getattr(args, "layer_kd_scope", "all"),
        use_flow_matching=args.use_flow_matching, flow=flow,
        router=router if (flow is not None and flow.use_dynamic_steps) else None,
        use_diffkd=args.use_diffkd, diffkd=diffkd,
        use_diffm=diffm_version is not None, diffm=diffm)


def load_teacher(args):
    """Returns (teacher_cfg: ModelConfig, params|None, batch_stats|None,
    tokenizer)."""
    from tpu_asr.config import ModelConfig
    from tpu_asr.data.tokenizer import SentencePieceBPETokenizer

    tokenizer = None
    if args.teacher_nemo:
        from tpu_asr.convert.nemo_import import load_nemo_checkpoint
        cfg, params, stats, tok_path = load_nemo_checkpoint(args.teacher_nemo)
        if args.tokenizer:
            tokenizer = SentencePieceBPETokenizer.from_file(args.tokenizer)
        elif tok_path:
            tokenizer = SentencePieceBPETokenizer.from_file(tok_path)
        return cfg, params, stats, tokenizer

    print("WARNING: no --teacher_nemo given — teacher weights are RANDOMLY "
          "initialized (offline environment; the reference downloads "
          "stt_en_conformer_ctc_small from NGC).", file=sys.stderr)
    cfg_path = getattr(args, "config", None)
    if cfg_path and os.path.isfile(cfg_path):
        import yaml

        from tpu_asr.convert.nemo_import import nemo_config_to_model_config
        with open(cfg_path) as f:
            cfg = nemo_config_to_model_config(yaml.safe_load(f))
    else:
        cfg = ModelConfig()
    if args.tokenizer:
        tokenizer = SentencePieceBPETokenizer.from_file(args.tokenizer)
    return cfg, None, None, tokenizer


def prepare_manifests(args, corpus: str) -> Dict[str, str]:
    """Manifest resolution: explicit paths win; otherwise build from a locally
    cached HF dataset (reference flow, asr_train.py:1615-1681) incl. the
    --test_mode 100-sample reduction."""
    manifests = {}
    explicit = {"train": args.train_manifest, "val": args.val_manifest,
                "test": args.test_manifest}
    if any(explicit.values()):
        out = {}
        for k, v in explicit.items():
            if not v:
                continue
            if "=" in v:
                # multi-split form: "dev_clean=path,test_other=path" — the
                # reference evaluates 4 LibriSpeech splits per run
                # (asr_inference.py:429-452)
                for part in v.split(","):
                    name, path = part.split("=", 1)
                    out[name] = path
            else:
                out[k] = v
        return out

    from datasets import load_dataset

    from tpu_asr.data.manifest import build_manifest_from_hf

    manifest_dir = os.path.join(args.data_dir, "manifests")
    os.makedirs(manifest_dir, exist_ok=True)
    cache_dir = os.path.join(args.data_dir, "cache")
    splits = {"train": args.data_train_split, "val": args.data_val_split,
              "test": args.data_test_split}
    for name, split in splits.items():
        if not split:                  # e.g. inference CLIs with no train set
            continue
        suffix = "_testmode" if args.test_mode else ""
        path = os.path.join(manifest_dir, f"{name}{suffix}.json")
        if not os.path.isfile(path):
            ds = load_dataset(args.data_script_path, args.data_config_name,
                              split=split, trust_remote_code=True,
                              cache_dir=cache_dir,
                              token=getattr(args, "hf_token", None))
            if args.test_mode:
                ds = ds.select(range(min(100, len(ds))))
            build_manifest_from_hf(ds, path, cache_dir, corpus=corpus)
        manifests[name] = path
    if args.test_mode:
        args.epochs = 5
    return manifests


# ---------------------------------------------------------------------------
# run paths
# ---------------------------------------------------------------------------

def _sync_vocab(teacher_cfg, tokenizer, frozen: bool):
    """Align decoder num_classes with the tokenizer. With imported (frozen)
    teacher weights the decoder shape is fixed by the checkpoint — the
    tokenizer must fit inside it; otherwise adopt the tokenizer's size."""
    import dataclasses

    if frozen:
        if tokenizer.vocab_size > teacher_cfg.decoder.num_classes:
            raise ValueError(
                f"tokenizer vocab ({tokenizer.vocab_size}) exceeds the "
                f"teacher decoder ({teacher_cfg.decoder.num_classes})")
        return teacher_cfg
    return dataclasses.replace(
        teacher_cfg, decoder=dataclasses.replace(
            teacher_cfg.decoder, num_classes=tokenizer.vocab_size))


def _fallback_tokenizer(manifests, vocab_size=128):
    from tpu_asr.data.manifest import read_manifest
    from tpu_asr.data.tokenizer import train_bpe

    texts = [e.text for m in manifests.values() for e in read_manifest(m)]
    print(f"training fallback BPE tokenizer (vocab {vocab_size}) on "
          f"{len(texts)} transcripts", file=sys.stderr)
    return train_bpe(texts, vocab_size=vocab_size)


def _apply_platform_flags(args) -> None:
    if getattr(args, "platform", "") == "cpu":
        from tpu_asr.utils.platform import force_cpu_devices
        force_cpu_devices(args.host_devices or 1)


def run_training(args, corpus: str = "librispeech",
                 diffm_version: Optional[int] = None) -> Dict[str, Dict]:
    import dataclasses

    _apply_platform_flags(args)

    from tpu_asr.config import (DataConfig, OptimConfig, TrainConfig,
                                make_student_config)
    from tpu_asr.models.distil_model import DistilCTCModel
    from tpu_asr.train.loop import Trainer

    manifests = prepare_manifests(args, corpus)
    teacher_cfg, teacher_params, teacher_stats, tokenizer = load_teacher(args)
    if tokenizer is None:
        tokenizer = _fallback_tokenizer(manifests,
                                        teacher_cfg.decoder.num_classes)
    teacher_cfg = _sync_vocab(teacher_cfg, tokenizer,
                              frozen=teacher_params is not None)

    train_teacher = getattr(args, "train_teacher_model", False) or \
        not getattr(args, "train_student_model", True)
    if train_teacher:
        student_cfg = teacher_cfg          # teacher-baseline training (R1 path)
    else:
        student_cfg = make_student_config(teacher_cfg)
    # AFTER the student derivation: the student clones the teacher config
    # and must stay full-precision — only the frozen teacher serves int8
    if getattr(args, "teacher_int8", False) and not train_teacher:
        teacher_cfg = dataclasses.replace(
            teacher_cfg, encoder=dataclasses.replace(
                teacher_cfg.encoder, quantization="int8"))
    distill = assemble_distill_config(args, student_cfg, teacher_cfg,
                                      diffm_version)
    model = DistilCTCModel(student_cfg, teacher_cfg, distill)

    ds_cfg = dict(sample_rate=args.data_sample_rate,
                  batch_size=args.batch_size,
                  decode_cache_dir=args.decode_cache_dir)
    cfg = TrainConfig(
        model=student_cfg, distillation=distill,
        optim=OptimConfig(d_model=student_cfg.encoder.d_model),
        train_ds=DataConfig(shuffle=True, **ds_cfg),
        validation_ds=DataConfig(shuffle=False, **ds_cfg),
        test_ds=DataConfig(shuffle=False, **ds_cfg),
        max_epochs=args.epochs,
        steps_per_dispatch=args.steps_per_dispatch,
        cache_teacher=getattr(args, "cache_teacher", False),
        cache_teacher_all=getattr(args, "cache_teacher_all", False),
        cache_teacher_dir=getattr(args, "cache_teacher_dir", None),
        dp_size=args.gpus if args.gpus and args.gpus > 0 else -1)

    workdir = Path(args.output_dir) / (os.getenv("EXP_NAME") or "run")
    trainer = Trainer(model, cfg, tokenizer, workdir)

    # persist the tokenizer next to the checkpoints: with no --teacher_nemo
    # the fallback BPE is trained on the TRAINING transcripts, and a later
    # inference run re-training it on different texts would silently
    # mis-decode (the reference never hits this — its tokenizer always ships
    # inside the teacher .nemo; this is the offline-fallback equivalent)
    if hasattr(tokenizer, "save"):
        from tpu_asr.parallel.mesh import is_main_process, sync_processes
        if is_main_process():
            trainer.ckpt_dir.mkdir(parents=True, exist_ok=True)
            tokenizer.save(trainer.ckpt_dir / "tokenizer.model")
        sync_processes("tokenizer_sidecar")

    # bootstrap + teacher injection
    from tpu_asr.data.dataset import AudioToBPEDataset, make_dataloader
    dataset = AudioToBPEDataset(manifests["train"], tokenizer,
                                cfg.train_ds.sample_rate,
                                cfg.train_ds.min_duration,
                                cfg.train_ds.max_duration)
    first = next(iter(make_dataloader(dataset, cfg.train_ds, epoch=0)))
    trainer.init_state(first)
    if teacher_params is not None:
        trainer.load_teacher_params(teacher_params, teacher_stats)

    trainer.fit(manifests["train"], manifests.get("val"),
                resume=args.resume_ckpt is not None)

    results = {}
    for split in ("val", "test"):
        if split in manifests:
            results[split] = trainer.evaluate(manifests[split])
            print(f"[{split}] wer={results[split]['wer']:.4f} "
                  f"loss={results[split]['loss']:.4f} "
                  f"({int(results[split]['num_utts'])} utts)")
    from tpu_asr.utils.checkpoint import export_student
    export_student(trainer.ckpt_dir, trainer.state, student_cfg)
    return results


def run_inference(args, diffm_version: Optional[int] = None) -> Dict[str, Dict]:
    """Rebuild the distil model from teacher cfg + flags, load the trained
    checkpoint, evaluate every requested split (asr_inference.py:304-471)."""
    import dataclasses

    _apply_platform_flags(args)

    from tpu_asr.config import (DataConfig, OptimConfig, TrainConfig,
                                make_student_config)
    from tpu_asr.models.distil_model import DistilCTCModel
    from tpu_asr.train.loop import Trainer
    from tpu_asr.utils.checkpoint import restore_train_state

    corpus = {"librispeech": "librispeech", "tedlium2": "tedlium",
              "commonvoice": "commonvoice", "gigaspeech": "gigaspeech"}[
        args.eval_data]
    manifests = prepare_manifests(args, corpus)
    teacher_cfg, teacher_params, teacher_stats, tokenizer = load_teacher(args)
    if tokenizer is None:
        # prefer the tokenizer the TRAINING run saved next to its
        # checkpoints over re-training a fallback on (different) eval texts
        tok_side = Path(args.ckpt_path).parent / "tokenizer.model"
        if tok_side.is_file():
            from tpu_asr.data.tokenizer import SentencePieceBPETokenizer
            tokenizer = SentencePieceBPETokenizer.from_file(tok_side)
        else:
            tokenizer = _fallback_tokenizer(manifests,
                                            teacher_cfg.decoder.num_classes)
    teacher_cfg = _sync_vocab(teacher_cfg, tokenizer,
                              frozen=teacher_params is not None)
    student_cfg = teacher_cfg if args.is_teacher else make_student_config(teacher_cfg)
    distill = assemble_distill_config(args, student_cfg, teacher_cfg,
                                      diffm_version)
    model = DistilCTCModel(student_cfg, teacher_cfg, distill)

    ds_cfg = dict(sample_rate=args.data_sample_rate,
                  batch_size=args.batch_size,
                  decode_cache_dir=args.decode_cache_dir)
    cfg = TrainConfig(model=student_cfg, distillation=distill,
                      optim=OptimConfig(d_model=student_cfg.encoder.d_model),
                      test_ds=DataConfig(shuffle=False, **ds_cfg),
                      dp_size=args.gpus if args.gpus and args.gpus > 0 else -1)
    trainer = Trainer(model, cfg, tokenizer, Path(args.output_dir) / "infer")

    # bootstrap state shapes from the first test batch, then restore
    from tpu_asr.data.dataset import AudioToBPEDataset, make_dataloader
    any_manifest = next(iter(manifests.values()))
    dataset = AudioToBPEDataset(any_manifest, tokenizer,
                                cfg.test_ds.sample_rate,
                                cfg.test_ds.min_duration,
                                cfg.test_ds.max_duration)
    first = next(iter(make_dataloader(dataset, cfg.test_ds, epoch=0)))
    trainer.init_state(first)
    if teacher_params is not None:
        trainer.load_teacher_params(teacher_params, teacher_stats)
    ckpt = Path(args.ckpt_path)
    trainer.state = restore_train_state(ckpt.parent, trainer.state,
                                        name=ckpt.name)

    if getattr(args, "export_path", None):
        from tpu_asr.convert.export import export_inference
        from tpu_asr.models.ctc_model import CTCModel
        stu_vars = {"params": trainer.state.params["student"]}
        stu_stats = (trainer.state.batch_stats or {}).get("student", {})
        if stu_stats:
            stu_vars["batch_stats"] = stu_stats
        buckets = [(int(b.split(":")[0]), float(b.split(":")[1]))
                   for b in args.export_buckets.split(",") if b]
        out = export_inference(CTCModel(student_cfg), stu_vars, tokenizer,
                               args.export_path, buckets=buckets)
        print(f"serialized inference artifact: {out}")
        return {}

    packed = getattr(args, "packed_eval", False)
    if packed and distill.use_flow_matching:
        print("WARNING: --packed_eval requires the plain CTC decode path; "
              "flow-matching feeds the decoder from the FM output — "
              "falling back to bucketed evaluate()", file=sys.stderr)
        packed = False
    results = {}
    for split, manifest in manifests.items():
        results[split] = (trainer.evaluate_packed(manifest) if packed
                          else trainer.evaluate(manifest))
        print(f"[{args.eval_data}/{split}] wer={results[split]['wer']:.4f} "
              f"loss={results[split]['loss']:.4f} "
              f"({int(results[split]['num_utts'])} utts)")
    return results
