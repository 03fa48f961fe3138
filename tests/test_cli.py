"""CLI smoke tests (SURVEY.md §4 tier 3): the asr_train.py /
asr_inference.py / diffm entry points run end-to-end offline — tiny synthetic
.nemo teacher, explicit manifests, 1 epoch, then inference from the produced
checkpoint. Mirrors the reference's --test_mode smoke path without network.
"""

import sys
import tarfile
from pathlib import Path

import numpy as np
import pytest
import torch
import yaml

from tests.test_convert import TModel, D_MODEL, FEAT, KERNEL, N_HEADS, N_LAYERS

VOCAB = 32   # big enough for the fallback BPE alphabet (test_convert uses 12)
from tpu_asr.data.audio import write_wav
from tpu_asr.data.manifest import ManifestEntry, write_manifest


TEXTS = ["the cat sat", "a dog ran", "hello world", "speech is fun",
         "jax on tpu", "quick brown fox"]


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    # corpus + manifests
    rng = np.random.default_rng(0)
    entries = []
    for i, text in enumerate(TEXTS):
        dur = 0.8 + 0.1 * i
        x = (rng.normal(size=int(16000 * dur)) * 0.1).astype(np.float32)
        p = root / f"utt{i}.wav"
        write_wav(p, x, 16000)
        entries.append(ManifestEntry(str(p), dur, text))
    train_man = root / "train.jsonl"
    val_man = root / "val.jsonl"
    write_manifest(train_man, entries)
    write_manifest(val_man, entries[:3])

    # tiny .nemo teacher (oracle dims from test_convert, wider vocab)
    torch.manual_seed(0)
    tm = TModel(FEAT, D_MODEL, N_HEADS, N_LAYERS, KERNEL, VOCAB).eval()
    pack = root / "pack"
    pack.mkdir()
    cfg_yaml = {
        "preprocessor": {"features": FEAT, "sample_rate": 16000},
        "encoder": {"feat_in": FEAT, "n_layers": N_LAYERS, "d_model": D_MODEL,
                    "n_heads": N_HEADS, "conv_kernel_size": KERNEL,
                    "dropout": 0.0, "dropout_pre_encoder": 0.0,
                    "dropout_att": 0.0},
        "decoder": {"feat_in": D_MODEL, "num_classes": VOCAB},
    }
    with open(pack / "model_config.yaml", "w") as f:
        yaml.safe_dump(cfg_yaml, f)
    torch.save(tm.state_dict(), pack / "model_weights.ckpt")
    nemo = root / "teacher.nemo"
    with tarfile.open(nemo, "w:gz") as tar:
        for p in pack.iterdir():
            tar.add(p, arcname=p.name)
    return root, str(train_man), str(val_man), str(nemo)


def _train_args(root, train_man, val_man, nemo, extra=()):
    return ["--train_manifest", train_man, "--val_manifest", val_man,
            "--teacher_nemo", nemo, "--output_dir", str(root / "out"),
            "--epochs", "1", "--batch_size", "3", "--gpus", "1",
            *extra]


def test_asr_train_cli_logit_kd(env, monkeypatch, capsys):
    root, train_man, val_man, nemo = env
    import asr_train
    monkeypatch.setattr(sys, "argv", ["asr_train.py"] + _train_args(
        root, train_man, val_man, nemo,
        ["--use_logit_distillation", "true", "--kd_alpha", "0.5"]))
    asr_train.main()
    out = capsys.readouterr().out
    assert "wer=" in out
    ckpt = root / "out" / "run" / "checkpoints"
    assert (ckpt / "last").exists()
    assert (ckpt / "student").exists()


def test_asr_inference_cli(env, monkeypatch, capsys):
    root, train_man, val_man, nemo = env
    ckpt = root / "out" / "run" / "checkpoints" / "last"
    assert ckpt.exists(), "run the training test first"
    import asr_inference
    monkeypatch.setattr(sys, "argv", ["asr_inference.py",
                                      "--ckpt_path", str(ckpt),
                                      "--test_manifest", val_man,
                                      "--teacher_nemo", nemo,
                                      "--output_dir", str(root / "out"),
                                      "--batch_size", "3", "--gpus", "1",
                                      "--use_logit_distillation", "true"])
    asr_inference.main()
    out = capsys.readouterr().out
    assert "librispeech/test" in out and "wer=" in out


def test_asr_train_diffm_cli(env, monkeypatch, capsys):
    root, train_man, val_man, nemo = env
    import asr_train_diffm
    monkeypatch.setattr(sys, "argv", ["asr_train_diffm.py"] + _train_args(
        root, train_man, val_man, nemo,
        ["--model_version", "ver5", "--latent_dim", "12",
         "--flow_steps", "2", "--output_dir", str(root / "out_diffm")]))
    asr_train_diffm.main()
    out = capsys.readouterr().out
    assert "wer=" in out


def test_asr_train_GS_cli(env, monkeypatch, capsys):
    root, train_man, val_man, nemo = env
    import asr_train_GS
    monkeypatch.setattr(sys, "argv", ["asr_train_GS.py"] + _train_args(
        root, train_man, val_man, nemo,
        ["--use_layerwise_distillation", "true",
         "--data_script_path", "./gigaspeech.py",
         "--output_dir", str(root / "out_gs")]))
    asr_train_GS.main()
    out = capsys.readouterr().out
    assert "wer=" in out


def test_asr_inference_cv_cli_multisplit(env, monkeypatch, capsys):
    """CV entry point + multi-split manifest form (name=path,...)."""
    root, train_man, val_man, nemo = env
    ckpt = root / "out" / "run" / "checkpoints" / "last"
    assert ckpt.exists()
    import asr_inference_CV
    monkeypatch.setattr(sys, "argv", [
        "asr_inference_CV.py", "--ckpt_path", str(ckpt),
        "--test_manifest", f"dev_clean={val_man},test_clean={train_man}",
        "--teacher_nemo", nemo, "--output_dir", str(root / "out"),
        "--batch_size", "3", "--use_logit_distillation", "true"])
    asr_inference_CV.main()
    out = capsys.readouterr().out
    assert "commonvoice/dev_clean" in out
    assert "commonvoice/test_clean" in out


def test_asr_inference_cv_flag_translation(monkeypatch):
    """The reference's CV-specific flags (asr_inference_CV.py:289-294) map
    onto the generic data surface: dataset name -> script path, lang ->
    config name, splits -> val/test, token kept for load_dataset."""
    import asr_inference_CV
    seen = {}
    monkeypatch.setattr(asr_inference_CV, "run_inference",
                        lambda args: seen.update(vars(args)))
    monkeypatch.setattr(sys, "argv", [
        "asr_inference_CV.py", "--ckpt_path", "x.ckpt",
        "--cv_dataset_name", "mozilla-foundation/common_voice_7_0",
        "--cv_lang", "de", "--cv_splits", "validation,test",
        "--hf_token", "tok123"])
    asr_inference_CV.main()
    assert seen["data_script_path"] == "mozilla-foundation/common_voice_7_0"
    assert seen["data_config_name"] == "de"
    assert seen["data_train_split"] is None
    assert seen["data_val_split"] == "validation"
    assert seen["data_test_split"] == "test"
    assert seen["hf_token"] == "tok123"
    assert seen["eval_data"] == "commonvoice"


def test_asr_train_diffm_GS_and_inference_diffm(env, monkeypatch, capsys):
    root, train_man, val_man, nemo = env
    import asr_train_diffm_GS
    monkeypatch.setattr(sys, "argv", ["asr_train_diffm_GS.py"] + _train_args(
        root, train_man, val_man, nemo,
        ["--model_version", "2", "--latent_dim", "12", "--flow_steps", "2",
         "--data_script_path", "./tedlium_asr.py",
         "--output_dir", str(root / "out_dgs")]))
    asr_train_diffm_GS.main()
    assert "wer=" in capsys.readouterr().out

    ckpt = root / "out_dgs" / "run" / "checkpoints" / "last"
    import asr_inference_diffm
    monkeypatch.setattr(sys, "argv", [
        "asr_inference_diffm.py", "--ckpt_path", str(ckpt),
        "--test_manifest", str(val_man), "--teacher_nemo", nemo,
        "--output_dir", str(root / "out"), "--batch_size", "3",
        "--model_ver", "ver2", "--latent_dim", "12", "--flow_steps", "2"])
    asr_inference_diffm.main()
    assert "wer=" in capsys.readouterr().out


def test_fallback_tokenizer_sidecar_roundtrip(env, monkeypatch, capsys,
                                              tmp_path):
    """Training WITHOUT a teacher .nemo persists its fallback BPE next to
    the checkpoints; inference prefers that sidecar over re-training a
    fallback on (different) eval texts — which would silently mis-decode."""
    root, train_man, val_man, _ = env
    cfg_yaml = {
        "preprocessor": {"features": FEAT, "sample_rate": 16000},
        "encoder": {"feat_in": FEAT, "n_layers": N_LAYERS, "d_model": D_MODEL,
                    "n_heads": N_HEADS, "conv_kernel_size": KERNEL,
                    "dropout": 0.0, "dropout_pre_encoder": 0.0,
                    "dropout_att": 0.0},
        "decoder": {"feat_in": D_MODEL, "num_classes": VOCAB},
    }
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_yaml))

    import asr_train
    monkeypatch.setattr(sys, "argv", [
        "asr_train.py", "--train_manifest", train_man,
        "--val_manifest", val_man, "--config", str(cfg_path),
        "--output_dir", str(tmp_path / "out"), "--epochs", "1",
        "--batch_size", "3", "--gpus", "1"])
    asr_train.main()
    capsys.readouterr()
    ckpt_dir = tmp_path / "out" / "run" / "checkpoints"
    assert (ckpt_dir / "tokenizer.model").is_file()

    import asr_inference
    monkeypatch.setattr(sys, "argv", [
        "asr_inference.py", "--ckpt_path", str(ckpt_dir / "last"),
        "--test_manifest", val_man, "--config", str(cfg_path),
        "--output_dir", str(tmp_path / "out"), "--batch_size", "3"])
    asr_inference.main()
    cap = capsys.readouterr()
    assert "wer=" in cap.out
    assert "training fallback" not in cap.err     # sidecar was used


def test_asr_inference_packed_eval_flag(env, monkeypatch, capsys):
    """--packed_eval routes through Trainer.evaluate_packed (same metrics
    contract; packed parity is pinned by tests/test_loop.py)."""
    root, train_man, val_man, nemo = env
    ckpt = root / "out" / "run" / "checkpoints" / "last"
    assert ckpt.exists(), "run the training test first"
    import asr_inference
    monkeypatch.setattr(sys, "argv", [
        "asr_inference.py", "--ckpt_path", str(ckpt),
        "--test_manifest", val_man, "--teacher_nemo", nemo,
        "--output_dir", str(root / "out"), "--batch_size", "3",
        "--use_logit_distillation", "true", "--packed_eval"])
    asr_inference.main()
    out = capsys.readouterr().out
    assert "librispeech/test" in out and "wer=" in out


def test_asr_inference_cli_export_artifact(env, monkeypatch, capsys, tmp_path):
    """--export_path writes a .tasrx serving artifact of the restored
    student (convert/export.py; the ExportableEncDecModel surface) that
    loads and transcribes without model code or checkpoint."""
    root, train_man, val_man, nemo = env
    ckpt = root / "out" / "run" / "checkpoints" / "last"
    assert ckpt.exists(), "run the training test first"
    art = tmp_path / "student.tasrx"
    import asr_inference
    monkeypatch.setattr(sys, "argv", ["asr_inference.py",
                                      "--ckpt_path", str(ckpt),
                                      "--test_manifest", val_man,
                                      "--teacher_nemo", nemo,
                                      "--output_dir", str(root / "out"),
                                      "--batch_size", "3", "--gpus", "1",
                                      "--use_logit_distillation", "true",
                                      "--export_path", str(art),
                                      "--export_buckets", "2:0.5"])
    asr_inference.main()
    assert "serialized inference artifact" in capsys.readouterr().out
    from tpu_asr.convert.export import load_exported
    ex = load_exported(art)
    rng = np.random.default_rng(0)
    texts = ex.transcribe([rng.normal(scale=0.1, size=4000).astype(np.float32)])
    assert len(texts) == 1 and isinstance(texts[0], str)
