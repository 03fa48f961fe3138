"""Time Trainer.evaluate vs evaluate_packed on a realistic-duration corpus (v5e).

Measured (256 utts, lognormal ~6 s, warm): bucketed 4.6 s vs packed 5.9 s —
both are HOST-bound at this scale (audio decode + per-batch dispatch through
the axon tunnel dominate; the encoder device time is ~0.1 s of either). The
packed win (1.2-1.3x) is a DEVICE-throughput property (bench.py --full packed
line); evaluate_packed matches evaluate to 1e-4 loss / equal WER at fp32
(tests/test_loop.py) and exists for hosts where eval is device-bound.
"""
import time
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from pathlib import Path
from tpu_asr.config import (DataConfig, DistillationConfig, ModelConfig,
                            OptimConfig, TrainConfig, make_student_config)
from tpu_asr.data.audio import write_wav
from tpu_asr.data.manifest import ManifestEntry, write_manifest
from tpu_asr.data.tokenizer import train_bpe
from tpu_asr.models.distil_model import DistilCTCModel
from tpu_asr.train.loop import Trainer
from tpu_asr.data.dataset import AudioToBPEDataset, make_dataloader

root = Path("/tmp/eval_bench_corpus"); root.mkdir(exist_ok=True)
rng = np.random.default_rng(0)
WORDS = "the quick brown fox jumps over a lazy dog near green hills".split()
man = root / "eval.jsonl"
if not man.exists():
    entries = []
    for i in range(256):
        dur = float(np.clip(rng.lognormal(np.log(6.2), 0.55), 1.0, 16.6))
        x = (rng.normal(size=int(16000*dur)) * 0.1).astype(np.float32)
        p = root / f"u{i:03d}.wav"
        write_wav(p, x, 16000)
        entries.append(ManifestEntry(str(p), dur, " ".join(
            rng.choice(WORDS, size=int(rng.integers(4, 12))))))
    write_manifest(man, entries)

texts = [e.text for e in __import__("tpu_asr.data.manifest", fromlist=["read_manifest"]).read_manifest(man)]
tok = train_bpe(texts, vocab_size=128)
teacher_cfg = ModelConfig()
student_cfg = make_student_config(teacher_cfg)
distill = DistillationConfig()
model = DistilCTCModel(student_cfg, teacher_cfg, distill)
cfg = TrainConfig(model=student_cfg, distillation=distill,
                  optim=OptimConfig(d_model=88),
                  test_ds=DataConfig(batch_size=32, shuffle=False),
                  max_epochs=1, dp_size=1)
trainer = Trainer(model, cfg, tok, Path("/tmp/eval_bench_wd"), log_every=1000)
ds = AudioToBPEDataset(str(man), tok, 16000, cfg.test_ds.min_duration, cfg.test_ds.max_duration)
first = next(iter(make_dataloader(ds, cfg.test_ds, epoch=0)))
trainer.init_state(first)

for name, fn in [("bucketed", lambda: trainer.evaluate(str(man))),
                 ("packed", lambda: trainer.evaluate_packed(str(man)))]:
    r = fn()                 # compile + warm
    t0 = time.perf_counter()
    r = fn()
    dt = time.perf_counter() - t0
    audio_s = 256 * 6.7      # approx; both identical workload
    print(name, {"wall_s": round(dt, 2), "wer": round(r["wer"], 4),
                 "loss": round(r["loss"], 3), "n": r["num_utts"]})
