"""Serialized inference artifact — the ExportableEncDecModel equivalent.

The reference wraps its models in `ExportableEncDecModel` to produce a
deployable inference program (ONNX/TorchScript;
/root/reference/NeMo/nemo/collections/asr/models/asr_model.py:243-320).
The TPU-native equivalent is `jax.export`: each duration bucket's complete
inference program — mel frontend, conformer encoder (with whatever Pallas
kernels the trace-time backend gates pick), CTC decoder — is staged to
StableHLO with the weights embedded as constants, and the serialized
programs + tokenizer + decode metadata are packed into one `.tasrx` tar.

A consumer needs only `load_exported(path)` (or any StableHLO runtime for
the raw program bytes): no model code, no checkpoint, no config tree.

Layout of the tar:
    manifest.json             buckets, sample rate, frame math, platforms
    program_<i>.jaxexp        jax.export serialization, one per bucket
    tokenizer.model           SentencePiece ModelProto (if SP-backed)

Like the reference's ONNX export, the artifact freezes eval-mode behavior
(no dropout, frozen batch-norm stats) and static bucket shapes: audio is
padded to the smallest bucket that fits, exactly as `Transcriber` does at
runtime (models/transcribe.py bucketing contract).
"""

from __future__ import annotations

import io
import json
import tarfile
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

MANIFEST = "manifest.json"
FORMAT_VERSION = 1


def export_inference(model, variables, tokenizer, path,
                     buckets: Sequence[Tuple[int, float]] = ((8, 4.0),
                                                             (8, 8.0),
                                                             (8, 16.0)),
                     platforms: Optional[Sequence[str]] = None) -> Path:
    """Serialize the bucketed inference program to `path`.

    buckets: (batch_size, seconds) static shapes to stage.  platforms:
    lowering platforms for jax.export (default: the current JAX default
    backend — export on the TPU host to capture the Pallas kernels).
    Returns the artifact path."""
    import jax
    from jax import export as jexport

    sample_rate = model.cfg.sample_rate

    def fwd(sig, ln):
        out = model.apply(variables, sig, ln, train=False)
        return out.log_probs, out.encoded_len

    entries = []
    blobs = []
    for i, (bs, seconds) in enumerate(buckets):
        pad = int(round(seconds * sample_rate))
        args = (jax.ShapeDtypeStruct((bs, pad), np.float32),
                jax.ShapeDtypeStruct((bs,), np.int32))
        exp = jexport.export(
            jax.jit(fwd),
            platforms=tuple(platforms) if platforms else None)(*args)
        blobs.append(exp.serialize())
        entries.append({"file": f"program_{i}.jaxexp", "batch_size": bs,
                        "pad_samples": pad, "seconds": seconds})

    pre = model.cfg.preprocessor
    manifest = {
        "format_version": FORMAT_VERSION,
        "sample_rate": sample_rate,
        "hop_length": pre.hop_length,
        "subsampling_factor": model.cfg.encoder.subsampling_factor,
        "num_classes": model.cfg.decoder.num_classes,
        "platforms": list(platforms) if platforms else
                     [jax.default_backend()],
        "buckets": entries,
    }

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with tarfile.open(path, "w") as tar:
        def add_bytes(name, data):
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tar.addfile(ti, io.BytesIO(data))

        add_bytes(MANIFEST, json.dumps(manifest, indent=1).encode())
        for e, blob in zip(entries, blobs):
            add_bytes(e["file"], blob)
        if tokenizer is not None and hasattr(tokenizer, "serialized_proto"):
            add_bytes("tokenizer.model", tokenizer.serialized_proto())
    return path


class ExportedTranscriber:
    """Runs a `.tasrx` artifact: bucket pick -> deserialized program call ->
    CTC decoding.  Mirrors `Transcriber.transcribe` for the greedy path."""

    def __init__(self, manifest, programs, tokenizer, decoding=None):
        from tpu_asr.ops.decoding import CTCDecoding
        self.manifest = manifest
        self.sample_rate = manifest["sample_rate"]
        self.buckets = sorted(
            zip(manifest["buckets"], programs),
            key=lambda bp: (bp[0]["pad_samples"], bp[0]["batch_size"]))
        self.tokenizer = tokenizer
        self.decoding = decoding or (CTCDecoding(tokenizer, "greedy")
                                     if tokenizer is not None else None)

    def _pick(self, n_samples: int) -> int:
        """Index of the smallest bucket that fits `n_samples` (the last
        bucket when nothing fits — only then is audio cropped, matching
        `Transcriber`'s pad-to-batch-max contract for in-range input)."""
        for bi, (e, _) in enumerate(self.buckets):
            if n_samples <= e["pad_samples"]:
                return bi
        return len(self.buckets) - 1

    def transcribe(self, audio: Sequence, return_hypotheses: bool = False):
        from tpu_asr.data.audio import load_audio

        signals = [np.asarray(load_audio(a, self.sample_rate)
                              if isinstance(a, str) or hasattr(a, "__fspath__")
                              else a, np.float32)
                   for a in audio]
        # Group by the bucket each signal itself needs BEFORE batching, so a
        # batch never contains a signal longer than its bucket's pad length
        # (batching sorted-ascending windows cropped the tail of any window
        # that crossed a bucket boundary).
        by_bucket: dict = {}
        for i, s in enumerate(signals):
            by_bucket.setdefault(self._pick(len(s)), []).append(i)
        results: List = [None] * len(signals)
        for bi in sorted(by_bucket):
            e, prog = self.buckets[bi]
            pad, bs = e["pad_samples"], e["batch_size"]
            idxs_all = by_bucket[bi]
            for pos in range(0, len(idxs_all), bs):
                idxs = idxs_all[pos:pos + bs]
                sig = np.zeros((bs, pad), np.float32)
                ln = np.zeros((bs,), np.int32)
                for j, i in enumerate(idxs):
                    s = signals[i][:pad]
                    sig[j, : len(s)] = s
                    ln[j] = len(s)
                log_probs, enc_len = prog.call(sig, ln)
                decoded = self.decoding.ctc_decoder_predictions_tensor(
                    log_probs, enc_len, return_hypotheses=return_hypotheses)
                for j, i in enumerate(idxs):
                    results[i] = decoded[j]
        return results


def load_exported(path, decoding=None) -> ExportedTranscriber:
    """Load a `.tasrx` artifact produced by `export_inference`."""
    from jax import export as jexport
    from tpu_asr.data.tokenizer import SentencePieceBPETokenizer

    with tarfile.open(path, "r") as tar:
        manifest = json.loads(tar.extractfile(MANIFEST).read())
        if manifest["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"artifact format {manifest['format_version']} is newer "
                f"than this loader ({FORMAT_VERSION})")
        programs = [jexport.deserialize(
            tar.extractfile(e["file"]).read())
            for e in manifest["buckets"]]
        tokenizer = None
        try:
            data = tar.extractfile("tokenizer.model").read()
            tokenizer = SentencePieceBPETokenizer.from_bytes(data)
        except KeyError:
            pass
    return ExportedTranscriber(manifest, programs, tokenizer, decoding)
