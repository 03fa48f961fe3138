"""High-level transcription APIs.

- `Transcriber`: the EncDecCTCModel.transcribe() equivalent (N2 in SURVEY.md
  §2.2, ctc_models.py:120-193): file paths / arrays in, text out, with
  duration-bucketed batching so the jitted forward compiles once per bucket.
- `ChunkedTranscriber`: long-form audio path — the TPU-native stand-in for
  NeMo's cache-aware streaming (conformer_encoder.py:523-546): fixed-size
  windows with overlap, greedy-decoded per chunk and stitched by dropping
  half the overlap on each side. Static shapes per chunk => one compiled
  program regardless of audio length (SURVEY.md §5 long-context note).
"""

from __future__ import annotations

import math
from typing import Iterable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from tpu_asr.config import ModelConfig
from tpu_asr.data.audio import load_audio
from tpu_asr.data.tokenizer import SentencePieceBPETokenizer
from tpu_asr.models.ctc_model import CTCModel
from tpu_asr.models.conformer import subsampled_length
from tpu_asr.ops.decoding import CTCDecoding


class Transcriber:
    def __init__(self, model: CTCModel, variables, tokenizer,
                 decoding: Optional[CTCDecoding] = None,
                 batch_size: int = 8, bucket_seconds: float = 4.0):
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.decoding = decoding or CTCDecoding(tokenizer, "greedy")
        self.batch_size = batch_size
        self.bucket_seconds = bucket_seconds
        self.sample_rate = model.cfg.sample_rate
        self._fwd = jax.jit(
            lambda sig, ln: self.model.apply(self.variables, sig, ln,
                                             train=False))

    def _load(self, item) -> np.ndarray:
        if isinstance(item, (str,)) or hasattr(item, "__fspath__"):
            return load_audio(item, self.sample_rate)
        return np.asarray(item, np.float32)

    def transcribe(self, audio: Sequence, return_hypotheses: bool = False,
                   timestamps: bool = False):
        """audio: list of file paths and/or float32 waveforms -> texts.

        timestamps=True (the NeMo `transcribe(..., timestamps=True)` surface,
        ctc_models.py:120-193): returns Hypothesis objects whose timestamp
        offset dicts additionally carry 'start'/'end' in SECONDS
        (offset x hop x subsampling / sample_rate)."""
        if timestamps:
            if not self.decoding.compute_timestamps:
                self.decoding = CTCDecoding(
                    self.tokenizer, self.decoding.strategy,
                    beam_width=self.decoding.beam_width,
                    compute_timestamps=True,
                    confidence_cfg=self.decoding.confidence_cfg)
            return_hypotheses = True
        signals = [self._load(a) for a in audio]
        order = np.argsort([len(s) for s in signals])
        quantum = int(self.bucket_seconds * self.sample_rate)
        results: List = [None] * len(signals)
        for start in range(0, len(order), self.batch_size):
            idxs = order[start:start + self.batch_size]
            batch = [signals[i] for i in idxs]
            max_len = max(len(s) for s in batch)
            pad = max(quantum, int(math.ceil(max_len / quantum) * quantum))
            sig = np.zeros((len(batch), pad), np.float32)
            ln = np.zeros((len(batch),), np.int32)
            for j, s in enumerate(batch):
                sig[j, : len(s)] = s
                ln[j] = len(s)
            out = self._fwd(jnp.asarray(sig), jnp.asarray(ln))
            decoded = self.decoding.ctc_decoder_predictions_tensor(
                out.log_probs, out.encoded_len,
                return_hypotheses=return_hypotheses)
            for j, i in enumerate(idxs):
                results[i] = decoded[j]
        if timestamps:
            frame_s = (self.model.cfg.preprocessor.hop_length
                       * self.model.cfg.encoder.subsampling_factor
                       / self.sample_rate)
            for h in results:
                if isinstance(h.timestamp, dict):
                    for kind in ("char", "word", "segment"):
                        for off in h.timestamp[kind]:
                            off["start"] = off["start_offset"] * frame_s
                            off["end"] = (off["end_offset"] + 1) * frame_s
        return results


class PackedTranscriber:
    """Packed-segment batch inference (data/packing.py): several utterances
    per encoder row, separated by zeroed guard gaps, with segment-block
    attention — exact per-utterance semantics (tests/test_packing.py) at a
    fraction of the padding cost on realistic duration mixes.

    Pipeline: bucketed featurize + pre-encode (one compile per bucket shape)
    -> one device gather into dense (rows, t_pack) packed frames -> ONE
    packed encoder+decoder forward -> host unpack + greedy decode.

    TPU-native serving design with no reference equivalent (NeMo pads per
    bucket; SURVEY.md N11): the encoder — ~80% of inference FLOPs — always
    runs on dense, static, MXU-shaped rows regardless of the length mix.
    """

    def __init__(self, model: CTCModel, variables, tokenizer,
                 t_pack: int = 512, row_multiple: int = 4,
                 pre_batch: int = 32, bucket_seconds: float = 4.0):
        from tpu_asr.data.packing import guard_frames
        from tpu_asr.ops.features import FilterbankFeatures

        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.t_pack = t_pack
        self.row_multiple = row_multiple
        self.pre_batch = pre_batch
        self.bucket_seconds = bucket_seconds
        self.sample_rate = model.cfg.sample_rate
        self.guard = guard_frames(model.cfg.encoder.conv_kernel_size)
        self.blank = model.cfg.decoder.num_classes
        feat = FilterbankFeatures(model.cfg.preprocessor)

        def pre(sig, ln):
            f, fl = feat(sig, ln, train=False, rng=None)
            return model.apply(variables, f, fl, method=CTCModel.pre_encode)

        self._pre = jax.jit(pre)
        self._packed = jax.jit(
            lambda p, s: model.apply(variables, p, s,
                                     method=CTCModel.forward_packed))
        self._gather = jax.jit(
            lambda big, rows, pos, valid: jnp.where(
                valid[..., None], big[rows, pos], 0))

    def _load(self, item) -> np.ndarray:
        if isinstance(item, (str,)) or hasattr(item, "__fspath__"):
            return load_audio(item, self.sample_rate)
        return np.asarray(item, np.float32)

    def greedy_ids(self, audio: Sequence) -> List[np.ndarray]:
        """audio -> per-utterance greedy frame-label arrays (pre-collapse).

        Utterances longer than t_pack encoded frames (~20.5 s at the default
        512 x 40 ms) are rejected by the packer — route long-form audio
        through ChunkedTranscriber instead."""
        from tpu_asr.data.packing import plan_packing

        signals = [self._load(a) for a in audio]
        n = len(signals)
        order = np.argsort([len(s) for s in signals])
        quantum = int(self.bucket_seconds * self.sample_rate)

        chunks, lengths = [], np.zeros(n, np.int64)
        for start in range(0, n, self.pre_batch):
            idxs = order[start:start + self.pre_batch]
            batch = [signals[i] for i in idxs]
            max_len = max(len(s) for s in batch)
            pad = max(quantum, int(math.ceil(max_len / quantum) * quantum))
            sig = np.zeros((len(batch), pad), np.float32)
            ln = np.zeros((len(batch),), np.int32)
            for j, s in enumerate(batch):
                sig[j, : len(s)] = s
                ln[j] = len(s)
            pre_x, pre_len = self._pre(jnp.asarray(sig), jnp.asarray(ln))
            chunks.append((idxs, pre_x))
            lengths[idxs] = np.asarray(pre_len)

        # one (n, T_src, D) tensor; row_of[i] = global row of utterance i
        t_src = max(int(c.shape[1]) for _, c in chunks)
        padded = [jnp.pad(c, ((0, 0), (0, t_src - c.shape[1]), (0, 0)))
                  for _, c in chunks]
        big = jnp.concatenate(padded, axis=0)
        row_of = np.zeros(n, np.int32)
        off = 0
        for idxs, c in chunks:
            row_of[idxs] = off + np.arange(len(idxs))
            off += int(c.shape[0])

        plan = plan_packing(lengths, t_pack=self.t_pack, guard=self.guard,
                            row_multiple=self.row_multiple)
        packed = self._gather(big, jnp.asarray(row_of[plan.src_utt]),
                              jnp.asarray(plan.src_pos),
                              jnp.asarray(plan.seg_id > 0))
        _, greedy = self._packed(packed, jnp.asarray(plan.seg_id))
        from tpu_asr.data.packing import unpack_rows
        return unpack_rows(np.asarray(greedy), plan)

    def transcribe(self, audio: Sequence) -> List[str]:
        decoding = CTCDecoding(self.tokenizer, "greedy")
        texts = []
        for ids in self.greedy_ids(audio):
            keep = (ids[np.concatenate(([True], ids[1:] != ids[:-1]))]
                    if len(ids) else ids)
            toks = keep[keep != self.blank]
            texts.append(decoding.decode_tokens_to_str(
                [int(t) for t in toks]))
        return texts


class ChunkedTranscriber:
    """Fixed-window chunked inference for arbitrarily long audio."""

    def __init__(self, model: CTCModel, variables, tokenizer,
                 chunk_seconds: float = 16.0, overlap_seconds: float = 2.0):
        assert overlap_seconds * 2 < chunk_seconds
        self.model = model
        self.variables = variables
        self.decoding = CTCDecoding(tokenizer, "greedy")
        self.sample_rate = model.cfg.sample_rate
        self.chunk = int(chunk_seconds * self.sample_rate)
        self.overlap = int(overlap_seconds * self.sample_rate)
        self.hop = self.chunk - 2 * self.overlap
        self._fwd = jax.jit(
            lambda sig, ln: self.model.apply(self.variables, sig, ln,
                                             train=False))

    def _frames_for_samples(self, n: int) -> int:
        mel_frames = n // self.model.cfg.preprocessor.hop_length + 1
        return int(subsampled_length(jnp.asarray(mel_frames),
                                     self.model.cfg.encoder.subsampling_factor))

    def transcribe(self, audio: Union[str, np.ndarray]) -> str:
        x = (load_audio(audio, self.sample_rate)
             if isinstance(audio, str) or hasattr(audio, "__fspath__")
             else np.asarray(audio, np.float32))
        if len(x) <= self.chunk:
            out = self._fwd(jnp.asarray(x[None]),
                            jnp.asarray([len(x)], jnp.int32))
            return self.decoding.ctc_decoder_predictions_tensor(
                out.log_probs, out.encoded_len)[0]

        all_tokens: List[int] = []
        pos = 0
        first = True
        while pos < len(x):
            lo = max(0, pos - self.overlap)
            seg = x[lo: lo + self.chunk]
            seg_len = len(seg)
            if seg_len < self.chunk:
                seg = np.pad(seg, (0, self.chunk - seg_len))
            out = self._fwd(jnp.asarray(seg[None]),
                            jnp.asarray([seg_len], jnp.int32))
            lp = np.asarray(out.log_probs)[0]
            n_frames = int(np.asarray(out.encoded_len)[0])

            # keep only the frames whose window center lies in [pos, pos+hop)
            left_drop = 0 if first else self._frames_for_samples(pos - lo)
            is_last = lo + seg_len >= len(x)
            right_keep = n_frames if is_last else self._frames_for_samples(
                pos - lo + self.hop)
            keep = lp[left_drop:right_keep]
            if keep.shape[0] > 0:
                hyp = self.decoding.ctc_decoder_predictions_tensor(
                    keep[None], np.asarray([keep.shape[0]]),
                    return_hypotheses=True)[0]
                all_tokens.extend(hyp.y_sequence)
            pos += self.hop
            first = False
        return self.decoding.decode_tokens_to_str(all_tokens)
