"""Packed-segment batching for inference/serving.

Real eval batches (LibriSpeech-like duration distributions) waste most of a
static-shape batch on padding: a 15 s bucket holding 4-8 s utterances runs the
encoder on 2x the frames it needs. Packing places several utterances end to
end in one row, separated by short zeroed GUARD gaps, and runs the encoder
once over dense rows:

    row 0: [ utt 3 ....... |g| utt 7 .... |g| utt 12 .. |  pad ]
    row 1: [ utt 1 ......... |g| utt 9 ...... |g| utt 4 ...... ]

Exactness (not an approximation — parity-tested in tests/test_packing.py):
- Packing happens AFTER the conv-subsampling pre-encode (CTCModel.pre_encode),
  so the frontend / per-utterance feature normalization / subsampling see the
  ordinary per-utterance batches.
- Attention uses a segment-block mask (seg_id[t] == seg_id[s]; models/
  conformer.py RelPositionMultiHeadAttention) and relative-position scores
  are translation-invariant, so within-segment attention is bit-equivalent
  to the per-utterance forward.
- The depthwise conv (kernel k, receptive field ±(k-1)/2) reads only zeros
  across a guard of >= (k-1)/2 frames: every conformer layer re-masks its
  output (guard positions are seg 0 = invalid), so bleed cannot accumulate
  across layers. `guard_frames(cfg)` derives the minimal safe guard.

The reference has no equivalent (NeMo pads per bucket; SURVEY.md N11
semi-sorted batching) — this is TPU-native serving design: static shapes,
dense MXU work, no dynamic control flow.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np


def guard_frames(conv_kernel_size: int) -> int:
    """Minimal inter-segment gap (in post-subsampling frames) that keeps the
    depthwise conv from reading a neighbouring segment: (k-1)/2, rounded up
    to a multiple of 8 sublanes (cheap insurance, still tiny vs ~150-frame
    average segments)."""
    need = (conv_kernel_size - 1) // 2
    return max(8, -(-need // 8) * 8)


@dataclass
class PackPlan:
    """Placement of N segments into (n_rows, t_pack) packed rows.

    Per-utterance arrays (length N): `row`, `start`, `length`.
    Device-gather arrays (n_rows, t_pack): `src_utt`, `src_pos` index into
    the (N, T_src, D) per-utterance feature tensor; `seg_id` is the packed
    segment map (0 = guard/pad, else 1-based per-row segment index).
    """

    t_pack: int
    n_rows: int
    row: np.ndarray          # (N,) int32
    start: np.ndarray        # (N,) int32
    length: np.ndarray       # (N,) int32
    seg_id: np.ndarray       # (n_rows, t_pack) int32
    src_utt: np.ndarray      # (n_rows, t_pack) int32
    src_pos: np.ndarray      # (n_rows, t_pack) int32

    @property
    def fill_ratio(self) -> float:
        return float(self.length.sum()) / (self.n_rows * self.t_pack)


def plan_packing(lengths: Sequence[int], t_pack: int, guard: int,
                 row_multiple: int = 1,
                 pad_rows_to: int = 0) -> PackPlan:
    """First-fit-decreasing bin packing of segments of `lengths` frames into
    rows of `t_pack` frames with `guard` zeroed frames between consecutive
    segments (none before the first or after the last). `row_multiple` pads
    the row count up (recompilation control: jit sees a few row-batch shapes
    instead of every integer); `pad_rows_to` forces an exact row count (one
    static shape across training batches)."""
    lengths = np.asarray(lengths, np.int64)
    n = len(lengths)
    if n and int(lengths.max()) > t_pack:
        raise ValueError(f"segment of {int(lengths.max())} frames exceeds "
                         f"t_pack={t_pack}")
    if (lengths <= 0).any():
        raise ValueError("all segment lengths must be positive")
    order = np.argsort(-lengths, kind="stable")
    row = np.zeros(n, np.int32)
    start = np.zeros(n, np.int32)
    cursors: List[int] = []            # next free frame per row
    for i in order:
        ln = int(lengths[i])
        for r, cur in enumerate(cursors):
            need = cur + (guard if cur else 0)
            if need + ln <= t_pack:
                row[i], start[i] = r, need
                cursors[r] = need + ln
                break
        else:
            row[i], start[i] = len(cursors), 0
            cursors.append(ln)
    n_rows = max(len(cursors), 1)
    n_rows = -(-n_rows // row_multiple) * row_multiple
    if pad_rows_to:
        if len(cursors) > pad_rows_to:
            raise ValueError(f"packing needs {len(cursors)} rows > "
                             f"pad_rows_to={pad_rows_to}")
        n_rows = pad_rows_to

    seg_id = np.zeros((n_rows, t_pack), np.int32)
    src_utt = np.zeros((n_rows, t_pack), np.int32)
    src_pos = np.zeros((n_rows, t_pack), np.int32)
    per_row_next = np.zeros(n_rows, np.int32)
    # deterministic 1-based per-row ids in start order
    for i in np.lexsort((start, row)):
        r, s, ln = int(row[i]), int(start[i]), int(lengths[i])
        per_row_next[r] += 1
        seg_id[r, s:s + ln] = per_row_next[r]
        src_utt[r, s:s + ln] = i
        src_pos[r, s:s + ln] = np.arange(ln)
    return PackPlan(t_pack=t_pack, n_rows=n_rows, row=row, start=start,
                    length=lengths.astype(np.int32), seg_id=seg_id,
                    src_utt=src_utt, src_pos=src_pos)


def pack_frames(feats, plan: PackPlan):
    """Gather per-utterance frames (N, T_src, D) into packed rows
    (n_rows, t_pack, D); guard/pad positions are zeroed. jnp-compatible
    (one device gather)."""
    import jax.numpy as jnp

    packed = feats[plan.src_utt, plan.src_pos]
    valid = jnp.asarray(plan.seg_id > 0)
    return jnp.where(valid[..., None], packed, 0)


def train_pack_arrays(signal_lens, n_fft: int, hop_length: int,
                      subsampling_factor: int, subsampling: str,
                      conv_kernel_size: int, t_pack: int,
                      row_multiple: int = 1, pad_rows_to: int = 0):
    """Packed-TRAINING plan for one batch, computed host-side from the
    DETERMINISTIC length arithmetic (stft_seq_len -> subsampled_length —
    no model execution needed). Returns a dict of np arrays to merge into
    the batch (train/trainer.make_distil_train_step(packed=True)):
    pk_src_utt/pk_src_pos/pk_seg (R, Tp) and pk_row/pk_start (B,)."""
    from tpu_asr.models.conformer import subsampled_length
    from tpu_asr.ops.features import stft_seq_len

    lens = np.asarray(signal_lens, np.int64)
    frames = np.asarray(stft_seq_len(lens, n_fft, hop_length))
    enc = np.asarray(subsampled_length(frames, subsampling_factor,
                                       subsampling))
    plan = plan_packing(enc, t_pack=t_pack,
                        guard=guard_frames(conv_kernel_size),
                        row_multiple=row_multiple, pad_rows_to=pad_rows_to)
    return {
        "pk_src_utt": plan.src_utt.astype(np.int32),
        "pk_src_pos": plan.src_pos.astype(np.int32),
        "pk_seg": plan.seg_id.astype(np.int32),
        "pk_row": plan.row.astype(np.int32),
        "pk_start": plan.start.astype(np.int32),
    }, plan


def unpack_rows(rows, plan: PackPlan) -> List[np.ndarray]:
    """Split per-frame outputs (n_rows, t_pack, ...) back into N
    per-utterance arrays (host-side numpy)."""
    rows = np.asarray(rows)
    return [rows[plan.row[i], plan.start[i]:plan.start[i] + plan.length[i]]
            for i in range(len(plan.row))]
