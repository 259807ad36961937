"""AR / LTA datasets over the Ego4D fho_lta annotation files.

Behavioral reference: HOI/dataset/lta/long_term_anticipation.py —
``Ego4dRecognition`` (:109-159: one labeled clip per action annotation,
center clip sampling at val/test, random at train),
``Ego4dLongTermAnticipation`` (:200-346: NUM_INPUT_CLIPS consecutive
input clips + the following NUM_ACTIONS_TO_PREDICT=20 action labels),
SequenceLabel variants mapping verb/noun ids to vocab tokens via the
fho_lta taxonomy, and ``make_transform`` (:35-83: uniform temporal
subsample → /255 → Normalize(0.45, 0.225) → train random short-side
scale 256-320 + 224 crop + hflip / eval short-side 256 + center crop →
slow+fast pathway pair via α-strided subsample).

Decode path: the reference uses pytorchvideo+PyAV on full videos; here
clips decode from per-clip frame directories (clips/<clip_uid>/
frame_%06d.jpg) when present, else via cv2.VideoCapture from
videos/<clip_uid>.mp4 — both host-side, overlapped with device compute
by the prefetching loader.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np

from egot2x.data.pipeline import Dataset

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

MEAN = np.array([0.45, 0.45, 0.45], dtype=np.float32)
STD = np.array([0.225, 0.225, 0.225], dtype=np.float32)


def normalize_clip(frames_u8: np.ndarray) -> np.ndarray:
    """Host-side Ego4D normalize — the parity oracle for the uint8
    pathway feed (tests/test_u8_input.py) and the STA float pipeline;
    the LTA/AR loaders ship RAW uint8 and the model stems fold this
    affine into their conv weights (nn/resnet3d.py VideoStem)."""
    return (frames_u8.astype(np.float32) / 255.0 - MEAN) / STD


def spatial_transform(frames: np.ndarray, train: bool, crop: int,
                      rng: np.random.Generator) -> np.ndarray:
    """Short-side scale + crop (+ train hflip), NTHWC uint8."""
    t, h, w, c = frames.shape
    if train:
        short = int(rng.uniform(256, 320)) if min(h, w) >= 64 else min(h, w)
    else:
        short = 256 if min(h, w) >= 256 else min(h, w)
    scale = short / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    out = np.stack([cv2.resize(f, (nw, nh)) for f in frames])
    ch = min(crop, nh)
    cw = min(crop, nw)
    if train:
        y0 = int(rng.integers(0, nh - ch + 1))
        x0 = int(rng.integers(0, nw - cw + 1))
    else:
        y0, x0 = (nh - ch) // 2, (nw - cw) // 2
    out = out[:, y0:y0 + ch, x0:x0 + cw]
    if (ch, cw) != (crop, crop):
        out = np.stack([cv2.resize(f, (crop, crop)) for f in out])
    if train and rng.uniform() < 0.5:
        out = out[:, :, ::-1]
    return np.ascontiguousarray(out)


class ClipDecoder:
    """Decode `num_frames` uniform frames of a [start, end] second window."""

    def __init__(self, root: str):
        self.clips_dir = os.path.join(root, "clips")
        self.videos_dir = os.path.join(root, "videos")

    def decode(self, clip_uid: str, start_sec: float, end_sec: float,
               num_frames: int, fps: float = 30.0) -> np.ndarray:
        frame_dir = os.path.join(self.clips_dir, clip_uid)
        want = np.linspace(start_sec, max(end_sec - 1e-3, start_sec), num_frames)
        frame_ids = np.maximum(0, (want * fps).astype(int))
        if os.path.isdir(frame_dir):
            files = sorted(os.listdir(frame_dir))
            frames = []
            for fid in frame_ids:
                f = files[min(fid, len(files) - 1)]
                img = cv2.imread(os.path.join(frame_dir, f))
                frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
            return np.stack(frames)
        video_path = os.path.join(self.videos_dir, clip_uid + ".mp4")
        cap = cv2.VideoCapture(video_path)
        frames = []
        for fid in frame_ids:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(fid))
            ret, img = cap.read()
            if not ret:
                img = frames[-1][..., ::-1] if frames else np.zeros((224, 224, 3), np.uint8)
            frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
        cap.release()
        return np.stack(frames)


def to_pathways(frames: np.ndarray, alpha: int) -> Tuple[np.ndarray, np.ndarray]:
    """fast = all frames, slow = every α-th (UniformTemporalSubsampleRepeated)."""
    fast = frames
    idx = np.linspace(0, len(frames) - 1, max(len(frames) // alpha, 1)).astype(int)
    slow = frames[idx]
    return slow, fast


class Ego4dRecognitionDataset(Dataset):
    """One (slow, fast, verb, noun) sample per action annotation."""

    def __init__(self, root: str, split: str = "train", num_frames: int = 32,
                 alpha: int = 8, crop_size: int = 224, clip_dur: float = 2.13,
                 seed: int = 0):
        self.root = root
        self.mode = split
        self.num_frames = num_frames
        self.alpha = alpha
        self.crop_size = crop_size
        self.clip_dur = clip_dur
        self.decoder = ClipDecoder(root)
        self.seed = seed  # per-item rngs: thread-safe, deterministic
        with open(os.path.join(root, f"fho_lta_{split}.json")) as f:
            anns = json.load(f)
        self.clips = anns["clips"]

    def __len__(self):
        return len(self.clips)

    def _sample_window(self, info, rng) -> Tuple[float, float]:
        s = float(info["action_clip_start_sec"])
        e = float(info["action_clip_end_sec"])
        if self.mode == "train":
            if e - s > self.clip_dur:
                s = s + rng.uniform(0, (e - s) - self.clip_dur)
        else:  # center clip (CenterClipVideoSampler)
            mid = (s + e) / 2
            s = max(mid - self.clip_dur / 2, s)
        return s, s + self.clip_dur

    def _load_clip(self, info, rng) -> Tuple[np.ndarray, np.ndarray]:
        s, e = self._sample_window(info, rng)
        frames = self.decoder.decode(info["clip_uid"], s, e, self.num_frames)
        frames = spatial_transform(frames, self.mode == "train",
                                   self.crop_size, rng)
        # raw uint8 pathways: the model stems fold the DATA.MEAN/STD
        # normalize into their conv weights (nn/resnet3d.py VideoStem;
        # MViT normalizes in-jit) — 1/4 the host->device bytes
        return to_pathways(frames, self.alpha)

    def __getitem__(self, index: int) -> Dict:
        info = self.clips[index]
        slow, fast = self._load_clip(info, np.random.default_rng([self.seed, index]))
        return {
            "slow": slow,
            "fast": fast,
            "verb": np.int64(info["verb_label"]),
            "noun": np.int64(info["noun_label"]),
            "clip_uid": f"{info['clip_uid']}:{info.get('action_idx', index)}",
        }


class Ego4dLtaDataset(Ego4dRecognitionDataset):
    """NUM_INPUT_CLIPS input clips + next Z action labels per sample
    (reference clip_forecasting_dataset grouping by clip_uid)."""

    def __init__(self, root: str, split: str = "train", num_input_clips: int = 2,
                 num_actions: int = 20, **kwargs):
        super().__init__(root, split, **kwargs)
        self.num_input_clips = num_input_clips
        self.num_actions = num_actions
        by_clip: Dict[str, List[dict]] = {}
        for c in self.clips:
            by_clip.setdefault(c["clip_uid"], []).append(c)
        self.samples = []
        for uid, anns in by_clip.items():
            anns.sort(key=lambda a: a.get("action_idx", 0))
            n = len(anns)
            for i in range(num_input_clips - 1, n - num_actions):
                self.samples.append((anns[i - num_input_clips + 1: i + 1],
                                     anns[i + 1: i + 1 + num_actions]))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int) -> Dict:
        inputs, future = self.samples[index]
        rng = np.random.default_rng([self.seed, index])
        slows, fasts = [], []
        for info in inputs:
            slow, fast = self._load_clip(info, rng)
            slows.append(slow)
            fasts.append(fast)
        verb = np.asarray([a["verb_label"] for a in future], dtype=np.int64)
        noun = np.asarray([a["noun_label"] for a in future], dtype=np.int64)
        last = inputs[-1]
        return {
            "slow": np.stack(slows),  # (N, T/α, S, S, 3)
            "fast": np.stack(fasts),  # (N, T, S, S, 3)
            "verb": verb,  # (Z,)
            "noun": noun,  # (Z,)
            "clip_uid": f"{last['clip_uid']}:{last.get('action_idx', index)}",
        }


class Ego4dLtaSeqDataset(Ego4dLtaDataset):
    """Joint seq-label LTA targets: [<action>, v1, n1, ..., vZ, nZ, </s>]
    (reference Ego4dLongTermAnticipationSequenceLabel,
    long_term_anticipation.py:460-478; 'action' is absent from the vocab
    and resolves to <unk>, mirroring torchtext's default_index)."""

    def __init__(self, vocab, verb_dict, noun_dict, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.vocab = vocab
        self.verb_dict = verb_dict
        self.noun_dict = noun_dict

    def __getitem__(self, index):
        item = super().__getitem__(index)
        v = self.vocab
        seq = [v["action"]]
        for vb, nb in zip(item["verb"], item["noun"]):
            seq.append(v[self.verb_dict[int(vb)]])
            seq.append(v[self.noun_dict[int(nb)]])
        seq.append(v["</s>"])
        item["target_seq"] = np.asarray(seq, dtype=np.int64)
        return item


class Ego4dLtaSeparateSeqDataset(Ego4dLtaDataset):
    """Separate verb/noun seq-label targets: [lta_verb, v1..vZ, </s>] and
    [lta_noun, n1..nZ, </s>] (reference
    Ego4dLongTermAnticipationSeparateSequenceLabel, :482-503)."""

    def __init__(self, vocab, verb_dict, noun_dict, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.vocab = vocab
        self.verb_dict = verb_dict
        self.noun_dict = noun_dict

    def __getitem__(self, index):
        item = super().__getitem__(index)
        v = self.vocab
        verbs = [v[self.verb_dict[int(x)]] for x in item["verb"]]
        nouns = [v[self.noun_dict[int(x)]] for x in item["noun"]]
        item["target_seq_verb"] = np.asarray(
            [v["lta_verb"]] + verbs + [v["</s>"]], dtype=np.int64)
        item["target_seq_noun"] = np.asarray(
            [v["lta_noun"]] + nouns + [v["</s>"]], dtype=np.int64)
        return item
