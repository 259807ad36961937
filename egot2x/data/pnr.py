"""PNR/OSCC dataset: keyframe localisation + state-change clips.

Behavioral reference: HOI/dataset/pnr/StateChangeDetectionAndKeyframe
Localisation.py:26-366 —
  * annotations {train,val,test}.json list clips with unique_id,
    clip_start/end_{sec,frame}, pnr_frame, state_change flag;
  * frames live in jpeg caches positive/<uid>/<frame>.jpeg and
    negative/<uid>/ (the reference lazily extracts them from full mp4s
    via PyAV on first epoch, :116-200 — here extraction uses
    cv2.VideoCapture when a videos/ dir is present, else the cache is
    expected to exist);
  * sampling (:202-266): 16 = SAMPLING_FPS·CLIP_LEN_SEC frames via the
    lower/upper-lim modulo scheme; train mode jitters a 5-8 s window
    keeping the PNR frame inside (:287-312);
  * labels: one-hot at the frame nearest the PNR (:337-342), zeros for
    no-state-change clips; effective fps returned for the seconds
    metric (:345-349).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from egot2x.data.pipeline import Dataset

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def sample_frames(start: int, end: int, num_required: int, pnr_frame):
    """Reference _sample_frames modulo scheme (:202-266)."""
    num_frames = end - start
    assert num_frames >= num_required, "Can't sample more frames than exist"
    lower = int(np.floor(num_frames / num_required))
    upper = int(np.ceil(num_frames / num_required))
    lower_frames, upper_frames = [], []
    lower_cand, upper_cand = [], []
    for fc in range(start, end):
        if lower > 0 and fc % lower == 0:
            lower_frames.append(fc)
            lower_cand.append(abs(fc - pnr_frame) if pnr_frame is not None else 0.0)
        if upper > 0 and fc % upper == 0:
            upper_frames.append(fc)
            upper_cand.append(abs(fc - pnr_frame) if pnr_frame is not None else 0.0)
    if len(upper_frames) < num_required:
        return lower_frames[:num_required], lower_cand[:num_required]
    return upper_frames[:num_required], upper_cand[:num_required]


class PnrClipDataset(Dataset):
    """16-frame clips + keyframe/state labels, NTHWC uint8 [0,255]."""

    def __init__(
        self,
        root: str,
        split: str = "train",
        crop_size: int = 225,
        sampling_fps: int = 2,
        clip_len_sec: int = 8,  # 2 fps × 8 s = 16 frames (ts_pnr.yaml)
        no_state_chng: bool = False,
    ):
        self.root = root
        self.mode = split
        self.crop_size = crop_size
        self.num_frames = sampling_fps * clip_len_sec
        with open(os.path.join(root, f"{split}.json")) as f:
            anns = json.load(f)
        self.clips: List[dict] = []
        for clip in anns.get("clips", anns):
            if no_state_chng and not clip.get("state_change", False):
                continue
            self.clips.append(clip)
        self.positive_dir = os.path.join(root, "positive")
        self.negative_dir = os.path.join(root, "negative")
        self.seed = 0  # per-item rngs derived from (seed, index): thread-safe

    def __len__(self) -> int:
        return len(self.clips)

    def _clip_dir(self, info) -> str:
        base = self.positive_dir if info.get("pnr_frame") is not None else self.negative_dir
        return os.path.join(base, str(info["unique_id"]))

    def _load_frame(self, path: str) -> np.ndarray:
        img = cv2.imread(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        # ships RAW uint8: the PNR models cast in-jit (raw-[0,255]
        # convention, nn/resnet3d.py VideoStem input_norm=None) — 1/4
        # the host->device bytes, bit-identical values
        return cv2.resize(img, (self.crop_size, self.crop_size))

    def _load_frames(self, paths) -> np.ndarray:
        """Batched C++ decode+resize across a thread pool when available
        (egot2x.native, same fast path as the LAM loader); python/cv2
        fallback otherwise. Full-frame bboxes (x1 < 0) ⇒ resize only."""
        try:
            from egot2x import native

            if native.AVAILABLE and all(os.path.exists(p) for p in paths):
                bboxes = np.full((len(paths), 4), -1.0, np.float32)
                return native.decode_crop_resize(bboxes=bboxes, paths=paths,
                                                 out_size=self.crop_size)
        except Exception:
            pass
        return np.stack([self._load_frame(p) for p in paths])

    def __getitem__(self, index: int) -> Dict:
        info = self.clips[index]
        pnr_frame = info.get("pnr_frame")
        clip_start = int(info["clip_start_frame"])
        clip_end = int(info["clip_end_frame"])
        rng = np.random.default_rng([self.seed, index])
        if self.mode == "train":
            # 5-8 s random window, PNR kept inside (:287-312)
            rand_len = rng.uniform(5, 8)
            rand_start_sec = info["clip_start_sec"] + rng.uniform(0, 8 - rand_len)
            start = int(np.floor(rand_start_sec * 30))
            end_sec = min(rand_start_sec + rand_len, info["clip_end_sec"])
            end = int(np.floor(end_sec * 30))
            if pnr_frame is not None:
                if pnr_frame > end:
                    end = clip_end
                if pnr_frame < start:
                    start = clip_start
        else:
            start, end = clip_start, clip_end
        frame_nums, candidates = sample_frames(start, end, self.num_frames, pnr_frame)
        clip_dir = self._clip_dir(info)
        frames = self._load_frames(
            [os.path.join(clip_dir, f"{fn}.jpeg") for fn in frame_nums])
        if pnr_frame is not None:
            labels = np.zeros(self.num_frames, dtype=np.float32)
            labels[int(np.argmin(candidates))] = 1.0
            state = 1
        else:
            labels = np.asarray(candidates, dtype=np.float32)
            state = 0
        effective_fps = self.num_frames / max((end - start) / 30.0, 1e-6)
        return {
            "frames": frames,  # (16, S, S, 3) uint8 [0,255]
            "labels": labels,  # (16,) one-hot (or zeros)
            "state": np.int64(state),
            "fps": np.float32(effective_fps),
            "clip_start_frame": np.int64(start),
            "clip_end_frame": np.int64(end),
            "pnr_frame": np.int64(pnr_frame if pnr_frame is not None else -1),
            "unique_id": str(info["unique_id"]),
        }


def extract_clip_frames(
    root: str, videos_dir: str, split: str = "train", short_side: int = 384
) -> None:
    """Materialize the jpeg frame cache from full videos via OpenCV
    (reference _extract_clip_frames, :116-200, which uses PyAV)."""
    with open(os.path.join(root, f"{split}.json")) as f:
        anns = json.load(f)
    for info in anns.get("clips", anns):
        uid = str(info["unique_id"])
        base = "positive" if info.get("pnr_frame") is not None else "negative"
        out_dir = os.path.join(root, base, uid)
        if os.path.isdir(out_dir):
            continue
        os.makedirs(out_dir, exist_ok=True)
        video_path = os.path.join(videos_dir, info["video_uid"] + ".mp4")
        cap = cv2.VideoCapture(video_path)
        start = int(info["clip_start_frame"])
        end = int(info["clip_end_frame"])
        cap.set(cv2.CAP_PROP_POS_FRAMES, start)
        for fn in range(start, end + 1):
            ret, img = cap.read()
            if not ret:
                break
            h, w = img.shape[:2]
            scale = short_side / min(h, w)
            img = cv2.resize(img, (int(w * scale), int(h * scale)))
            cv2.imwrite(os.path.join(out_dir, f"{fn}.jpeg"), img)
        cap.release()
