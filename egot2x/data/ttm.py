"""TTM (talking-to-me) dataset: segment index + face-crop/audio loader.

Behavioral reference: HHI/dataset/ttm/data_loader.py — ``make_dataset``
(:120-165: segments from GT JSON where label=1 iff 'tags' present; train
drops segments <15 frames; segments >150 frames split into ≤150-frame
chunks sharing the annotation idx), per-frame face crops via interpolated
tracklets (``get_bbox`` :97-117), audio = wav slice
[start/30·sr, end/30·sr] RMS-normalized to 0.1 (:273-289, ``normalize``
:91-94), and EgoT2-g token targets (``ImagerSeqLoader`` :298-318).

Variable lengths are handled by bucketed truncation
(egot2x.data.bucketing) instead of the reference's per-batch
min-truncation — same semantics, static XLA shapes.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from egot2x.data.bucketing import BucketedDataset
from egot2x.data.lam import interpolate_track, normalize_frames

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

FPS = 30.0


def normalize_audio(samples: np.ndarray, desired_rms: float = 0.1,
                    eps: float = 1e-4) -> np.ndarray:
    rms = max(eps, float(np.sqrt(np.mean(samples ** 2))))
    return (samples * (desired_rms / rms)).astype(np.float32)


def get_bbox(uid: str, json_path: str) -> Dict[str, tuple]:
    """frame:personid → interpolated bbox (reference get_bbox)."""
    bboxes: Dict[str, tuple] = {}
    for t in sorted(glob.glob(os.path.join(json_path, uid, "*.json"))):
        with open(t) as j:
            frames = json.load(j)
        frames.sort(key=lambda x: x["frameNumber"])
        for fr in interpolate_track(frames):
            key = f"{fr['frameNumber']}:{fr['Person ID']}"
            bboxes[key] = (fr["x"], fr["y"], fr["x"] + fr["width"],
                           fr["y"] + fr["height"])
    return bboxes


def make_dataset(
    file_list: str,
    img_anno: str,
    audio_anno: str,
    min_frames: int = 15,
    max_frames: int = 150,
    is_train: Optional[bool] = None,
) -> Tuple[List[list], Dict[str, Dict[str, tuple]]]:
    """Segments [uid, personid, label, start, end, idx] + face crops."""
    if is_train is None:
        is_train = "train" in os.path.basename(file_list)
    face_crop: Dict[str, Dict[str, tuple]] = {}
    segments: List[list] = []
    with open(file_list) as f:
        uids = [l.strip() for l in f if l.strip()]
    for uid in uids:
        face_crop[uid] = get_bbox(uid, img_anno)
        with open(os.path.join(audio_anno, uid + ".json")) as js:
            gts = json.load(js)
        for idx, gt in enumerate(gts):
            personid = gt["label"]
            label = 1 if "tags" in gt else 0
            start_frame = int(gt["start_frame"])
            end_frame = int(gt["end_frame"])
            seg_length = end_frame - start_frame + 1
            if (is_train and seg_length < min_frames) or seg_length <= 1 or personid == 0:
                continue
            if seg_length > max_frames:
                for i in range(int(seg_length / max_frames)):
                    sub_start = start_frame + i * max_frames
                    sub_end = min(end_frame, sub_start + max_frames)
                    if sub_end - sub_start + 1 < min_frames:
                        continue
                    segments.append([uid, personid, label, sub_start, sub_end, idx])
            else:
                segments.append([uid, personid, label, start_frame, end_frame, idx])
    return segments, face_crop


class TtmSegmentDataset(BucketedDataset):
    """Variable-length TTM segments with bucketed truncation.

    get_item(idx, n): first n frames of the segment (face crops, NTHWC
    normalized) + first n/30·sr audio samples (RMS-normalized), matching
    the reference's min-truncation collate applied at bucket granularity.
    """

    def __init__(
        self,
        root: str,
        split: str = "train",
        img_size: int = 224,
        sample_rate: int = 16000,
    ):
        self.root = root
        self.img_path = os.path.join(root, "imgs")
        self.wave_path = os.path.join(root, "wave")
        self.img_size = img_size
        self.sample_rate = sample_rate
        self.segments, self.face_crop = make_dataset(
            os.path.join(root, f"{split}.list"),
            os.path.join(root, "json"),
            os.path.join(root, "gt"),
            is_train=(split == "train"),
        )
        self._wave_cache: Dict[str, np.ndarray] = {}

    def __len__(self) -> int:
        return len(self.segments)

    @property
    def lengths(self) -> np.ndarray:
        return np.asarray([s[4] - s[3] + 1 for s in self.segments])

    def _read_wave(self, uid: str) -> np.ndarray:
        if uid not in self._wave_cache:
            from scipy.io import wavfile

            sr, wave = wavfile.read(os.path.join(self.wave_path, uid + ".wav"))
            if wave.dtype.kind == "i":
                wave = wave.astype(np.float32) / np.iinfo(wave.dtype).max
            if wave.ndim > 1:
                wave = wave.mean(axis=1)
            assert sr == self.sample_rate, f"expected {self.sample_rate}Hz, got {sr}"
            self._wave_cache[uid] = wave.astype(np.float32)
        return self._wave_cache[uid]

    def _frames(self, uid, personid, start, n_frames) -> np.ndarray:
        s = self.img_size
        out = np.zeros((n_frames, s, s, 3), dtype=np.uint8)
        crops = self.face_crop[uid]
        for j, i in enumerate(range(start, start + n_frames)):
            key = f"{i}:{personid}"
            img_file = os.path.join(self.img_path, uid, f"img_{i:05d}.jpg")
            if key not in crops or not os.path.exists(img_file):
                continue
            img = cv2.imread(img_file)
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            x1, y1, x2, y2 = (int(v) for v in crops[key])
            face = img[y1:y2, x1:x2, :]
            if face.size:
                out[j] = cv2.resize(face, (s, s))
        return out

    def get_item(self, idx: int, n_frames: int) -> Dict:
        uid, personid, label, start, end, ann_idx = self.segments[idx]
        seg_len = end - start + 1
        n = min(n_frames, seg_len)
        frames = self._frames(uid, personid, start, n)
        if n < n_frames:  # shorter than smallest bucket: edge-pad
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], n_frames - n, axis=0)]
            )
        wave = self._read_wave(uid)
        onset = int(start / FPS * self.sample_rate)
        n_samples = int(n_frames / FPS * self.sample_rate)
        audio = wave[onset : onset + n_samples]
        if len(audio) < n_samples:
            audio = np.pad(audio, (0, n_samples - len(audio)))
        return {
            "frames": normalize_frames(frames),
            "audio": normalize_audio(audio),
            "label": np.int64(label),
            "seg_id": f"{uid}:{ann_idx}",
            "start": np.int64(start),
            "end": np.int64(end),
        }


class TtmTestDataset(BucketedDataset):
    """Challenge-test layout (reference test_ImagerLoader,
    HHI/dataset/ttm/test_loader.py:76-180): <root>/<sid>/audio/aud.wav +
    <root>/<sid>/face/*.jpg with a seg_info.json giving frame counts and
    frame lists; long segments chunked like training."""

    def __init__(self, data_path: str, seg_info_path: str,
                 img_size: int = 224, sample_rate: int = 16000,
                 min_frames: int = 15, max_frames: int = 150):
        self.data_path = data_path
        self.img_size = img_size
        self.sample_rate = sample_rate
        with open(seg_info_path) as f:
            self.seg_info = json.load(f)
        self.segments = []
        for sid in sorted(os.listdir(data_path)):
            if sid not in self.seg_info:
                continue
            n = int(self.seg_info[sid]["frame_num"])
            start, end = 0, n - 1
            if n > max_frames:
                for i in range(int(n / max_frames)):
                    s = start + i * max_frames
                    e = min(end, s + max_frames)
                    if e - s + 1 >= min_frames:
                        self.segments.append([sid, s, e])
            else:
                self.segments.append([sid, start, end])
        self._wave_cache: Dict[str, np.ndarray] = {}

    def __len__(self):
        return len(self.segments)

    @property
    def lengths(self) -> np.ndarray:
        return np.asarray([e - s + 1 for _, s, e in self.segments])

    def _read_wave(self, sid: str) -> np.ndarray:
        if sid not in self._wave_cache:
            from scipy.io import wavfile

            sr, wave = wavfile.read(
                os.path.join(self.data_path, sid, "audio", "aud.wav"))
            if wave.dtype.kind == "i":
                wave = wave.astype(np.float32) / np.iinfo(wave.dtype).max
            if wave.ndim > 1:
                wave = wave.mean(axis=1)
            self._wave_cache[sid] = wave.astype(np.float32)
        return self._wave_cache[sid]

    def get_item(self, idx: int, n_frames: int) -> Dict:
        try:
            import cv2
        except ImportError:  # pragma: no cover
            raise RuntimeError("cv2 required")
        from egot2x.data.lam import normalize_frames

        sid, start, end = self.segments[idx]
        s = self.img_size
        frames = np.zeros((n_frames, s, s, 3), dtype=np.uint8)
        face_dir = os.path.join(self.data_path, sid, "face")
        frame_list = self.seg_info[sid].get("frame_list", [])
        if os.path.isdir(face_dir):
            files = sorted(os.listdir(face_dir))
            for j, i in enumerate(range(start, min(start + n_frames, end + 1))):
                if i < len(files):
                    img = cv2.imread(os.path.join(face_dir, files[i]))
                    if img is not None:
                        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                        frames[j] = cv2.resize(img, (s, s))
        wave = self._read_wave(sid)
        onset = int(start / FPS * self.sample_rate)
        n_samples = int(n_frames / FPS * self.sample_rate)
        audio = wave[onset: onset + n_samples]
        if len(audio) < n_samples:
            audio = np.pad(audio, (0, n_samples - len(audio)))
        fids = frame_list[start: start + n_frames] if frame_list else \
            list(range(start, start + n_frames))
        return {
            "frames": normalize_frames(frames),
            "audio": normalize_audio(audio),
            "seg_id": f"{sid}:{start}",
            "sid": sid,
            "start": np.int64(start),
            "end": np.int64(end),
            "frame_ids": ",".join(str(f) for f in fids),
        }


class TtmSeqDataset(TtmSegmentDataset):
    """EgoT2-g target tokens: [<ttm>, <label>, </s>]."""

    def __init__(self, vocab, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.vocab = vocab

    def get_item(self, idx: int, n_frames: int) -> Dict:
        item = super().get_item(idx, n_frames)
        label = int(item["label"])
        item["target_seq"] = np.asarray(
            [self.vocab["ttm"], self.vocab[str(label)], self.vocab["</s>"]],
            dtype=np.int64,
        )
        return item
