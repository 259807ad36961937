"""ASD (active speaker detection) dataset — TalkNet-style trial list.

Behavioral reference: HHI/dataset/asd/dataLoader.py — CSV trial rows
``trackid \t numframes \t fps \t labels \t ... \t start`` where
``trackid[:36]`` is the video uid (:318-335); per-frame labels parsed
from the bracketed list (:307-314); audio = wav slice
[start/fps, (start+numframes)/fps] normalized to RMS 0.1 after /32768
(:18-22); MFCC with fps-scaled windows (winlen 0.025·25/fps, :69) giving
4 MFCC steps per video frame; visual = 112×112 grayscale square crops
with median-filtered size + EMA-smoothed centers (:92-151); train augs:
audio SNR(−5..5) overlay of another sample (:42-55), visual
flip/crop/rotate (:117-150).

TPU-native restructuring: the reference dataset builds its *own*
minibatches sorted by length (DataLoader batch_size=1, :316-335); here
the generic BucketBatchLoader provides static-shape batches, and the
noise pool for audio overlay is the whole split rather than the
minibatch (a superset of the reference's augmentation distribution).

Layout: <root>/csv/active_speaker_{train,val}.csv, <root>/bbox/<trackid>.json,
<root>/wave/<uid>.wav, <root>/imgs/<uid>/img_%05d.jpg.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np
from scipy import signal as sp_signal
from scipy.io import wavfile

from egot2x.audio.mfcc import mfcc_np
from egot2x.data.bucketing import BucketedDataset

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

CROP_SIZE = 112


def normalize_audio_int16(samples: np.ndarray, desired_rms: float = 0.1,
                          eps: float = 1e-4) -> np.ndarray:
    samples = samples / 32768.0
    rms = max(eps, float(np.sqrt(np.mean(samples ** 2))))
    return (samples * (desired_rms / rms)).astype(np.float32)


def overlap_noise(audio: np.ndarray, noise: np.ndarray, snr_db: float) -> np.ndarray:
    """SNR-matched additive overlay (reference ``overlap``, :42-55)."""
    if len(noise) < len(audio):
        noise = np.pad(noise, (0, len(audio) - len(noise)), mode="wrap")
    else:
        noise = noise[: len(audio)]
    noise_db = 10 * np.log10(np.mean(np.abs(noise ** 2)) + 1e-4)
    clean_db = 10 * np.log10(np.mean(np.abs(audio ** 2)) + 1e-4)
    noise = np.sqrt(10 ** ((clean_db - noise_db - snr_db) / 10)) * noise
    return (audio + noise).astype(np.float32)


def smooth_dets(track: List[dict]) -> Dict[str, np.ndarray]:
    """Median-filtered half-size + EMA-smoothed centers (:92-106)."""
    s, x, y = [], [], []
    for fr in track:
        x1, y1 = fr["x"], fr["y"]
        x2, y2 = fr["x"] + fr["width"], fr["y"] + fr["height"]
        s.append(max(y2 - y1, x2 - x1) / 2)
        y.append((y2 + y1) / 2)
        x.append((x2 + x1) / 2)
    kernel = min(len(s) - len(s) % 2 + 1, 13)
    s = sp_signal.medfilt(s, kernel_size=kernel)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    x[1:] = x[:-1] * 0.8 + x[1:] * 0.2
    y[1:] = y[:-1] * 0.8 + y[1:] * 0.2
    return {"x": x, "y": y, "s": np.asarray(s, dtype=np.float64)}


def crop_face_square(img: np.ndarray, cx: float, cy: float, half: float) -> np.ndarray:
    """Pad + center square crop → 112×112 gray (:136-151)."""
    cs = 0.4
    bsi = int(half * (1 + 2 * cs))
    img = np.pad(img, ((bsi, bsi), (bsi, bsi), (0, 0)), constant_values=110)
    my, mx = cy + bsi, cx + bsi
    face = img[int(my - half): int(my + half * (1 + 2 * cs)),
               int(mx - half * (1 + cs)): int(mx + half * (1 + cs))]
    face = cv2.cvtColor(face, cv2.COLOR_BGR2GRAY)
    face = cv2.resize(face, (2 * CROP_SIZE, 2 * CROP_SIZE))
    h = CROP_SIZE
    return face[h - h // 2: h + h // 2, h - h // 2: h + h // 2]


class AsdTrialDataset(BucketedDataset):
    """Per-trial variable-length (mfcc, faces, frame labels).

    ``with_rgb=True`` additionally produces the TTM-style 224-RGB face
    stream and the raw normalized wave (reference load_visual_2task /
    train_loader_2task, dataLoader.py:155-260) for the EgoT2-g
    cross-task encodings.
    """

    def __init__(self, root: str, split: str = "train", augment: Optional[bool] = None,
                 seed: int = 0, with_rgb: bool = False, rgb_size: int = 224):
        # per-item RNGs are derived from (seed, idx) in get_item: the
        # loader's thread pool calls get_item concurrently and a shared
        # Generator is neither thread-safe nor deterministic
        self.root = root
        self.with_rgb = with_rgb
        self.rgb_size = rgb_size
        self.augment = (split == "train") if augment is None else augment
        self.seed = seed
        csv_path = os.path.join(root, "csv", f"active_speaker_{split}.csv")
        self.trials = []
        with open(csv_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                parts = line.split("\t")
                self.trials.append({
                    "trackid": parts[0],
                    "num_frames": int(parts[1]),
                    "fps": float(parts[2]),
                    "labels": np.asarray(
                        [int(v) for v in parts[3].strip("[]").split(",")],
                        dtype=np.int64),
                    "start": int(parts[-1]),
                })
        self._wave_cache: Dict[str, tuple] = {}

    def __len__(self) -> int:
        return len(self.trials)

    @property
    def lengths(self) -> np.ndarray:
        return np.asarray([t["num_frames"] for t in self.trials])

    def _read_wave(self, uid: str):
        if uid not in self._wave_cache:
            sr, wave = wavfile.read(os.path.join(self.root, "wave", uid + ".wav"))
            if wave.ndim > 1:
                wave = wave.mean(axis=1)
            self._wave_cache[uid] = (sr, wave)
        return self._wave_cache[uid]

    def _load_audio(self, trial, n_frames: int, with_aug: bool,
                    rng: np.random.Generator) -> np.ndarray:
        uid = trial["trackid"][:36]
        sr, wave = self._read_wave(uid)
        fps = trial["fps"]
        start = trial["start"] / fps
        end = (trial["start"] + trial["num_frames"]) / fps
        audio = wave[int(start * sr): int(end * sr)]
        if len(audio) == 0:
            audio = np.zeros(int(end * sr) - int(start * sr))
        audio = normalize_audio_int16(audio.astype(np.float64))
        if with_aug and rng.integers(0, 2) == 1 and len(self.trials) > 1:
            other = self.trials[int(rng.integers(0, len(self.trials)))]
            osr, owave = self._read_wave(other["trackid"][:36])
            os_ = other["start"] / other["fps"]
            oe = (other["start"] + other["num_frames"]) / other["fps"]
            noise = normalize_audio_int16(owave[int(os_ * osr): int(oe * osr)].astype(np.float64))
            if len(noise):
                audio = overlap_noise(audio, noise, float(rng.uniform(-5, 5)))
        feat = mfcc_np(audio, 16000, winlen=0.025 * 25 / fps,
                       winstep=0.010 * 25 / fps, num_frames=4 * n_frames)
        return feat.astype(np.float32)

    def _load_visual(self, trial, n_frames: int, with_aug: bool,
                     rng: np.random.Generator) -> np.ndarray:
        trackid = trial["trackid"]
        uid = trackid[:36]
        with open(os.path.join(self.root, "bbox", trackid + ".json")) as f:
            bbox = {b["frame"]: b for b in json.load(f)}
        frames = [bbox[i] for i in range(trial["start"], trial["start"] + trial["num_frames"])
                  if i in bbox]
        # uint8: every aug op (flip/crop/resize/warpAffine) runs on the
        # native cv2 u8 crops, so values are already integers — ship raw
        # bytes (4x less host->device) and let TalkNet normalize in-jit
        out = np.zeros((n_frames, CROP_SIZE, CROP_SIZE), dtype=np.uint8)
        if not frames:
            return out
        dets = smooth_dets(frames)
        aug_type = "orig"
        if with_aug:
            h = CROP_SIZE
            new = int(h * rng.uniform(0.7, 1))
            ax, ay = int(rng.integers(0, h - new)), int(rng.integers(0, h - new))
            rot = cv2.getRotationMatrix2D((h / 2, h / 2), float(rng.uniform(-15, 15)), 1)
            aug_type = ["orig", "flip", "crop", "rotate"][int(rng.integers(0, 4))]
        j = 0
        for i, fr in enumerate(frames):
            if j >= n_frames:
                break
            img_path = os.path.join(self.root, "imgs", uid, f"img_{int(fr['frame']):05d}.jpg")
            if not os.path.exists(img_path):
                continue
            img = cv2.imread(img_path)
            face = crop_face_square(img, dets["x"][i], dets["y"][i], dets["s"][i])
            if aug_type == "flip":
                face = cv2.flip(face, 1)
            elif aug_type == "crop":
                face = cv2.resize(face[ay:ay + new, ax:ax + new], (CROP_SIZE, CROP_SIZE))
            elif aug_type == "rotate":
                face = cv2.warpAffine(face, rot, (CROP_SIZE, CROP_SIZE))
            out[j] = face
            j += 1
        return out

    def get_item(self, idx: int, n_frames: int) -> Dict:
        trial = self.trials[idx]
        n = min(n_frames, trial["num_frames"])
        rng = np.random.default_rng([self.seed, idx])
        mfcc_feat = self._load_audio(trial, n_frames, self.augment, rng)
        faces = self._load_visual(trial, n_frames, self.augment, rng)
        labels = trial["labels"][:n_frames]
        if len(labels) < n_frames:
            labels = np.pad(labels, (0, n_frames - len(labels)), mode="edge")
        item = {
            "mfcc": mfcc_feat,          # (4*n_frames, 13)
            "faces": faces,             # (n_frames, 112, 112) gray [0,255]
            "labels": labels,           # (n_frames,)
            "trackid": trial["trackid"],
        }
        if self.with_rgb:
            item["frames"] = self._load_rgb(trial, n_frames)
            item["audio"] = self._load_wave_slice(trial, n_frames)
        return item

    def _load_rgb(self, trial, n_frames: int) -> np.ndarray:
        """TTM-style normalized RGB bbox crops (n, S, S, 3)."""
        from egot2x.data.lam import normalize_frames

        trackid = trial["trackid"]
        uid = trackid[:36]
        s = self.rgb_size
        out = np.zeros((n_frames, s, s, 3), dtype=np.uint8)
        with open(os.path.join(self.root, "bbox", trackid + ".json")) as f:
            bbox = {b["frame"]: b for b in json.load(f)}
        j = 0
        for i in range(trial["start"], trial["start"] + trial["num_frames"]):
            if j >= n_frames or i not in bbox:
                continue
            img_path = os.path.join(self.root, "imgs", uid, f"img_{i:05d}.jpg")
            if not os.path.exists(img_path):
                continue
            img = cv2.imread(img_path)
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            b = bbox[i]
            x1, y1 = int(b["x"]), int(b["y"])
            x2, y2 = int(b["x"] + b["width"]), int(b["y"] + b["height"])
            face = img[y1:y2, x1:x2]
            if face.size:
                out[j] = cv2.resize(face, (s, s))
            j += 1
        return normalize_frames(out)

    def _load_wave_slice(self, trial, n_frames: int) -> np.ndarray:
        uid = trial["trackid"][:36]
        sr, wave = self._read_wave(uid)
        fps = trial["fps"]
        onset = int(trial["start"] / fps * sr)
        n_samples = int(n_frames / fps * 16000)
        audio = wave[onset: onset + n_samples].astype(np.float64)
        if len(audio) < n_samples:
            audio = np.pad(audio, (0, n_samples - len(audio)))
        return normalize_audio_int16(audio)


class AsdSeqDataset(AsdTrialDataset):
    """EgoT2-g per-frame token targets: [[<asd>, <label_t>, </s>]]_t."""

    def __init__(self, vocab, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.vocab = vocab

    def get_item(self, idx: int, n_frames: int) -> Dict:
        item = super().get_item(idx, n_frames)
        item["target_seq"] = np.stack([
            np.asarray([self.vocab["asd"], self.vocab[str(int(l))], self.vocab["</s>"]],
                       dtype=np.int64)
            for l in item["labels"]
        ])
        return item
