"""LAM (looking-at-me) dataset: index builder + clip loader.

Behavioral reference: HHI/dataset/lam/data_loader.py —
``make_dataset`` (:98-140, GT JSON scan + per-tracklet bbox linear
interpolation over frame gaps via ``check`` :46-95), 7-frame window
[f−3, f+3] with face crop/resize and zero/edge padding
(``pad_video`` :35-43, ``_get_video`` :196-241), plus the
``NewImagerLoader`` preprocessed-strip fast path (:314-373) and
token-sequence targets for EgoT2-g (``NewImagerSeqLoader`` :376-389).

On-disk layout (docs/PREPARE_HHI.md):
  <root>/json/<uid>/<trackid>.json    face tracklets (frameNumber, x, y,
                                      width, height, "Person ID")
  <root>/gt/<uid>.json                GT segments (start/end_frame, label)
  <root>/imgs/<uid>/img_%05d.jpg      full frames
  <root>/{train,val}.list             uid lists
"""

from __future__ import annotations

import glob
import json
import os
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np

from egot2x.data.pipeline import Dataset

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_frames(video_u8: np.ndarray) -> np.ndarray:
    """ToTensor + ImageNet Normalize (HHI/utils/lam/utils.py:16-21), NHWC."""
    x = video_u8.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def interpolate_track(frames: List[dict]) -> List[dict]:
    """Reference ``check``: drop degenerate boxes, linearly interpolate
    bbox corners across frame gaps (data_loader.py:46-95)."""
    framenum, bboxes = [], []
    for fr in frames:
        w, h = fr["width"], fr["height"]
        if w <= 0 or h <= 0 or fr["frameNumber"] == 0 or len(fr["Person ID"]) == 0:
            continue
        x = max(fr["x"], 0)
        y = max(fr["y"], 0)
        framenum.append(fr["frameNumber"])
        bboxes.append([x, y, x + w, y + h])
    if not framenum:
        return []
    framenum = np.asarray(framenum)
    bboxes = np.asarray(bboxes, dtype=np.float64)
    full = np.arange(framenum[0], framenum[-1] + 1)
    if len(full) > len(framenum):
        interp = np.stack(
            [np.interp(full, framenum, bboxes[:, j]) for j in range(4)], axis=1
        )
    else:
        full, interp = framenum, bboxes
    template = frames[0]
    out = []
    for f, bb in zip(full, interp):
        rec = dict(template)
        rec["frameNumber"] = int(f)
        rec["x"], rec["y"] = bb[0], bb[1]
        rec["width"], rec["height"] = bb[2] - bb[0], bb[3] - bb[1]
        out.append(rec)
    return out


def make_dataset(
    file_name: str, json_path: str, gt_path: str, stride: int = 1
) -> Tuple[List[tuple], List[int]]:
    """Build the (uid, trackid, frameid, bbox, label) index
    (reference make_dataset, data_loader.py:98-140)."""
    images: List[tuple] = []
    keyframes: List[int] = []
    count = 0
    with open(file_name) as f:
        uids = [line.strip() for line in f if line.strip()]
    for uid in uids:
        with open(os.path.join(gt_path, uid + ".json")) as f:
            gts = json.load(f)
        positive = set()
        for gt in gts:
            for i in range(gt["start_frame"], gt["end_frame"] + 1):
                positive.add(f"{i}:{gt['label']}")
        for tpath in sorted(glob.glob(os.path.join(json_path, uid, "*.json"))):
            with open(tpath) as j:
                frames = json.load(j)
            frames.sort(key=lambda x: x["frameNumber"])
            trackid = os.path.basename(tpath)[:-5]
            for idx, fr in enumerate(interpolate_track(frames)):
                frameid = fr["frameNumber"]
                bbox = (fr["x"], fr["y"], fr["x"] + fr["width"], fr["y"] + fr["height"])
                label = 1 if f"{frameid}:{fr['Person ID']}" in positive else 0
                images.append((uid, trackid, frameid, bbox, label))
                if idx % stride == 0:
                    keyframes.append(count)
                count += 1
    return images, keyframes


def pad_video(video: np.ndarray) -> np.ndarray:
    """Edge-pad all-zero frames around the middle frame
    (reference pad_video, data_loader.py:35-43)."""
    t = len(video)
    pad_idx = np.all(video == 0, axis=(1, 2, 3))
    mid = t // 2
    pad_idx[mid] = False
    kept = video[~pad_idx]
    kept = np.pad(kept, ((int(pad_idx[:mid].sum()), 0), (0, 0), (0, 0), (0, 0)), mode="edge")
    kept = np.pad(kept, ((0, int(pad_idx[mid + 1 :].sum())), (0, 0), (0, 0), (0, 0)), mode="edge")
    return kept.astype(np.uint8)


class LamClipDataset(Dataset):
    """7-frame face-crop clips + labels, NTHWC float32.

    Items:
      frames: (7, S, S, 3) normalized float32
      label:  int64
      meta:   (uid, trackid, frameid, bbox, label) for val postprocessing
    """

    def __init__(
        self,
        root: str,
        split: str = "train",
        stride: int = 1,
        scale: float = 0.0,
        img_size: int = 224,
        window: int = 7,
    ):
        self.root = root
        self.img_dir = os.path.join(root, "imgs")
        self.scale = scale
        self.img_size = img_size
        self.window = window
        list_file = os.path.join(root, f"{split}.list")
        self.imgs, self.kframes = make_dataset(
            list_file, os.path.join(root, "json"), os.path.join(root, "gt"), stride
        )
        # uid → track → frame → bbox
        self.img_group: Dict[str, Dict[str, Dict[int, tuple]]] = defaultdict(
            lambda: defaultdict(dict)
        )
        for uid, trackid, frameid, bbox, _ in self.imgs:
            self.img_group[uid][trackid][frameid] = bbox

    def __len__(self) -> int:
        return len(self.kframes)

    def _load_clip_native(self, index: int):
        """Batched C++ decode+crop+resize for the 7-frame window
        (egot2x.native); returns None when any frame needs the python
        fallback path (missing frame → zero/edge padding)."""
        from egot2x import native

        uid, trackid, frameid, _, _ = self.imgs[self.kframes[index]]
        half = self.window // 2
        paths, bboxes = [], []
        for i in range(frameid - half, frameid + half + 1):
            img_path = os.path.join(self.img_dir, uid, f"img_{i:05d}.jpg")
            if i not in self.img_group[uid][trackid] or not os.path.exists(img_path):
                return None
            x1, y1, x2, y2 = self.img_group[uid][trackid][i]
            s = self.scale
            paths.append(img_path)
            bboxes.append([(1.0 - s) * x1, (1.0 - s) * y1,
                           (1.0 + s) * x2, (1.0 + s) * y2])
        return native.decode_crop_resize(paths, np.asarray(bboxes, np.float32),
                                         self.img_size)

    def _load_clip(self, index: int) -> np.ndarray:
        try:
            from egot2x import native

            if native.AVAILABLE:
                clip = self._load_clip_native(index)
                if clip is not None:
                    return clip
        except Exception:
            pass
        uid, trackid, frameid, _, _ = self.imgs[self.kframes[index]]
        half = self.window // 2
        frames = []
        need_pad = False
        for i in range(frameid - half, frameid + half + 1):
            img_path = os.path.join(self.img_dir, uid, f"img_{i:05d}.jpg")
            if i not in self.img_group[uid][trackid] or not os.path.exists(img_path):
                frames.append(np.zeros((self.img_size, self.img_size, 3), dtype=np.uint8))
                need_pad = True
                continue
            img = cv2.imread(img_path)
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            bbox = self.img_group[uid][trackid][i]
            x1 = int((1.0 - self.scale) * bbox[0])
            y1 = int((1.0 - self.scale) * bbox[1])
            x2 = int((1.0 + self.scale) * bbox[2])
            y2 = int((1.0 + self.scale) * bbox[3])
            face = img[y1:y2, x1:x2, :]
            if face.size == 0:
                face = np.zeros((self.img_size, self.img_size, 3), dtype=np.uint8)
            else:
                face = cv2.resize(face, (self.img_size, self.img_size))
            frames.append(face)
        video = np.stack(frames)
        if need_pad:
            video = pad_video(video)
        return video

    def __getitem__(self, index: int):
        video = self._load_clip(index)
        uid, trackid, frameid, bbox, label = self.imgs[self.kframes[index]]
        return {
            "frames": normalize_frames(video),
            "label": np.int64(label),
            "uid": f"{uid}:{frameid}:{trackid}",
            "bbox": np.asarray(bbox, dtype=np.float32),
        }


def preprocess_lam_strips(root: str, split: str = "train", stride: int = 1,
                          scale: float = 0.0, img_size: int = 224) -> str:
    """Materialize each keyframe's 7-frame face-crop window as a single
    (7·S, S, 3) jpeg strip (reference NewImagerLoader.process_dataset,
    data_loader.py:322-364) under <root>/imgs_processed/<uid>/img_%05d.jpg.
    One jpeg read per item at train time instead of seven."""
    ds = LamClipDataset(root, split=split, stride=stride, scale=scale,
                        img_size=img_size)
    out_root = os.path.join(root, "imgs_processed")
    for index in range(len(ds)):
        uid = ds.imgs[ds.kframes[index]][0]
        out_dir = os.path.join(out_root, uid)
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, f"img_{ds.kframes[index]:05d}.jpg")
        if os.path.exists(out_path):
            continue
        video = ds._load_clip(index)  # (7, S, S, 3) RGB uint8
        t, h, w, c = video.shape
        strip = video.reshape(t * h, w, c)
        cv2.imwrite(out_path, cv2.cvtColor(strip, cv2.COLOR_RGB2BGR))
    return out_root


class LamStripDataset(LamClipDataset):
    """Reads preprocessed strips (reference NewImagerLoader._get_video,
    data_loader.py:367-373); falls back to raw decode when a strip is
    missing."""

    def __init__(self, *args, preprocess: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.strip_root = os.path.join(self.root, "imgs_processed")
        if preprocess:
            preprocess_lam_strips(self.root, kwargs.get("split", "train"),
                                  kwargs.get("stride", 1),
                                  kwargs.get("scale", 0.0), self.img_size)

    def _load_clip(self, index: int) -> np.ndarray:
        uid = self.imgs[self.kframes[index]][0]
        path = os.path.join(self.strip_root, uid,
                            f"img_{self.kframes[index]:05d}.jpg")
        if os.path.exists(path):
            strip = cv2.imread(path)
            strip = cv2.cvtColor(strip, cv2.COLOR_BGR2RGB)
            s = self.img_size
            return strip.reshape(self.window, s, s, 3)
        return super()._load_clip(index)


class LamTestDataset(Dataset):
    """Challenge-test layout (reference TestImagerLoader + make_test_dataset,
    HHI/dataset/lam/data_loader.py:143-311): <root>/<uid>/<trackid>/
    <frameid>_<uniqueid>.jpg face crops already at 224; 7-frame windows
    around each frame with edge padding."""

    def __init__(self, test_path: str, img_size: int = 224, stride: int = 1,
                 window: int = 7):
        self.test_path = test_path
        self.img_size = img_size
        self.window = window
        self.items = []  # (uid, trackid, uniqueid, frameid)
        self.track_files: Dict[tuple, Dict[int, str]] = {}
        for uid in sorted(os.listdir(test_path)):
            udir = os.path.join(test_path, uid)
            if not os.path.isdir(udir):
                continue
            for trackid in sorted(os.listdir(udir)):
                tdir = os.path.join(udir, trackid)
                if not os.path.isdir(tdir):
                    continue
                files = {}
                for idx, fname in enumerate(sorted(os.listdir(tdir))):
                    parts = os.path.splitext(fname)[0].split("_")
                    if len(parts) < 2:
                        continue
                    frameid = int(parts[0])
                    files[frameid] = os.path.join(tdir, fname)
                    if idx % stride == 0:
                        self.items.append((uid, trackid, parts[1], frameid))
                self.track_files[(uid, trackid)] = files

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int):
        uid, trackid, uniqueid, frameid = self.items[index]
        files = self.track_files[(uid, trackid)]
        half = self.window // 2
        s = self.img_size
        frames = []
        need_pad = False
        for i in range(frameid - half, frameid + half + 1):
            if i in files:
                img = cv2.imread(files[i])
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                if img.shape[:2] != (s, s):
                    img = cv2.resize(img, (s, s))
                frames.append(img)
            else:
                frames.append(np.zeros((s, s, 3), dtype=np.uint8))
                need_pad = True
        video = np.stack(frames)
        if need_pad:
            video = pad_video(video)
        return {
            "frames": normalize_frames(video),
            "uid": f"{uid}:{uniqueid}:{trackid}",
            "label": np.int64(0),  # unlabeled test split
        }


class LamSeqDataset(LamClipDataset):
    """Token-sequence targets for EgoT2-g (reference NewImagerSeqLoader,
    data_loader.py:376-389): target = [<lam>, <label>, </s>]."""

    def __init__(self, vocab, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.vocab = vocab

    def __getitem__(self, index: int):
        item = super().__getitem__(index)
        label = int(item["label"])
        item["target_seq"] = np.asarray(
            [self.vocab["lam"], self.vocab[str(label)], self.vocab["</s>"]],
            dtype=np.int64,
        )
        return item
