"""STA (short-term anticipation) dataset — vestigial in the reference
(carried over from Ego4D forecasting; unused by EgoT2 training), provided
for surface completeness alongside models/sta.py + metrics/sta.py.

Behavioral reference: HOI/dataset/lta/short_term_anticipation.py —
``Ego4dShortTermAnticipation`` (:302-867): annotation lists with
video_metadata + per-uid object detections, a NUM_FRAMES×SAMPLING_RATE
frame window ending at the annotated frame (:668-680), box-aware
spatial transforms from cv2_transform.py (train: short-side jitter
scale + random crop + hflip :376-430; eval: short-side scale + center
crop :417-441), IoU matching of detections to GT next-active objects
with verb labels set to -100 / TTC to NaN for non-matches (:826-846),
and slow/fast pathway packing.

TPU-first divergences (mechanics, not semantics):
  * batches are static-shape: detections pad to ``max_boxes`` with a
    ``box_valid`` mask instead of ragged per-item box counts;
  * transforms are vectorized numpy over the NTHWC clip (the reference
    loops per-frame python lists);
  * frames decode from the repo's clips/<uid>/ jpeg layout or mp4 via
    cv2 (PyAV/lmdb backends are environment-specific loaders, not
    model-visible behavior).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np

from egot2x.data.lta import MEAN, STD, ClipDecoder, to_pathways
from egot2x.data.pipeline import Dataset
from egot2x.metrics.sta import box_iou

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def clip_boxes(boxes: np.ndarray, height: int, width: int) -> np.ndarray:
    """cv2_transform.clip_boxes_to_image:14-27 (xyxy, inclusive max)."""
    out = boxes.copy()
    out[:, [0, 2]] = np.clip(out[:, [0, 2]], 0.0, width - 1.0)
    out[:, [1, 3]] = np.clip(out[:, [1, 3]], 0.0, height - 1.0)
    return out


def short_side_scale(frames: np.ndarray, boxes: np.ndarray,
                     size: int) -> Tuple[np.ndarray, np.ndarray]:
    """cv2_transform.scale/scale_boxes:74-123 on an NTHWC clip."""
    h, w = frames.shape[1:3]
    if (w <= h and w == size) or (h <= w and h == size):
        return frames, boxes
    if w < h:
        nw, nh = size, int(np.floor(h / w * size))
    else:
        nw, nh = int(np.floor(w / h * size)), size
    out = np.stack([cv2.resize(f, (nw, nh), interpolation=cv2.INTER_LINEAR)
                    for f in frames])
    return out.astype(np.float32), boxes * (nh / h if w < h else nw / w)


def sta_transform(frames: np.ndarray, boxes: np.ndarray, split: str,
                  crop_size: int, jitter_scales: Tuple[int, int],
                  rng: np.random.Generator,
                  random_flip: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Box-aware spatial pipeline (short_term_anticipation.py:376-495).

    frames: (T, H, W, 3) float32 RGB in [0, 255]; boxes (N, 4) xyxy in
    *pixel* coords of the input frames. Returns (T, crop, crop, 3)
    normalized frames and the transformed boxes.
    """
    h, w = frames.shape[1:3]
    boxes = clip_boxes(boxes, h, w)
    if split == "train":
        # inverse-uniform short-side jitter (cv2_transform:30-72)
        size = int(round(1.0 / rng.uniform(1.0 / jitter_scales[1],
                                           1.0 / jitter_scales[0])))
        frames, boxes = short_side_scale(frames, boxes, size)
        h, w = frames.shape[1:3]
        y0 = int(rng.integers(0, h - crop_size + 1)) if h > crop_size else 0
        x0 = int(rng.integers(0, w - crop_size + 1)) if w > crop_size else 0
        frames = frames[:, y0:y0 + crop_size, x0:x0 + crop_size]
        boxes = boxes - np.array([x0, y0, x0, y0], np.float32)
        if random_flip and rng.uniform() < 0.5:
            frames = frames[:, :, ::-1]
            x1 = crop_size - 1.0 - boxes[:, 2]
            x2 = crop_size - 1.0 - boxes[:, 0]
            boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], axis=1)
    else:
        frames, boxes = short_side_scale(frames, boxes, crop_size)
        h, w = frames.shape[1:3]
        y0 = int(np.ceil((h - crop_size) / 2))
        x0 = int(np.ceil((w - crop_size) / 2))
        frames = frames[:, y0:y0 + crop_size, x0:x0 + crop_size]
        boxes = boxes - np.array([x0, y0, x0, y0], np.float32)
    frames = (frames / 255.0 - MEAN) / STD
    boxes = clip_boxes(boxes, crop_size, crop_size)
    return np.ascontiguousarray(frames), boxes


class Ego4dStaDataset(Dataset):
    """Static-shape STA samples.

    Item keys: slow/fast pathways (normalized NTHWC), ``boxes`` (M, 4)
    padded detections in crop coords, ``box_valid`` (M,) bool,
    ``verb`` (M,) int64 with -100 ignore for non-next-active,
    ``ttc`` (M,) float32 with 0 where invalid + ``ttc_valid`` mask
    (NaN-free static-shape analogue of the reference's NaN targets),
    plus ``uid`` and ``orig_boxes`` for submission output.
    """

    def __init__(self, root: str, split: str = "train",
                 num_frames: int = 32, sampling_rate: int = 1,
                 alpha: int = 8, crop_size: int = 224,
                 jitter_scales: Tuple[int, int] = (256, 320),
                 max_boxes: int = 16,
                 detection_score_thresh: float = 0.5,
                 nao_iou_thresh: float = 0.5,
                 proposal_append_gt: bool = True,
                 seed: int = 0):
        self.root = root
        self.split = split
        self.num_frames = num_frames
        self.sampling_rate = sampling_rate
        self.alpha = alpha
        self.crop_size = crop_size
        self.jitter_scales = jitter_scales
        self.max_boxes = max_boxes
        self.nao_iou_thresh = nao_iou_thresh
        self.proposal_append_gt = proposal_append_gt
        self.seed = seed
        self.decoder = ClipDecoder(root)
        with open(os.path.join(root, f"fho_sta_{split}.json")) as f:
            ann = json.load(f)
        self.videos = ann["info"]["video_metadata"]
        self.annotations = ann["annotations"]
        det_path = os.path.join(root, "object_detections.json")
        self.detections = {}
        if os.path.exists(det_path):
            with open(det_path) as f:
                dets = json.load(f)
            for uid, items in dets.items():
                kept = [d for d in items
                        if d.get("score", 1.0) >= detection_score_thresh]
                self.detections[uid] = kept

    def __len__(self) -> int:
        return len(self.annotations)

    def _frame_window(self, frame: int) -> np.ndarray:
        """short_term_anticipation.py:668-680: the SAMPLING_RATE-strided
        window of NUM_FRAMES frames ENDING at the annotated frame."""
        idx = frame - np.arange(self.num_frames * self.sampling_rate,
                                step=self.sampling_rate)[::-1]
        return np.maximum(idx, 0).astype(int)

    def _pad(self, arr: np.ndarray, fill=0.0) -> np.ndarray:
        m = self.max_boxes
        out = np.full((m,) + arr.shape[1:], fill, dtype=arr.dtype)
        out[:min(len(arr), m)] = arr[:m]
        return out

    def __getitem__(self, index: int) -> Dict:
        ann = self.annotations[index]
        uid = ann["uid"]
        vid = ann["video_uid"]
        meta = self.videos[vid]
        fw, fh = float(meta["frame_width"]), float(meta["frame_height"])
        fps = float(meta.get("fps", 30.0))
        rng = np.random.default_rng([self.seed, index])

        dets = self.detections.get(uid, [])
        pred_boxes = (np.array([d["box"] for d in dets], np.float32)
                      if dets else np.zeros((0, 4), np.float32))
        pred_labels = np.array([d.get("noun_category_id", 0) for d in dets],
                               np.int64)
        pred_scores = np.array([d.get("score", 1.0) for d in dets],
                               np.float32)
        orig_pred = pred_boxes.copy()

        objs = ann.get("objects")
        gt_boxes = (np.array([o["box"] for o in objs], np.float32)
                    if objs else np.zeros((0, 4), np.float32))
        gt_verbs = np.array([o["verb_category_id"] for o in objs or []],
                            np.int64)
        gt_nouns = np.array([o["noun_category_id"] for o in objs or []],
                            np.int64)
        gt_ttcs = np.array([o["time_to_contact"] for o in objs or []],
                           np.float32)

        if self.split == "train" and self.proposal_append_gt and len(gt_boxes):
            pred_boxes = np.concatenate([pred_boxes, gt_boxes])
            pred_labels = np.concatenate([pred_labels, gt_nouns])
            pred_scores = np.concatenate(
                [pred_scores, np.ones(len(gt_boxes), np.float32)])
            orig_pred = np.concatenate([orig_pred, gt_boxes])

        frame_ids = self._frame_window(int(ann["frame"]))
        frames = self.decoder.decode(
            vid, frame_ids[0] / fps, frame_ids[-1] / fps,
            self.num_frames, fps=fps).astype(np.float32)

        all_boxes = np.concatenate([gt_boxes, pred_boxes]) \
            if len(gt_boxes) or len(pred_boxes) \
            else np.zeros((0, 4), np.float32)
        # boxes arrive in pixel coords of the full-res video; rescale to
        # the decoded frame resolution before the transform (the
        # reference normalizes by frame size then re-multiplies, :783)
        dh, dw = frames.shape[1:3]
        sc = np.array([dw / fw, dh / fh] * 2, np.float32)
        frames, all_boxes = sta_transform(
            frames, all_boxes * sc, self.split, self.crop_size,
            self.jitter_scales, rng)
        gt_t = all_boxes[:len(gt_boxes)]
        pred_t = all_boxes[len(gt_boxes):]

        n = len(pred_t)
        if len(gt_boxes) and n:
            ious = box_iou(pred_t, gt_t)
            matches = ious.argmax(-1)
            best = ious.max(-1)
            active = best >= self.nao_iou_thresh
            verbs = gt_verbs[matches]
            verbs[~active] = -100
            ttcs = gt_ttcs[matches]
            ttc_valid = active.copy()
        else:
            verbs = np.full((n,), -100, np.int64)
            ttcs = np.zeros((n,), np.float32)
            ttc_valid = np.zeros((n,), bool)

        slow, fast = to_pathways(frames, self.alpha)
        valid = np.zeros((self.max_boxes,), bool)
        valid[:min(n, self.max_boxes)] = True
        gt_valid = np.zeros((self.max_boxes,), bool)
        gt_valid[:min(len(gt_t), self.max_boxes)] = True
        return {
            "gt_boxes": self._pad(gt_t),
            "gt_valid": gt_valid,
            "slow": slow.astype(np.float32),
            "fast": fast.astype(np.float32),
            "boxes": self._pad(pred_t),
            "box_valid": valid,
            "verb": self._pad(verbs, fill=-100),
            "ttc": self._pad(np.where(ttc_valid, ttcs, 0.0).astype(np.float32)),
            "ttc_valid": self._pad(ttc_valid, fill=False),
            "noun": self._pad(pred_labels),
            "score": self._pad(pred_scores),
            "orig_boxes": self._pad(orig_pred),
            "uid": uid,
        }
