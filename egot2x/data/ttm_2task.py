"""TTM 2-loader dataset: four input streams for the 3-task translator.

Behavioral reference: HHI/dataset/ttm/data_loader_2task.py:166-440
(``ImagerLoader2Task``) — per segment produces:
  video      (T, 224, 224, 3) RGB face crops (TTM style),
  video_asd  (T, 112, 112) grayscale square crops with median-filtered
             size + EMA-smoothed centers (ASD style),
  audio      raw wave slice, RMS-normalized (TTM style),
  audio_asd  (4T, 13) MFCC with fps-scaled windows (ASD style),
collated with min-truncation where audio_asd keeps 4·min_frames rows
(HHI/utils/ttm/utils.py:232-241) — here bucketed truncation provides the
same at static shapes.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from egot2x.audio.mfcc import mfcc_np
from egot2x.data.asd import crop_face_square, smooth_dets
from egot2x.data.ttm import FPS, TtmSegmentDataset


class TtmTwoTaskDataset(TtmSegmentDataset):
    def _asd_frames(self, uid, personid, start, n_frames) -> np.ndarray:
        try:
            import cv2
        except ImportError:  # pragma: no cover
            raise RuntimeError("cv2 required")
        crops = self.face_crop[uid]
        track = []
        for i in range(start, start + n_frames):
            key = f"{i}:{personid}"
            if key in crops:
                x1, y1, x2, y2 = crops[key]
                track.append({"frame": i, "x": x1, "y": y1,
                              "width": x2 - x1, "height": y2 - y1})
        # uint8: crop_face_square output is native cv2 gray — ship raw
        # bytes (4x less host->device) and let TalkNet normalize in-jit
        out = np.zeros((n_frames, 112, 112), dtype=np.uint8)
        if not track:
            return out
        dets = smooth_dets(track)
        j = 0
        for i, fr in enumerate(track):
            if j >= n_frames:
                break
            img_path = os.path.join(self.img_path, uid, f"img_{int(fr['frame']):05d}.jpg")
            if not os.path.exists(img_path):
                continue
            img = cv2.imread(img_path)
            out[j] = crop_face_square(img, dets["x"][i], dets["y"][i], dets["s"][i])
            j += 1
        return out

    def get_item(self, idx: int, n_frames: int) -> Dict:
        item = super().get_item(idx, n_frames)
        uid, personid, label, start, end, ann_idx = self.segments[idx]
        item["video_asd"] = self._asd_frames(uid, personid, start, n_frames)
        item["audio_asd"] = mfcc_np(
            item["audio"].astype(np.float64), 16000,
            winlen=0.025 * 25 / FPS, winstep=0.010 * 25 / FPS,
            num_frames=4 * n_frames,
        ).astype(np.float32)
        return item


class TtmTwoTaskSeqDataset(TtmTwoTaskDataset):
    """EgoT2-g target tokens for the 2-loader pipeline
    (reference ImagerSeqLoader2Task)."""

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
