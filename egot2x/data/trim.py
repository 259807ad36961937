"""Video trimming / clip extraction utility.

Behavioral reference: HOI/utils/pnr/trim.py — cuts annotated clip windows
out of full-scale videos into per-clip files (a one-time data-prep step
before training). cv2-based here (PyAV absent in this image).
"""

from __future__ import annotations

import json
import os
from typing import Optional


def trim_video(src_path: str, dst_path: str, start_sec: float, end_sec: float,
               short_side: Optional[int] = None) -> int:
    """Write [start_sec, end_sec) of ``src_path`` to ``dst_path`` (mp4);
    returns the number of frames written."""
    import cv2

    cap = cv2.VideoCapture(src_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    if short_side:
        scale = short_side / min(w, h)
        w, h = int(w * scale), int(h * scale)
    os.makedirs(os.path.dirname(dst_path) or ".", exist_ok=True)
    writer = cv2.VideoWriter(dst_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
    start_frame = int(start_sec * fps)
    end_frame = int(end_sec * fps)
    cap.set(cv2.CAP_PROP_POS_FRAMES, start_frame)
    n = 0
    for _ in range(start_frame, end_frame):
        ret, frame = cap.read()
        if not ret:
            break
        if short_side:
            frame = cv2.resize(frame, (w, h))
        writer.write(frame)
        n += 1
    writer.release()
    cap.release()
    return n


def trim_clips_from_annotations(ann_path: str, videos_dir: str, out_dir: str,
                                short_side: Optional[int] = 384) -> int:
    """Trim every clip listed in a {train,val}.json annotation file
    (reference trim.py main loop). Returns the number of clips written."""
    with open(ann_path) as f:
        anns = json.load(f)
    count = 0
    for info in anns.get("clips", anns):
        src = os.path.join(videos_dir, info["video_uid"] + ".mp4")
        if not os.path.exists(src):
            continue
        dst = os.path.join(out_dir, str(info["unique_id"]) + ".mp4")
        if os.path.exists(dst):
            continue
        trim_video(src, dst, float(info["clip_start_sec"]),
                   float(info["clip_end_sec"]), short_side)
        count += 1
    return count
