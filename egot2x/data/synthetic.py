"""Synthetic fixture generators matching the reference on-disk layouts.

The reference ships no tests and no fixture data (SURVEY.md §4); these
writers produce tiny but layout-faithful dataset trees
(docs/PREPARE_HHI.md:9-35, docs/PREPARE_HOI.md:10-31 in the reference)
so every pipeline can be exercised hermetically — unit tests, CLI
``--synthetic`` smoke runs, and benchmarks all use them.
"""

from __future__ import annotations

import json
import os
from typing import List

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def make_lam_fixture(
    root: str,
    n_videos: int = 2,
    n_tracks: int = 2,
    n_frames: int = 12,
    img_size: int = 64,
    seed: int = 0,
) -> str:
    """Write a miniature LAM tree: imgs/, json/, gt/, train.list, val.list."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    uids: List[str] = []
    for v in range(n_videos):
        uid = f"vid{v:03d}"
        uids.append(uid)
        img_dir = os.path.join(root, "imgs", uid)
        json_dir = os.path.join(root, "json", uid)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(json_dir, exist_ok=True)
        h = w = img_size * 2
        for i in range(1, n_frames + 1):
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(img_dir, f"img_{i:05d}.jpg"), img)
        for t in range(n_tracks):
            pid = f"p{t}"
            track = []
            for i in range(1, n_frames + 1):
                if i % 5 == 0 and t == 0:
                    continue  # leave a gap to exercise bbox interpolation
                track.append(
                    {
                        "frameNumber": i,
                        "x": float(5 + t * 10 + rng.integers(0, 3)),
                        "y": float(5 + rng.integers(0, 3)),
                        "width": float(img_size // 2),
                        "height": float(img_size // 2),
                        "Person ID": pid,
                    }
                )
            with open(os.path.join(json_dir, f"track{t}.json"), "w") as f:
                json.dump(track, f)
        os.makedirs(os.path.join(root, "gt"), exist_ok=True)
        # one positive GT segment per video (track 0's person)
        gts = [{"start_frame": 2, "end_frame": n_frames // 2, "label": "p0"}]
        with open(os.path.join(root, "gt", uid + ".json"), "w") as f:
            json.dump(gts, f)
    split = max(1, n_videos // 2)
    with open(os.path.join(root, "train.list"), "w") as f:
        f.write("\n".join(uids[:split]) + "\n")
    with open(os.path.join(root, "val.list"), "w") as f:
        f.write("\n".join(uids[split:] or uids[:1]) + "\n")
    return root


def make_ttm_fixture(
    root: str,
    n_videos: int = 2,
    n_segments: int = 6,
    img_size: int = 64,
    sample_rate: int = 16000,
    seed: int = 0,
    seg_lens=None,
    label_signal: float = 0.0,
) -> str:
    """Miniature TTM tree: imgs/, json/, gt/, wave/, train.list, val.list.

    GT segments use the reference convention: positive segments carry a
    'tags' key (HHI/dataset/ttm/data_loader.py:133-147). Default lengths
    are drawn to span several buckets incl. one >150-frame split case;
    pass ``seg_lens`` (e.g. ``[25] * 8``) to put every segment in ONE
    bucket so a single loader batch holds them all.

    With the default pure-noise frames the labels are UNLEARNABLE: global
    average pooling over iid pixels concentrates every sample's features
    at the same point, so any model converges to the ln(2) prior — fine
    for shape/step tests, useless when a test needs real class
    separation. ``label_signal=s`` adds a per-segment brightness offset
    (+s for positive segments, −s for negative, noise amplitude reduced)
    that survives pooling, making train AND val genuinely separable (the
    int8 accuracy gate trains on this and gates val mAP float-vs-int8).
    """
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    uids = []
    for v in range(n_videos):
        uid = f"tvid{v:03d}"
        uids.append(uid)
        img_dir = os.path.join(root, "imgs", uid)
        json_dir = os.path.join(root, "json", uid)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(json_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "gt"), exist_ok=True)
        os.makedirs(os.path.join(root, "wave"), exist_ok=True)
        # segment lengths spanning buckets; one long segment to exercise
        # the >150-frame chunking path
        lens = (list(seg_lens) if seg_lens is not None
                else [18, 40, 70, 100, 160, 25][:n_segments])
        total_frames = sum(lens) + 10
        # frame -> signed brightness offset of its segment (positive
        # segments are the even-indexed ones, mirroring the gt below)
        offset = np.zeros(total_frames + 2, np.float32)
        if label_signal:
            pos = 1
            for s, ln in enumerate(lens):
                sign = 1.0 if s % 2 == 0 else -1.0
                offset[pos:pos + ln] = sign * label_signal
                pos += ln
        h = w = img_size * 2
        for i in range(1, total_frames + 1):
            img = rng.integers(0, 255, (h, w, 3))
            if label_signal:
                img = img * 0.3 + 128.0 + offset[i]
            img = np.clip(img, 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(img_dir, f"img_{i:05d}.jpg"), img)
        track = [
            {
                "frameNumber": i,
                "x": 4.0, "y": 4.0,
                "width": float(img_size), "height": float(img_size),
                "Person ID": "1",
            }
            for i in range(1, total_frames + 1)
        ]
        with open(os.path.join(json_dir, "track0.json"), "w") as f:
            json.dump(track, f)
        gts = []
        start = 1
        for s, ln in enumerate(lens):
            seg = {"label": "1", "start_frame": start, "end_frame": start + ln - 1}
            if s % 2 == 0:
                seg["tags"] = ["person_x"]
            gts.append(seg)
            start += ln
        with open(os.path.join(root, "gt", uid + ".json"), "w") as f:
            json.dump(gts, f)
        wave = make_wave(int(total_frames / 30.0 * sample_rate) + sample_rate, seed=seed + v)
        wavfile.write(os.path.join(root, "wave", uid + ".wav"), sample_rate,
                      (wave * 32767).astype(np.int16))
    split = max(1, n_videos // 2)
    with open(os.path.join(root, "train.list"), "w") as f:
        f.write("\n".join(uids[:split]) + "\n")
    with open(os.path.join(root, "val.list"), "w") as f:
        f.write("\n".join(uids[split:] or uids[:1]) + "\n")
    return root


def make_asd_fixture(
    root: str,
    n_videos: int = 2,
    n_tracks: int = 3,
    img_size: int = 64,
    sample_rate: int = 16000,
    seed: int = 0,
) -> str:
    """Miniature ASD tree: csv/, bbox/, wave/, imgs/ (TalkNet layout).

    trackids are uid-prefixed 36+ char strings as in the reference
    (trackid[:36] == video uid, HHI/dataset/asd/dataLoader.py:29)."""
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "csv"), exist_ok=True)
    os.makedirs(os.path.join(root, "bbox"), exist_ok=True)
    os.makedirs(os.path.join(root, "wave"), exist_ok=True)
    rows_train, rows_val = [], []
    for v in range(n_videos):
        uid = f"avid{v:03d}".ljust(36, "x")  # 36-char video uid
        img_dir = os.path.join(root, "imgs", uid)
        os.makedirs(img_dir, exist_ok=True)
        track_lens = [20, 35, 70][:n_tracks]
        total_frames = sum(track_lens) + 10
        h = w = img_size * 2
        for i in range(1, total_frames + 1):
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(img_dir, f"img_{i:05d}.jpg"), img)
        fps = 30.0
        wave = make_wave(int(total_frames / fps * sample_rate) + sample_rate,
                         seed=seed + v)
        wavfile.write(os.path.join(root, "wave", uid + ".wav"), sample_rate,
                      (wave * 32767).astype(np.int16))
        start = 1
        for t, ln in enumerate(track_lens):
            trackid = f"{uid}:track{t}"
            bbox = [
                {
                    "frame": i,
                    "x": 8.0 + rng.integers(0, 3),
                    "y": 8.0 + rng.integers(0, 3),
                    "width": float(img_size),
                    "height": float(img_size),
                }
                for i in range(start, start + ln)
            ]
            with open(os.path.join(root, "bbox", trackid + ".json"), "w") as f:
                json.dump(bbox, f)
            labels = rng.integers(0, 2, ln).tolist()
            row = "\t".join([
                trackid, str(ln), str(fps), str(labels), "extra", str(start)
            ])
            (rows_train if v < max(1, n_videos // 2) else rows_val).append(row)
            start += ln
    with open(os.path.join(root, "csv", "active_speaker_train.csv"), "w") as f:
        f.write("\n".join(rows_train) + "\n")
    with open(os.path.join(root, "csv", "active_speaker_val.csv"), "w") as f:
        f.write("\n".join(rows_val or rows_train) + "\n")
    return root


def make_pnr_fixture(
    root: str,
    n_clips: int = 6,
    img_size: int = 64,
    seed: int = 0,
) -> str:
    """Miniature PNR tree: {train,val}.json + positive/negative jpeg
    caches (reference layout, HOI/dataset/pnr docs/PREPARE_HOI.md)."""
    rng = np.random.default_rng(seed)
    clips_train, clips_val = [], []
    os.makedirs(root, exist_ok=True)
    for c in range(n_clips):
        uid = f"pclip{c:03d}"
        state_change = c % 2 == 0
        start_frame = 100
        clip_len_s = 9.0
        end_frame = start_frame + int(clip_len_s * 30)
        pnr = start_frame + int(clip_len_s * 30 * rng.uniform(0.3, 0.7)) if state_change else None
        info = {
            "unique_id": uid,
            "video_uid": f"pvid{c:03d}",
            "clip_start_sec": start_frame / 30.0,
            "clip_end_sec": end_frame / 30.0,
            "clip_start_frame": start_frame,
            "clip_end_frame": end_frame,
            "pnr_frame": pnr,
            "state_change": state_change,
        }
        (clips_train if c < max(2, n_clips - 2) else clips_val).append(info)
        out_dir = os.path.join(root, "positive" if state_change else "negative", uid)
        os.makedirs(out_dir, exist_ok=True)
        for fn in range(start_frame, end_frame + 1):
            img = rng.integers(0, 255, (img_size, img_size, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(out_dir, f"{fn}.jpeg"), img)
    with open(os.path.join(root, "train.json"), "w") as f:
        json.dump({"clips": clips_train}, f)
    with open(os.path.join(root, "val.json"), "w") as f:
        json.dump({"clips": clips_val or clips_train}, f)
    return root


def make_lta_fixture(
    root: str,
    n_clip_uids: int = 2,
    actions_per_clip: int = 26,
    img_size: int = 64,
    seed: int = 0,
) -> str:
    """Miniature AR/LTA tree: fho_lta_{train,val}.json + clips/<uid>/
    frame jpegs. Enough consecutive actions per clip_uid for LTA
    forecasting samples (num_input_clips=2, num_actions=20)."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "clips"), exist_ok=True)
    clips_train, clips_val = [], []
    n_verbs, n_nouns = 10, 12
    for v in range(n_clip_uids):
        uid = f"lclip{v:03d}"
        frame_dir = os.path.join(root, "clips", uid)
        os.makedirs(frame_dir, exist_ok=True)
        total_sec = actions_per_clip * 2.0 + 4
        n_frames = int(total_sec * 30)
        # write a sparse frame set (every 5th frame) to keep the fixture small
        for i in range(0, n_frames, 5):
            img = rng.integers(0, 255, (img_size, img_size, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(frame_dir, f"frame_{i:06d}.jpg"), img)
        for a in range(actions_per_clip):
            info = {
                "clip_uid": uid,
                "video_uid": f"lvid{v:03d}",
                "action_idx": a,
                "verb_label": int(rng.integers(0, n_verbs)),
                "noun_label": int(rng.integers(0, n_nouns)),
                "action_clip_start_sec": a * 2.0,
                "action_clip_end_sec": a * 2.0 + 2.0,
            }
            (clips_train if v < max(1, n_clip_uids // 2) else clips_val).append(info)
    with open(os.path.join(root, "fho_lta_train.json"), "w") as f:
        json.dump({"clips": clips_train}, f)
    with open(os.path.join(root, "fho_lta_val.json"), "w") as f:
        json.dump({"clips": clips_val or clips_train}, f)
    # taxonomy for the EgoT2-g vocab
    tax = {
        "verbs": [f"verb{i}" for i in range(n_verbs)],
        "nouns": [f"noun{i}" for i in range(n_nouns)],
    }
    with open(os.path.join(root, "fho_lta_taxonomy.json"), "w") as f:
        json.dump(tax, f)
    return root


def make_sta_fixture(
    root: str,
    n_videos: int = 2,
    anns_per_video: int = 4,
    img_size: int = 96,
    seed: int = 0,
) -> str:
    """Miniature STA tree: fho_sta_{train,val}.json (annotation list +
    video_metadata, reference short_term_anticipation.py:341-357) +
    object_detections.json + clips/<video_uid>/ frame jpegs."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "clips"), exist_ok=True)
    videos, anns_train, anns_val, dets = {}, [], [], {}
    for v in range(n_videos):
        vid = f"svid{v:03d}"
        videos[vid] = {"frame_width": img_size, "frame_height": img_size,
                       "fps": 30.0}
        frame_dir = os.path.join(root, "clips", vid)
        os.makedirs(frame_dir, exist_ok=True)
        for i in range(0, 40, 2):
            img = rng.integers(0, 255, (img_size, img_size, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(frame_dir, f"frame_{i:06d}.jpg"), img)
        for a in range(anns_per_video):
            uid = f"{vid}_{a:03d}"
            cx, cy = rng.uniform(20, img_size - 30, 2)
            box = [float(cx), float(cy), float(cx + 16), float(cy + 16)]
            ann = {
                "uid": uid,
                "video_uid": vid,
                "frame": int(rng.integers(10, 38)),
                "objects": [{
                    "box": box,
                    "noun_category_id": int(rng.integers(0, 12)),
                    "verb_category_id": int(rng.integers(0, 10)),
                    "time_to_contact": float(rng.uniform(0.2, 1.5)),
                }],
            }
            (anns_train if v < max(1, n_videos // 2) else anns_val).append(ann)
            jit = rng.uniform(-4, 4, 4)
            dets[uid] = [
                {"box": [float(b + j) for b, j in zip(box, jit)],
                 "score": 0.9, "noun_category_id": 3},
                {"box": [1.0, 1.0, 12.0, 12.0], "score": 0.8,
                 "noun_category_id": 5},
            ]
    with open(os.path.join(root, "fho_sta_train.json"), "w") as f:
        json.dump({"info": {"video_metadata": videos},
                   "annotations": anns_train}, f)
    with open(os.path.join(root, "fho_sta_val.json"), "w") as f:
        json.dump({"info": {"video_metadata": videos},
                   "annotations": anns_val or anns_train}, f)
    with open(os.path.join(root, "object_detections.json"), "w") as f:
        json.dump(dets, f)
    return root


def make_wave(n_samples: int, seed: int = 0) -> np.ndarray:
    """Synthetic audio: a few random sinusoids + noise, float32 in [-1, 1]."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples) / 16000.0
    wave = sum(
        rng.uniform(0.05, 0.3) * np.sin(2 * np.pi * rng.uniform(80, 4000) * t)
        for _ in range(4)
    )
    wave = wave + 0.01 * rng.standard_normal(n_samples)
    return wave.astype(np.float32)
