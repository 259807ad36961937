"""HOI 2-loader datasets: pair each primary task item with the aux
stream of the same video segment.

Behavioral reference:
  * ``PNRDatasetwithAuxTask`` (HOI/dataset/pnr/StateChangeDetectionAnd
    KeyframeLocalisation.py:403-547): each PNR clip paired with a
    SlowFast recognition clip of the same segment (UntrimmedClipSampler
    over the same video window), batch = {'orig', 'recognition'}.
  * ``Ego4dRecognitionwithAuxTask`` / ``Ego4dLongTermAnticipationwith
    AuxTask`` (HOI/dataset/lta/long_term_anticipation_auxtask.py /
    _lta_auxtask.py): AR (resp. LTA) clips paired with PNR-style
    16-frame streams of the same window.

Here both directions derive the aux stream from the same decoded frame
source, which preserves the same-segment pairing semantics with one
decode path.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from egot2x.data.lta import (
    ClipDecoder,
    Ego4dLtaDataset,
    Ego4dRecognitionDataset,
    spatial_transform,
    to_pathways,
)
from egot2x.data.pnr import PnrClipDataset

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class PnrWithAuxDataset(PnrClipDataset):
    """PNR item + recognition pathways from the same clip window."""

    def __init__(self, *args, aux_num_frames: int = 32, aux_alpha: int = 8,
                 aux_crop: int = 224, **kwargs):
        super().__init__(*args, **kwargs)
        self.aux_num_frames = aux_num_frames
        self.aux_alpha = aux_alpha
        self.aux_crop = aux_crop

    def __getitem__(self, index: int) -> Dict:
        item = super().__getitem__(index)
        # aux recognition clip: resample the same window's frames
        frames = item["frames"].astype(np.uint8)  # (16, S, S, 3) 0..255
        idx = np.linspace(0, len(frames) - 1, self.aux_num_frames).astype(int)
        clip = frames[idx]
        clip = np.stack([cv2.resize(f, (self.aux_crop, self.aux_crop))
                         for f in clip])
        # raw uint8 pathways (model stems fold the normalize in-jit)
        slow, fast = to_pathways(clip, self.aux_alpha)
        item["slow"] = slow
        item["fast"] = fast
        return item


class RecognitionWithAuxDataset(Ego4dRecognitionDataset):
    """AR item + PNR-style 16-frame stream of the same window."""

    def __init__(self, *args, pnr_frames: int = 16, pnr_crop: int = 225,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.pnr_frames = pnr_frames
        self.pnr_crop = pnr_crop

    def _pnr_stream(self, info) -> np.ndarray:
        s = float(info["action_clip_start_sec"])
        e = float(info["action_clip_end_sec"])
        frames = self.decoder.decode(info["clip_uid"], s, e, self.pnr_frames)
        # raw uint8 (PNR raw-[0,255] convention; models cast in-jit)
        return np.stack([cv2.resize(f, (self.pnr_crop, self.pnr_crop))
                         for f in frames])

    def __getitem__(self, index: int) -> Dict:
        item = super().__getitem__(index)
        item["frames_pnr"] = self._pnr_stream(self.clips[index])
        return item


class PnrSeqDataset(PnrWithAuxDataset):
    """EgoT2-g targets for pnr + oscc decodes (reference
    PNRDatasetwithAuxTaskSequenceLabel, :550-586): pnr target =
    [<pnr>, <kf idx>, </s>], oscc target = [<oscc>, True/False, </s>]."""

    def __init__(self, vocab, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.vocab = vocab

    def __getitem__(self, index: int) -> Dict:
        item = super().__getitem__(index)
        kf_idx = int(np.argmax(item["labels"]))
        v = self.vocab
        item["target_pnr"] = np.asarray(
            [v["pnr"], v[str(kf_idx)], v["</s>"]], dtype=np.int64)
        state_tok = "True" if int(item["state"]) == 1 else "False"
        item["target_oscc"] = np.asarray(
            [v["oscc"], v[state_tok], v["</s>"]], dtype=np.int64)
        return item


class RecognitionSeqDataset(RecognitionWithAuxDataset):
    """Verb/noun token targets (Ego4dRecognitionSeparateSequenceLabel)."""

    def __init__(self, vocab, verb_dict, noun_dict, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.vocab = vocab
        self.verb_dict = verb_dict
        self.noun_dict = noun_dict

    def __getitem__(self, index: int) -> Dict:
        item = super().__getitem__(index)
        v = self.vocab
        verb_tok = self.verb_dict[int(item["verb"])]
        noun_tok = self.noun_dict[int(item["noun"])]
        item["target_verb"] = np.asarray(
            [v["action_verb"], v[verb_tok], v["</s>"]], dtype=np.int64)
        item["target_noun"] = np.asarray(
            [v["action_noun"], v[noun_tok], v["</s>"]], dtype=np.int64)
        # combined decode for unify3task: [<action>, verb, noun, </s>]
        # (Ego4dRecognitionwithAuxTaskSequenceLabel :322-336; 'action'
        # is absent from the vocab so it resolves to <unk>, matching
        # the reference's torchtext default_index behavior)
        item["target_action"] = np.asarray(
            [v["action"], v[verb_tok], v[noun_tok], v["</s>"]],
            dtype=np.int64)
        return item


class LtaWithAuxDataset(Ego4dLtaDataset):
    """LTA item + per-input-clip PNR-style streams (N, 16, S, S, 3)."""

    def __init__(self, *args, pnr_frames: int = 16, pnr_crop: int = 225,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.pnr_frames = pnr_frames
        self.pnr_crop = pnr_crop

    def __getitem__(self, index: int) -> Dict:
        item = super().__getitem__(index)
        inputs, _ = self.samples[index]
        streams = []
        for info in inputs:
            s = float(info["action_clip_start_sec"])
            e = float(info["action_clip_end_sec"])
            frames = self.decoder.decode(info["clip_uid"], s, e, self.pnr_frames)
            frames = np.stack([cv2.resize(f, (self.pnr_crop, self.pnr_crop))
                               for f in frames])
            streams.append(frames)  # raw uint8 (models cast in-jit)
        item["frames_pnr"] = np.stack(streams)
        return item


class LtaSeqDataset(LtaWithAuxDataset):
    """Next-action verb/noun token targets for the lta decodes
    (Ego4dLongTermAnticipationwithAuxTaskSeparateSequenceLabel)."""

    def __init__(self, vocab, verb_dict, noun_dict, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.vocab = vocab
        self.verb_dict = verb_dict
        self.noun_dict = noun_dict

    def __getitem__(self, index: int) -> Dict:
        item = super().__getitem__(index)
        v = self.vocab
        verb_tok = self.verb_dict[int(item["verb"][0])]
        noun_tok = self.noun_dict[int(item["noun"][0])]
        item["target_verb"] = np.asarray(
            [v["lta_verb"], v[verb_tok], v["</s>"]], dtype=np.int64)
        item["target_noun"] = np.asarray(
            [v["lta_noun"], v[noun_tok], v["</s>"]], dtype=np.int64)
        return item
