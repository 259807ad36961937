"""EgoT2-g label-token vocabularies.

Behavioral reference:
  * HHI vocab (HHI/utils/utils.py:12-18): tokens ['ttm','lam','asd',
    '0','1'] with specials ["</s>", "<unk>"] — torchtext places
    specials FIRST, so itos = ['</s>', '<unk>', 'ttm', 'lam', 'asd',
    '0', '1'] and the label tokens '0'/'1' are the LAST two ids (the
    prompt model's predict slices logits[..., -2:],
    HHI/models/multitask/task_prompt_model.py:178).
  * HOI vocab (HOI/utils/multitask/build_vocab.py:53-72): inline order
    [6 task prompts, 'True', 'False', '</s>', '<unk>', '0'..'15',
    115 verb names, 478 noun names] from fho_lta_taxonomy.json, with
    the reference's manual dedup of ambiguous nouns
    (map_label_to_action :36-43); duplicate surface forms keep the
    first id (torchtext vocab behavior).
"""

from __future__ import annotations

import json
from typing import Dict, List, Tuple

NOUN_DEDUP = {
    19: "bat_sports",
    20: "bat_tool",
    84: "chip_food",
    85: "chip_wood'",
    86: "chip_wood",
    270: "nut_food",
    271: "nut_tool",
    320: "pot_planter",
}


class Vocab:
    """Minimal torchtext-vocab replacement: stoi/itos with <unk> default."""

    def __init__(self, tokens: List[str], default_token: str = "<unk>"):
        self.itos: List[str] = []
        self.stoi: Dict[str, int] = {}
        for t in tokens:
            if t not in self.stoi:
                self.stoi[t] = len(self.itos)
                self.itos.append(t)
        self.default_index = self.stoi.get(default_token, 0)

    def __getitem__(self, token: str) -> int:
        return self.stoi.get(token, self.default_index)

    def __len__(self) -> int:
        return len(self.itos)

    def __contains__(self, token: str) -> bool:
        return token in self.stoi

    def lookup_token(self, idx: int) -> str:
        return self.itos[idx]


def build_hhi_vocab() -> Vocab:
    """['</s>', '<unk>', 'ttm', 'lam', 'asd', '0', '1'] (specials first)."""
    return Vocab(["</s>", "<unk>", "ttm", "lam", "asd", "0", "1"])


def map_label_to_action(taxonomy_path: str) -> Tuple[Dict[int, str], Dict[int, str]]:
    """verb/noun label id → single-word token (build_vocab.py:15-50)."""
    with open(taxonomy_path) as f:
        data = json.load(f)
    verb_dict = {
        i: v.split("(")[0].replace("_", "") for i, v in enumerate(data["verbs"])
    }
    noun_dict = {
        i: n.split("(")[0].replace("_", "") for i, n in enumerate(data["nouns"])
    }
    for idx, tok in NOUN_DEDUP.items():
        if idx in noun_dict:
            noun_dict[idx] = tok
    return verb_dict, noun_dict


def build_hoi_vocab(taxonomy_path: str) -> Vocab:
    tokens = ["pnr", "oscc", "action_verb", "action_noun", "lta_verb",
              "lta_noun", "True", "False", "</s>", "<unk>"]
    tokens += [str(i) for i in range(16)]
    verb_dict, noun_dict = map_label_to_action(taxonomy_path)
    tokens += [verb_dict[i] for i in range(len(verb_dict))]
    tokens += [noun_dict[i] for i in range(len(noun_dict))]
    return Vocab(tokens)


def build_hoi_vocab_task12() -> Vocab:
    tokens = ["pnr", "oscc", "True", "False", "</s>", "<unk>"]
    tokens += [str(i) for i in range(16)]
    return Vocab(tokens)


def vocab_idx_to_orig(vocab: Vocab, taxonomy_path: str):
    """vocab ids of every verb/noun label, in label order
    (build_vocab.py:115-129). Duplicate tokens map to the first id."""
    import numpy as np

    verb_dict, noun_dict = map_label_to_action(taxonomy_path)
    v_list = [vocab[verb_dict[i]] for i in range(len(verb_dict))]
    n_list = [vocab[noun_dict[i]] for i in range(len(noun_dict))]
    return np.asarray(v_list), np.asarray(n_list)
