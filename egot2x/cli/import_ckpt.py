"""Convert reference PyTorch checkpoints into egot2x checkpoint dirs.

The output directory is a Trainer-style checkpoint (epoch_0 + last.json)
holding the translated {params, batch_stats}, so it drops straight into
the Stage-II CLIs' ``--lam_checkpoint`` / ``--ttm_checkpoint`` /
``--asd_checkpoint`` / ``--pnr_checkpoint`` flags.

Usage:
  python -m egot2x.cli.import_ckpt --src pretrained_models/ts_lam.pth \
      --family lam_baseline --out converted/lam
  python -m egot2x.cli.import_ckpt --src slowfast_c2.pkl --caffe2 \
      --family pnr_keyframe --out converted/pnr
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="torch→egot2x checkpoint import")
    p.add_argument("--src", required=True, help=".pth/.ckpt (or caffe2 .pkl)")
    p.add_argument("--family", required=True,
                   help="rule family (see egot2x.core.torch_import.FAMILIES)")
    p.add_argument("--out", required=True, help="output checkpoint dir")
    p.add_argument("--caffe2", action="store_true",
                   help="treat src as a caffe2 pickle")
    p.add_argument("--allow_unused", action="store_true",
                   help="do not fail on unconsumed source tensors")
    args = p.parse_args(argv)

    from egot2x.core import torch_import as ti
    from egot2x.core.checkpoint import save_tree

    if args.family not in ti.FAMILIES:
        raise SystemExit(
            f"unknown family {args.family!r}; known: {sorted(ti.FAMILIES)}")
    rules = ti.FAMILIES[args.family]()
    if args.caffe2:
        state = ti.load_caffe2_pickle(args.src)
    else:
        state = ti.strip_prefix(ti.load_torch_state_dict(args.src))
    translated = ti.apply_rules(state, rules)
    unused = [k for k in translated["unused"] if "num_batches_tracked" not in k]
    if unused and not args.allow_unused:
        raise SystemExit(
            f"{len(unused)} source tensors not consumed (pass --allow_unused "
            f"to ignore): {unused[:10]}{'...' if len(unused) > 10 else ''}")

    os.makedirs(args.out, exist_ok=True)
    save_tree(os.path.join(args.out, "epoch_0"),
              {"params": translated["params"],
               "batch_stats": translated["batch_stats"]})
    with open(os.path.join(args.out, "last.json"), "w") as f:
        json.dump({"epoch": 0, "metrics": {"imported_from": args.src}}, f)
    n_leaves = sum(1 for _ in _leaves(translated["params"]))
    print(f"imported {n_leaves} param leaves from {args.src} -> {args.out}"
          + (f" ({len(unused)} unused source tensors)" if unused else ""))
    return args.out


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
