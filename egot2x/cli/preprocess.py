"""Data-preparation CLI: the reference's one-time preprocessing steps.

Subcommands:
  lam-strips   materialize LAM 7-frame jpeg strips (reference
               NewImagerLoader.process_dataset)
  pnr-frames   extract PNR clip frame caches from full videos (reference
               _extract_clip_frames)
  trim         cut annotated clip windows out of full videos (reference
               HOI/utils/pnr/trim.py)

Usage:
  python -m egot2x.cli.preprocess lam-strips --root ../data/lam --split train
  python -m egot2x.cli.preprocess pnr-frames --root ../data/pnr --videos ../videos
  python -m egot2x.cli.preprocess trim --ann ../data/pnr/train.json \
      --videos ../videos --out ../clips
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="egot2x data preprocessing")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("lam-strips")
    s.add_argument("--root", required=True)
    s.add_argument("--split", default="train")
    s.add_argument("--stride", type=int, default=1)
    s.add_argument("--scale", type=float, default=0.0)
    s.add_argument("--img_size", type=int, default=224)

    s = sub.add_parser("pnr-frames")
    s.add_argument("--root", required=True)
    s.add_argument("--videos", required=True)
    s.add_argument("--split", default="train")
    s.add_argument("--short_side", type=int, default=384)

    s = sub.add_parser("trim")
    s.add_argument("--ann", required=True)
    s.add_argument("--videos", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--short_side", type=int, default=384)

    args = p.parse_args(argv)
    if args.cmd == "lam-strips":
        from egot2x.data.lam import preprocess_lam_strips

        out = preprocess_lam_strips(args.root, args.split, args.stride,
                                    args.scale, args.img_size)
        print(f"strips written under {out}")
    elif args.cmd == "pnr-frames":
        from egot2x.data.pnr import extract_clip_frames

        extract_clip_frames(args.root, args.videos, args.split,
                            args.short_side)
        print("frame caches materialized")
    else:
        from egot2x.data.trim import trim_clips_from_annotations

        n = trim_clips_from_annotations(args.ann, args.videos, args.out,
                                        args.short_side)
        print(f"trimmed {n} clips")


if __name__ == "__main__":
    main()
