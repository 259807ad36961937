"""Challenge-submission evaluators and JSON writers.

Behavioral reference: HOI/submission/eval_{pnr,oscc,lta,ar}.py and the
TTM ``pred2json`` path (HHI/utils/ttm/utils.py:23-43) — standalone eval
loops that load a trained checkpoint, iterate the val/test loader, and
write EvalAI submission files:

  submit_pnr.json   [{"unique_id", "pnr_frame"}]
  submit_oscc.json  [{"unique_id", "state_change"}]
  submit_lta.json   {uid: {"verb": (k, Z), "noun": (k, Z)}}
  submit_ttm.json   {"version": "1.0", "challenge": "ego4d_talking_to_me",
                     "results": [{"video_id", "frame_id", "label", "score"}]}

Usage:
  python -m egot2x.cli.submit --target pnr --ckpt logs/pnr/debug/checkpoints \
      --data_root ... [--synthetic]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="egot2x challenge submission")
    p.add_argument("--target", type=str, required=True,
                   choices=["pnr", "oscc", "lta", "ttm", "ar"])
    p.add_argument("--cfg", type=str, default=None,
                   help="eval YAML with reference-schema knobs (the "
                        "configs/eval/*.yaml surface, e.g. "
                        "MISC.CHECKPOINT_FILE_PATH, TEST.BATCH_SIZE)")
    p.add_argument("--ckpt", type=str, default=None,
                   help="Trainer checkpoint dir (restores 'last')")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--split", type=str, default="val")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    return p


def _make_task(args):
    from egot2x.core.config import Config

    tmp = tempfile.gettempdir()
    if args.target in ("pnr", "oscc"):
        from egot2x.tasks.pnr import (
            KeyframeLocalisation,
            StateChangeClassification,
        )

        root = args.data_root or os.path.join(tmp, "egot2x_pnr_fixture")
        if args.synthetic and not os.path.exists(os.path.join(root, "train.json")):
            from egot2x.data.synthetic import make_pnr_fixture

            make_pnr_fixture(root, img_size=64)
        cfg = Config(data_root=root, lr=1e-4, wd=1e-4,
                     batch_size=args.batch_size, num_workers=args.num_workers,
                     seed=args.seed,
                     crop_size=65 if args.synthetic else 225)
        cls = KeyframeLocalisation if args.target == "pnr" else StateChangeClassification
        return cls(cfg)
    if args.target in ("lta", "ar"):
        from egot2x.tasks.ar import MultiTaskClassificationTask
        from egot2x.tasks.lta import LongTermAnticipationTask

        root = args.data_root or os.path.join(tmp, "egot2x_lta_fixture")
        if args.synthetic and not os.path.exists(
                os.path.join(root, "fho_lta_train.json")):
            from egot2x.data.synthetic import make_lta_fixture

            make_lta_fixture(root, img_size=64)
        kw = dict(data_root=root, lr=0.1, wd=1e-4, batch_size=args.batch_size,
                  num_workers=args.num_workers, seed=args.seed)
        if args.synthetic:
            kw.update(crop_size=64, num_frames=8, alpha=4,
                      num_classes=[10, 12], batch_size=2)
        cfg = Config(**kw)
        return (LongTermAnticipationTask if args.target == "lta"
                else MultiTaskClassificationTask)(cfg)
    # ttm
    from egot2x.tasks.ttm import TalkingToMe

    root = args.data_root or os.path.join(tmp, "egot2x_ttm_fixture")
    if args.synthetic and not os.path.exists(os.path.join(root, "train.list")):
        from egot2x.data.synthetic import make_ttm_fixture

        make_ttm_fixture(root, img_size=32)
    cfg = Config(data_root=root, model="TTMBaselineLSTM",
                 weights=[0.266, 0.734], lr=5e-4, wd=0.0,
                 batch_size=120 if args.synthetic else 400,
                 num_workers=args.num_workers,
                 img_size=64 if args.synthetic else 224, seed=args.seed)
    return TalkingToMe(cfg)


def main(argv=None):
    from egot2x.core.dist import maybe_initialize_from_env

    maybe_initialize_from_env()  # multi-host bring-up (no-op single process)
    import jax

    args = build_argparser().parse_args(argv)
    if args.cfg:
        # reference eval-yaml surface (HOI/configs/eval/*.yaml consumed
        # by HOI/submission/eval_*.py). Read knobs from the RAW yaml
        # tree — resolving first would install schema defaults and make
        # every key look user-set (TEST.BATCH_SIZE=4 would clobber an
        # explicit --batch_size)
        from egot2x.core.config import Config

        ecfg = Config.from_yaml(args.cfg)
        yaml_ckpt = (ecfg.get_path("MISC.CHECKPOINT_FILE_PATH")
                     or ecfg.get_path("CHECKPOINT_FILE_PATH")
                     or (ecfg.get_path("CHECKPOINT_FILE_PATH_LTA")
                         if args.target == "lta" else None)
                     or (ecfg.get_path("CHECKPOINT_FILE_PATH_AR")
                         if args.target == "ar" else None))
        if not args.ckpt and yaml_ckpt and os.path.isdir(str(yaml_ckpt)):
            args.ckpt = yaml_ckpt
        if args.cfg and not args.ckpt and yaml_ckpt:
            if os.path.isfile(str(yaml_ckpt)):
                # reference yamls point at torch .ckpt files; those must
                # be translated into a Trainer checkpoint dir first
                print(f"warning: {yaml_ckpt!r} is a torch checkpoint "
                      "file — convert it with `python -m "
                      "egot2x.cli.import_ckpt` and pass the resulting "
                      "directory via --ckpt; running with randomly "
                      "initialized weights")
            else:
                print(f"warning: eval yaml checkpoint {yaml_ckpt!r} not "
                      "found; running with randomly initialized weights")
        args.data_root = args.data_root or ecfg.get("data_root")
        tb = ecfg.get_path("TEST.BATCH_SIZE")
        raw_argv = argv if argv is not None else sys.argv[1:]
        explicit_bs = any(a == "--batch_size"
                          or a.startswith("--batch_size=")
                          for a in raw_argv)
        if tb and not explicit_bs:
            args.batch_size = tb
    task = _make_task(args)
    state = task.build_state(jax.random.key(args.seed))
    if args.ckpt:
        from egot2x.train.trainer import CheckpointManager

        state = CheckpointManager(args.ckpt, task.checkpoint_metric).restore(state)

    eval_step = jax.jit(task.eval_step)
    loader = task.val_loader()
    results = [] if args.target in ("pnr", "oscc") else {}
    ttm_rows = []
    num_frames = getattr(task, "num_frames", 16)

    for batch in loader:
        dev = {k: v for k, v in batch.items()
               if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"}
        outputs = jax.device_get(eval_step(state, dev))
        valid = np.asarray(batch.get("valid", np.ones(args.batch_size, bool)))
        if args.target == "pnr":
            preds = np.asarray(outputs["preds"])
            for i in range(len(preds)):
                if not valid[i]:
                    continue
                s = int(batch["clip_start_frame"][i])
                e = int(batch["clip_end_frame"][i])
                loc = int(np.argmax(preds[i]))
                pnr_frame = s + (e - s) / num_frames * loc
                results.append({"unique_id": batch["unique_id"][i],
                                "pnr_frame": float(pnr_frame)})
        elif args.target == "oscc":
            logits = np.asarray(outputs["logits"])
            for i in range(len(logits)):
                if not valid[i]:
                    continue
                results.append({"unique_id": batch["unique_id"][i],
                                "state_change": bool(np.argmax(logits[i]) == 1)})
        elif args.target == "lta":
            vp = np.asarray(outputs["verb_preds"])
            np_p = np.asarray(outputs["noun_preds"])
            for i in range(len(vp)):
                if not valid[i]:
                    continue
                results[batch["clip_uid"][i]] = {
                    "verb": vp[i].tolist(), "noun": np_p[i].tolist()}
        elif args.target == "ar":
            vl = np.asarray(outputs["verb_logits"])
            nl = np.asarray(outputs["noun_logits"])
            for i in range(len(vl)):
                if not valid[i]:
                    continue
                results[batch["clip_uid"][i]] = {
                    "verb": int(np.argmax(vl[i])), "noun": int(np.argmax(nl[i]))}
        else:  # ttm
            logits = np.asarray(outputs["logits"])
            p = np.exp(logits - logits.max(axis=1, keepdims=True))
            p = p / p.sum(axis=1, keepdims=True)
            for i in range(len(logits)):
                if not valid[i]:
                    continue
                vid, fid = batch["seg_id"][i].split(":")
                ttm_rows.append({"video_id": vid, "frame_id": fid,
                                 "label": 1, "score": float(p[i, 1])})

    out_path = args.output or f"submit_{args.target}.json"
    if args.target == "ttm":
        payload = {"version": "1.0", "challenge": "ego4d_talking_to_me",
                   "results": ttm_rows}
    else:
        payload = results
    with open(out_path, "w") as f:
        json.dump(payload, f)
    n = len(ttm_rows) if args.target == "ttm" else len(results)
    print(f"wrote {out_path} ({n} entries)")
    return out_path


if __name__ == "__main__":
    main()
