"""Worker for the REAL 2-process multi-host test.

Launched by tests/test_multihost_2proc.py as a subprocess per process.
Must configure the platform BEFORE importing jax: each process gets 4
virtual CPU devices and joins a jax.distributed cluster through the
EGOT2X_* env path (egot2x/core/dist.py maybe_initialize_from_env —
the exact code path a real multi-host launch uses).

argv: <lam_fixture_root> <out_json>
env:  EGOT2X_COORDINATOR, EGOT2X_NUM_PROCESSES, EGOT2X_PROCESS_ID
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from egot2x.core.config import Config  # noqa: E402
from egot2x.core.dist import maybe_initialize_from_env  # noqa: E402


def main():
    root, out_json = sys.argv[1], sys.argv[2]
    nproc = maybe_initialize_from_env()

    from egot2x.tasks.lam import LookingAtMe
    from egot2x.train.trainer import Trainer

    cfg = Config(
        data_root=root, model="BaselineLSTM", weights=[0.136, 0.864],
        lr=1e-3, batch_size=8 // nproc,  # PER-PROCESS; global stays 8
        num_workers=2, img_size=32, train_stride=1, val_stride=1, seed=0,
    )
    task = LookingAtMe(cfg)
    # ONE shared checkpoint dir across processes: Orbax multihost saves
    # are collective (all processes call save on the same path)
    trainer = Trainer(task, max_epochs=1,
                      default_root_dir=os.path.join(
                          os.path.dirname(out_json), f"logs_np{nproc}"),
                      log_every=1)
    # deterministic pre-fit validation: same seed-0 init in every mode,
    # so the GLOBAL metric must match bit-for-bit across process counts
    # (exercises the eval shard/merge path with no train-order noise)
    import jax.random as jrandom

    metrics_init = trainer.validate(task.build_state(jrandom.key(0)))
    state = trainer.fit()
    metrics = trainer.validate(state)
    with open(out_json, "w") as f:
        json.dump({"process_index": jax.process_index(),
                   "process_count": jax.process_count(),
                   "n_devices": jax.device_count(),
                   "metrics_init": {k: float(v)
                                    for k, v in metrics_init.items()},
                   "metrics": {k: float(v) for k, v in metrics.items()}}, f)


if __name__ == "__main__":
    main()
