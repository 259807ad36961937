"""End-to-end pipeline benchmark for the flagship model (VERDICT #7).

Measures EgoT2-s TTM 3-task inference clips/s from **jpeg bytes on
disk** — C++ dataplane decode (egot2x/native) + MFCC + BatchLoader
prefetch feeding the jitted int8 forward — against the two stage
ceilings:

  * ``host_only``   — decode/MFCC/collate throughput with no device work;
  * ``device_only`` — the bench.py forward on pre-staged arrays;
  * ``e2e``         — the full overlapped pipeline.

The meaningful figure on any host is ``overlap_efficiency`` =
e2e / min(host_only, device_only): 1.0 means host decode and device
compute fully overlap (the north-star "pipelined" requirement). The
absolute e2e number is host-bound wherever host jpeg-decode throughput
is below the device rate — this box has ONE core; a production v5e
host has >200 — so the efficiency, not the absolute number, is the
portable claim.

Run: python tools/bench_e2e.py    (TPU; reuses bench.py's .bench_cache)
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T = 30
BATCH = 64
IMG = 224
SR = 16000
N_CLIPS = 256  # on-disk synthetic clip tree


def make_clip_tree(root: str, n_clips: int) -> list:
    import cv2

    rng = np.random.default_rng(0)
    clips = []
    for c in range(n_clips):
        d = os.path.join(root, f"clip{c:04d}")
        os.makedirs(d, exist_ok=True)
        paths = []
        for t in range(T):
            img = rng.integers(0, 255, (IMG, IMG, 3), dtype=np.uint8)
            p = os.path.join(d, f"f{t:03d}.jpg")
            cv2.imwrite(p, img)
            paths.append(p)
        wave = (rng.standard_normal(T * SR // 30) * 0.1).astype(np.float32)
        wp = os.path.join(d, "wave.npy")
        np.save(wp, wave)
        clips.append({"frames": paths, "wave": wp})
    return clips


class E2EClipDataset:
    """Host pipeline per clip, mirroring the TTM 2-task loader stages:
    224 RGB face crops + 112 gray ASD crops (both via the C++ dataplane)
    + raw wave + ASD MFCC."""

    def __init__(self, clips):
        from egot2x import native

        assert native.AVAILABLE, "C++ dataplane required for the e2e bench"
        self.native = native
        self.clips = clips
        from egot2x.audio.mfcc import mfcc_np

        self.mfcc_np = mfcc_np
        self.full = np.full((T, 4), -1.0, np.float32)  # full-frame bbox

    def __len__(self):
        return len(self.clips)

    def __getitem__(self, idx):
        info = self.clips[idx]
        # ship uint8 to the device and normalize in the jit — 4x less
        # host->device transfer than f32 (rides a network tunnel here)
        u8 = self.native.decode_crop_resize(info["frames"], self.full, IMG)
        u8_asd = self.native.decode_crop_resize(info["frames"], self.full, 112)
        # gray u8: the real ASD loader's gray is native cv2 u8
        # (data/asd.py crop_face_square); this synthetic path
        # approximates with a rounded channel mean, same device format
        video_asd = np.round(
            u8_asd.mean(axis=-1, dtype=np.float32)).astype(np.uint8)
        wave = np.load(info["wave"])
        audio_asd = self.mfcc_np(wave.astype(np.float64), SR,
                                 num_frames=4 * T).astype(np.float32)
        return {"video": u8, "video_asd": video_asd, "audio": wave,
                "audio_asd": audio_asd}


def main():
    import jax
    import jax.numpy as jnp

    from _exp_util import enable_compile_cache

    enable_compile_cache()

    from egot2x.core.registry import build_model
    from egot2x.data.pipeline import BatchLoader
    import egot2x.translate.egot2s_hhi  # noqa: F401

    tmp = tempfile.mkdtemp(prefix="e2e_clips_")
    print("writing synthetic clip tree...", file=sys.stderr)
    clips = make_clip_tree(tmp, N_CLIPS)
    ds = E2EClipDataset(clips)
    loader = BatchLoader(ds, BATCH, mode="train", num_workers=8, prefetch=2)

    # -- host-only ceiling --
    it = iter(loader)
    first = next(it)  # warm the pool
    t0 = time.perf_counter()
    n_batches = 0
    for batch in it:
        n_batches += 1
    host_dt = time.perf_counter() - t0
    host_rate = n_batches * BATCH / host_dt

    # -- device-only ceiling (bench.py's fwd on the staged first batch) --
    model = build_model("TaskFusionMFTransformer3Task", hidden_dim=128,
                        num_layers=1, quant=True, dtype=jnp.bfloat16)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", "variables_int8")
    from egot2x.core.checkpoint import restore_tree

    keys = ("video", "video_asd", "audio", "audio_asd")
    dev = jax.devices()[0]
    staged = tuple(jax.device_put(jnp.asarray(first[k]), dev) for k in keys)
    if os.path.isdir(cache):
        variables = jax.device_put(dict(restore_tree(cache)), dev)
    else:  # fall back: CPU init (uncalibrated scales; fine for timing)
        cpu = jax.devices("cpu")[0]
        norm_shapes = [np.zeros(x.shape, np.float32) for x in staged]
        with jax.default_device(cpu):
            variables = model.init(jax.random.key(0), *norm_shapes,
                                   train=False)
        variables = jax.device_put(dict(variables), dev)
        from egot2x.nn.quant import calibrate_variables

        variables = calibrate_variables(model, variables, *staged,
                                        train=False)
    from egot2x.nn.quant import assert_calibrated

    assert_calibrated(variables)

    def fwd_(v, video_u8, video_asd, audio, audio_asd):
        # raw uint8 RGB goes straight in — the translator normalizes
        # in-jit, once, before the stream fans out to both trunks
        # (egot2x/translate/egot2s_hhi.py; tests/test_u8_input.py)
        return model.apply(v, video_u8, video_asd, audio, audio_asd,
                           train=False)

    fwd = jax.jit(fwd_)

    out = fwd(variables, *staged)
    _ = np.asarray(out)
    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fwd(variables, *staged)
    _ = np.asarray(out)
    dev_dt = time.perf_counter() - t0
    dev_rate = BATCH * n_iter / dev_dt

    # -- e2e: loader -> device_put -> fwd, async dispatch overlaps decode --
    outs = []
    t0 = time.perf_counter()
    n_batches = 0
    for batch in loader:
        args = tuple(jax.device_put(jnp.asarray(batch[k]), dev) for k in keys)
        outs.append(fwd(variables, *args))
        n_batches += 1
    _ = [np.asarray(o) for o in outs]
    e2e_dt = time.perf_counter() - t0
    e2e_rate = n_batches * BATCH / e2e_dt

    eff = e2e_rate / max(min(host_rate, dev_rate), 1e-9)
    print(json.dumps({
        "metric": "egot2s_ttm_3task_e2e_clips_per_sec",
        "value": round(e2e_rate, 2),
        "unit": "clips/s/chip",
        "host_only": round(host_rate, 2),
        "device_only": round(dev_rate, 2),
        "overlap_efficiency": round(eff, 3),
        "host_cores": os.cpu_count(),
    }))

    # -- e2e from-memory: pre-decoded uint8 clips in RAM -> BatchLoader
    # collate -> device_put -> fwd. Removes the jpeg-decode host floor
    # (this box has 1 core; a v5e host has >200), so the ratio
    # e2e_mem / device_only shows whether the PIPELINE — collation,
    # host->device transfer, dispatch — can keep the chip busy
    # (VERDICT r2 weak #3; target >= 0.9).
    print("pre-decoding clips into RAM...", file=sys.stderr)
    ram_items = [ds[i] for i in range(len(ds))]

    class RamDataset:
        def __len__(self):
            return len(ram_items)

        def __getitem__(self, idx):
            return ram_items[idx]

    mem_loader = BatchLoader(RamDataset(), BATCH, mode="train",
                             num_workers=0, prefetch=2)
    # warm one epoch (page-stable), then time several epochs
    outs = []
    mb_per_batch = 0.0
    for batch in mem_loader:
        args = tuple(jax.device_put(jnp.asarray(batch[k]), dev) for k in keys)
        mb_per_batch = sum(a.nbytes for a in args) / 1e6
        outs.append(fwd(variables, *args))
    _ = [np.asarray(o) for o in outs]

    # transfer-only ceiling: collate + device_put with NO device compute.
    # On this box host->device rides a network tunnel (~tens of MB/s);
    # production v5e hosts have PCIe. e2e efficiency must be judged
    # against min(transfer, device), or the link masquerades as a
    # pipeline defect.
    staged_all = []
    t0 = time.perf_counter()
    n_batches = 0
    for _ in range(2):
        for batch in mem_loader:
            args = tuple(jax.device_put(jnp.asarray(batch[k]), dev)
                         for k in keys)
            staged_all.append(args[0])
            n_batches += 1
    _ = [np.asarray(a[0, 0, 0, 0]) for a in staged_all]
    tr_dt = time.perf_counter() - t0
    tr_rate = n_batches * BATCH / tr_dt
    tr_mbps = n_batches * mb_per_batch / tr_dt
    staged_all = None
    n_epochs = 4
    outs = []
    n_batches = 0
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        for batch in mem_loader:
            args = tuple(jax.device_put(jnp.asarray(batch[k]), dev)
                         for k in keys)
            outs.append(fwd(variables, *args))
            n_batches += 1
    _ = [np.asarray(o) for o in outs]
    mem_dt = time.perf_counter() - t0
    mem_rate = n_batches * BATCH / mem_dt
    print(json.dumps({
        "metric": "egot2s_ttm_3task_e2e_from_memory_clips_per_sec",
        "value": round(mem_rate, 2),
        "unit": "clips/s/chip",
        "device_only": round(dev_rate, 2),
        "transfer_only": round(tr_rate, 2),
        "transfer_mb_per_sec": round(tr_mbps, 1),
        "pipeline_efficiency": round(
            mem_rate / max(min(dev_rate, tr_rate), 1e-9), 3),
        "host_cores": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
