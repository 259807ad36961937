"""int8 PTQ accuracy gate on the FULL flagship translator.

The headline bench (bench.py) runs TaskFusionMFTransformer3Task with
int8 static-PTQ conv trunks in bf16 compute; the north star binds that
throughput to "mAP within 0.2 pts" of the float model. This test
enforces exactly that contract end-to-end: train the flagship on a
SEPARABLE synthetic TTM 2-loader fixture (label-correlated brightness
— pure-noise frames make the labels unlearnable, scores collapse to
ties, and mAP of tied scores is tie-break noise, not PTQ error),
evaluate val mAP with the float model and with the bf16+int8 twin
(same trained params, calibrated activation scales — the exact bench
configuration), and fail if

  * |mAP_float − mAP_int8| > 0.002 on the val split (the 0.2-pt
    analogue),
  * any per-sample val score moves by more than 0.02,
  * the full-translator logit cosine (train + val inputs) drops below
    0.99 (test_quant.py gates a single resnet forward; this covers the
    trunks + TalkNet + fusion transformer composition the bench
    actually measures), or
  * the float val scores stop separating (a hollow-gate guard).
"""

import jax
import jax.numpy as jnp
import numpy as np

from egot2x.core.config import Config


def _softmax1(logits):
    z = logits - logits.max(axis=-1, keepdims=True)
    p = np.exp(z)
    return (p / p.sum(axis=-1, keepdims=True))[:, 1]


def test_int8_flagship_map_within_gate(tmp_path):
    from egot2x.core.registry import build_model
    from egot2x.data.synthetic import make_ttm_fixture
    from egot2x.metrics.map import run_evaluation
    from egot2x.nn.quant import assert_calibrated, calibrate_variables
    from egot2x.tasks.ttm_2loader import TalkingToMe2Loader
    from egot2x.train.state import merge_trees

    # ONE bucket of 8 same-length segments (4 pos / 4 neg) per split,
    # with a label-correlated brightness signal so the task is actually
    # learnable (see make_ttm_fixture docstring): the default fixture's
    # noise frames give every sample identical pooled features and any
    # model converges to the ln(2) prior — tied scores, nothing to gate
    root = make_ttm_fixture(str(tmp_path / "ttm"), img_size=16,
                            seg_lens=[25] * 8, label_signal=60.0)
    cfg = Config(data_root=root, model="TaskFusionMFTransformer3Task",
                 weights=[0.5, 0.5], lr=3e-3, wd=0.0, batch_size=30,
                 num_workers=2, img_size=16, seed=0, hidden_dim=32,
                 num_layers=1, num_heads=4, dropout=0.0, nofreeze=False,
                 lam_checkpoint=None, ttm_checkpoint=None,
                 asd_checkpoint=None)
    task = TalkingToMe2Loader(cfg)
    state = task.build_state(jax.random.key(0))
    # the loader chunks the 8 same-length segments into 4 batches of 2
    # samples sharing ONE shape — so round-robin training compiles once
    # and the model can memorize all 8 samples (4 pos / 4 neg)
    train_batches = [{k: v for k, v in b.items()
                      if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"}
                     for b in task.train_loader()]
    assert len({tuple(b["label"].shape) for b in train_batches}) == 1
    # train to REAL class separation (loss ~1e-3, val scores at the
    # rails): with a barely-trained model the scores are near-ties and
    # a single bf16-rounding rank flip moves mAP by 1/n — the gate
    # would then measure tie-breaking noise, not PTQ error
    step = jax.jit(task.train_step, donate_argnums=0)
    for i in range(25):
        for j, b in enumerate(train_batches):
            state, _ = step(state, b, jax.random.key(i * 7 + j))

    full_params = (merge_trees(state.frozen, state.params)
                   if state.frozen else state.params)
    vf = {"params": full_params, "batch_stats": state.batch_stats}

    # int8 twin: SAME trained params, fresh quant scales, calibrated on
    # the val batch — the bench.py deployment recipe, including bf16
    # compute (bench.py builds with dtype=bfloat16; a bf16-specific
    # regression in the dequant epilogues must fail this gate)
    m_q = build_model(cfg.model, quant=True, dtype=jnp.bfloat16,
                      hidden_dim=32, num_layers=1, num_heads=4,
                      dropout=0.0)
    val_batches = [{k: v for k, v in vb.items()} for vb in task.val_loader()]
    inputs0 = task._model_inputs(val_batches[0])
    vq0 = m_q.init(jax.random.key(1), *[jnp.asarray(x) for x in inputs0],
                   train=False)
    assert (jax.tree_util.tree_structure(vq0["params"])
            == jax.tree_util.tree_structure(full_params))
    vq = {"params": full_params, "batch_stats": state.batch_stats,
          "quant": vq0["quant"]}
    vq = calibrate_variables(m_q, vq, *[jnp.asarray(x) for x in inputs0],
                             train=False)
    assert_calibrated(vq)

    # ranking gate on the VAL split (the trained model generalizes on
    # the separable fixture — val scores sit at the rails with correct
    # labels), plus a direct per-sample score-perturbation bound and a
    # logit cosine over train + val inputs
    val_set = {id(b) for b in val_batches}
    labels, sf, sq = [], [], []
    cos_num = cos_f = cos_q = 0.0
    for vb in train_batches + val_batches:
        inputs = [jnp.asarray(np.asarray(x)) for x in task._model_inputs(vb)]
        lf = np.asarray(task.model.apply(vf, *inputs, train=False))
        lq = np.asarray(m_q.apply(vq, *inputs, train=False))
        valid = np.asarray(vb.get("valid", np.ones(len(lf), bool))).astype(bool)
        if id(vb) in val_set:
            labels.extend(np.asarray(vb["label"])[valid].tolist())
            sf.extend(_softmax1(lf[valid]).tolist())
            sq.extend(_softmax1(lq[valid]).tolist())
        cos_num += float((lf[valid] * lq[valid]).sum())
        cos_f += float((lf[valid] ** 2).sum())
        cos_q += float((lq[valid] ** 2).sum())

    cos = cos_num / (np.sqrt(cos_f) * np.sqrt(cos_q) + 1e-9)
    assert cos > 0.99, f"full-translator int8 logit cosine {cos:.4f}"

    sf, sq = np.asarray(sf), np.asarray(sq)
    # guard: the gate is hollow unless the float scores separate
    assert sf.max() - sf.min() > 0.2, (
        "fixture degenerated to tied scores — the mAP gate would "
        f"measure tie-breaking noise (spread {sf.max() - sf.min():.3f})")
    assert float(np.abs(sf - sq).max()) <= 0.02, (
        f"int8 perturbs a per-sample score by {np.abs(sf - sq).max():.4f}")

    uids = [f"u{i}" for i in range(len(labels))]
    map_f, _ = run_evaluation(uids, np.asarray(labels), sf)
    map_q, _ = run_evaluation(uids, np.asarray(labels), sq)
    delta = abs(map_f - map_q)
    assert delta <= 0.002, (
        f"int8 PTQ costs {delta*100:.2f} mAP pts (float {map_f:.4f} vs "
        f"int8 {map_q:.4f}) — the benched config violates the 0.2-pt "
        "north-star gate")
