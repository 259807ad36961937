"""int8 PTQ accuracy gate on the FULL flagship translator.

The headline bench (bench.py) runs TaskFusionMFTransformer3Task with
int8 static-PTQ conv trunks; the north star binds that throughput to
"mAP within 0.2 pts" of the float model. This test enforces exactly
that contract end-to-end: train the flagship briefly on the synthetic
TTM 2-loader fixture, evaluate val mAP with the float model and with
the int8 twin (same trained params, calibrated activation scales —
the exact bench configuration), and fail if

  * |mAP_float − mAP_int8| > 0.002 (the 0.2-pt analogue), or
  * the full-translator logit cosine drops below 0.99 (test_quant.py
    gates a single resnet forward; this covers the trunks + TalkNet +
    fusion transformer composition the bench actually measures).
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

    root = make_ttm_fixture(str(tmp_path / "ttm"), img_size=16)
    cfg = Config(data_root=root, model="TaskFusionMFTransformer3Task",
                 weights=[0.5, 0.5], lr=3e-3, wd=0.0, batch_size=30,
                 num_workers=2, img_size=16, seed=0, hidden_dim=32,
                 num_layers=1, num_heads=4, dropout=0.0, nofreeze=False,
                 lam_checkpoint=None, ttm_checkpoint=None,
                 asd_checkpoint=None)
    task = TalkingToMe2Loader(cfg)
    state = task.build_state(jax.random.key(0))
    batch = next(iter(task.train_loader()))
    dev = {k: v for k, v in batch.items()
           if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"}
    step = jax.jit(task.train_step, donate_argnums=0)
    for i in range(12):
        state, _ = step(state, dev, jax.random.key(i))

    full_params = (merge_trees(state.frozen, state.params)
                   if state.frozen else state.params)
    vf = {"params": full_params, "batch_stats": state.batch_stats}

    # int8 twin: SAME trained params, fresh quant scales, calibrated on
    # the val batch — the bench.py deployment recipe
    m_q = build_model(cfg.model, quant=True, hidden_dim=32, num_layers=1,
                      num_heads=4, dropout=0.0)
    val_batches = []
    for vb in task.val_loader():
        val_batches.append({k: v for k, v in vb.items()})
        if len(val_batches) >= 2:
            break
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

    uids, labels, sf, sq = [], [], [], []
    cos_num = cos_f = cos_q = 0.0
    for vb in val_batches:
        inputs = [jnp.asarray(x) for x in task._model_inputs(vb)]
        lf = np.asarray(task.model.apply(vf, *inputs, train=False))
        lq = np.asarray(m_q.apply(vq, *inputs, train=False))
        valid = np.asarray(vb.get("valid", np.ones(len(lf), bool))).astype(bool)
        uids.extend(str(s) for s in np.asarray(vb["seg_id"])[valid])
        labels.extend(np.asarray(vb["label"])[valid].tolist())
        sf.extend(_softmax1(lf[valid]).tolist())
        sq.extend(_softmax1(lq[valid]).tolist())
        cos_num += float((lf[valid] * lq[valid]).sum())
        cos_f += float((lf[valid] ** 2).sum())
        cos_q += float((lq[valid] ** 2).sum())

    cos = cos_num / (np.sqrt(cos_f) * np.sqrt(cos_q) + 1e-9)
    assert cos > 0.99, f"full-translator int8 logit cosine {cos:.4f}"

    map_f, _ = run_evaluation(uids, np.asarray(labels), np.asarray(sf))
    map_q, _ = run_evaluation(uids, np.asarray(labels), np.asarray(sq))
    delta = abs(map_f - map_q)
    assert delta <= 0.002, (
        f"int8 PTQ costs {delta*100:.2f} mAP pts (float {map_f:.4f} vs "
        f"int8 {map_q:.4f}) — the benched config violates the 0.2-pt "
        "north-star gate")
