"""S3FD face detector (data-prep tool) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from egot2x.nn.s3fd import S3FDNet, decode, detect_faces, nms, prior_boxes


def test_s3fd_forward_sources(rng):
    net = S3FDNet()
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 3)), dtype=jnp.float32)
    v = net.init(jax.random.key(0), x)
    outs = net.apply(v, x)
    assert len(outs) == 6
    # source strides 4, 8, 16, 32, 64, 128
    assert outs[0][0].shape[1] == 32 and outs[-1][0].shape[1] == 1
    for loc, conf in outs:
        assert loc.shape[-1] == 4 and conf.shape[-1] == 2
        np.testing.assert_allclose(np.asarray(conf).sum(-1), 1.0, rtol=1e-4)


def test_decode_identity():
    priors = np.array([[0.5, 0.5, 0.2, 0.2]], dtype=np.float32)
    boxes = decode(np.zeros((1, 4), np.float32), priors)
    np.testing.assert_allclose(boxes, [[0.4, 0.4, 0.6, 0.6]], atol=1e-6)


def test_nms_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     dtype=np.float32)
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms(boxes, scores, overlap=0.3)
    assert list(keep) == [0, 2]


def test_detect_faces_end_to_end(rng):
    net = S3FDNet()
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), dtype=jnp.float32)
    v = net.init(jax.random.key(0), x)
    outs = net.apply(v, x)
    dets = detect_faces(outs, (64, 64), conf_thresh=0.0)
    assert dets.ndim == 2 and dets.shape[1] == 5
