"""Audio frontend tests: golden comparisons against independent numpy
implementations of the torchaudio / python_speech_features semantics."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.fftpack import dct as scipy_dct

from egot2x.audio import melspec, mfcc as mfcc_mod


def numpy_melspectrogram(x, sr=16000, n_fft=512, win_length=400, hop=160, n_mels=64):
    """Straightforward numpy port of torchaudio MelSpectrogram semantics."""
    n = np.arange(win_length)
    window = 0.54 - 0.46 * np.cos(2 * np.pi * n / win_length)  # periodic hamming
    lpad = (n_fft - win_length) // 2
    window = np.pad(window, (lpad, n_fft - win_length - lpad))
    pad = n_fft // 2
    xp = np.pad(x, pad, mode="reflect")
    n_frames = 1 + (len(xp) - n_fft) // hop
    spec = np.empty((n_fft // 2 + 1, n_frames))
    for t in range(n_frames):
        fr = xp[t * hop : t * hop + n_fft] * window
        spec[:, t] = np.abs(np.fft.rfft(fr)) ** 2
    fb = melspec.mel_filterbank(sr, n_fft, n_mels)
    return fb.T @ spec


def test_melspectrogram_matches_numpy(rng):
    x = rng.standard_normal(16000).astype(np.float32)
    ours = np.asarray(melspec.melspectrogram(jnp.asarray(x)))
    ref = numpy_melspectrogram(x.astype(np.float64))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_mel_filterbank_shape_and_coverage():
    fb = melspec.mel_filterbank(16000, 512, 64)
    assert fb.shape == (257, 64)
    assert fb.min() >= 0
    # every filter has some support
    assert (fb.sum(axis=0) > 0).all()


def test_pre_emphasis_reflect_pad(rng):
    x = rng.standard_normal((2, 100)).astype(np.float32)
    y = np.asarray(melspec.pre_emphasis(jnp.asarray(x)))
    # interior: y[t] = x[t] - 0.97 x[t-1]
    np.testing.assert_allclose(y[:, 1:], x[:, 1:] - 0.97 * x[:, :-1], rtol=1e-6)
    # first sample uses reflect pad (x[1])
    np.testing.assert_allclose(y[:, 0], x[:, 0] - 0.97 * x[:, 1], rtol=1e-6)


def numpy_psf_mfcc(signal, sr=16000, winlen=0.025, winstep=0.01, numcep=13,
                   nfilt=26, nfft=512, ceplifter=22):
    """Independent numpy implementation of python_speech_features.mfcc."""
    import math

    emph = np.append(signal[0], signal[1:] - 0.97 * signal[:-1])
    frame_len = int(round(winlen * sr))
    frame_step = int(round(winstep * sr))
    slen = len(emph)
    if slen <= frame_len:
        numframes = 1
    else:
        numframes = 1 + int(math.ceil((slen - frame_len) / frame_step))
    padlen = (numframes - 1) * frame_step + frame_len
    emph = np.concatenate([emph, np.zeros(max(0, padlen - slen))])
    idx = np.arange(numframes)[:, None] * frame_step + np.arange(frame_len)[None, :]
    frames = emph[idx]
    pspec = np.abs(np.fft.rfft(frames, nfft)) ** 2 / nfft
    energy = pspec.sum(1)
    energy = np.where(energy == 0, np.finfo(np.float64).eps, energy)
    fb = mfcc_mod._psf_filterbank(nfilt, nfft, sr, 0.0, sr / 2.0).astype(np.float64)
    feat = pspec @ fb.T
    feat = np.where(feat == 0, np.finfo(np.float64).eps, feat)
    feat = np.log(feat)
    feat = scipy_dct(feat, type=2, axis=1, norm="ortho")[:, :numcep]
    n = np.arange(numcep)
    lift = 1 + (ceplifter / 2.0) * np.sin(np.pi * n / ceplifter)
    feat = feat * lift
    feat[:, 0] = np.log(energy)
    return feat


def test_mfcc_matches_psf_semantics(rng):
    x = rng.standard_normal(8000).astype(np.float32)
    ours = np.asarray(mfcc_mod.mfcc(jnp.asarray(x)))
    ref = numpy_psf_mfcc(x.astype(np.float64))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_mfcc_static_num_frames(rng):
    x = rng.standard_normal(8000).astype(np.float32)
    out = mfcc_mod.mfcc(jnp.asarray(x), num_frames=120)
    assert out.shape == (120, 13)


def test_fps_scaled_window():
    # reference quirk: winlen scaled by 25/fps (HHI/dataset/asd/dataLoader.py:69)
    fps = 30.0
    x = np.ones(16000, dtype=np.float32)
    out = mfcc_mod.mfcc(jnp.asarray(x), winlen=0.025 * 25 / fps,
                        winstep=0.010 * 25 / fps)
    assert out.shape[1] == 13
