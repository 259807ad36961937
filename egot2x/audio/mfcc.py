"""MFCC frontend in pure JAX, python_speech_features-compatible.

The reference's ASD/TalkNet pipeline computes 13-dim MFCCs on the host
with ``python_speech_features.mfcc(audio, 16000, winlen=0.025*25/fps,
winstep=0.010*25/fps)`` (HHI/dataset/asd/dataLoader.py:69,
HHI/dataset/ttm/data_loader_2task.py). Note the reference's fps-scaled
window — an intentional quirk we preserve for parity.

python_speech_features semantics reproduced here:
  * pre-emphasis y[0]=x[0], y[t]=x[t]-0.97·x[t-1]
  * framing: frame_len = round_half_to_even? — psf uses
    ``int(decimal.Decimal(winlen*sr).quantize(0, ROUND_HALF_UP))``; we
    use round-half-up; zero-pad the tail, n_frames = 1+ceil((N-L)/S)
  * rectangular window (psf default winfunc=ones)
  * power spectrum |rfft(frame, nfft=512)|² / nfft
  * 26 triangular HTK-mel filters, bins = floor((nfft+1)·hz/sr)
  * log → DCT-II (ortho) → first 13 coefficients
  * ceplifter 22, appendEnergy replaces c0 with log(total frame energy)

Pure jnp, so the MFCC computation fuses into the model jit and runs
on-device (framing gather + one (T, 257)@(257, 26) matmul + small DCT).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _round_half_up(x: float) -> int:
    return int(math.floor(x + 0.5))


@functools.lru_cache(maxsize=None)
def _psf_filterbank(nfilt: int, nfft: int, samplerate: int,
                    lowfreq: float, highfreq: float) -> np.ndarray:
    """(nfilt, nfft//2+1) filterbank with psf's floor-binned triangles."""
    hz2mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
    mel2hz = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    lowmel, highmel = hz2mel(lowfreq), hz2mel(highfreq)
    melpoints = np.linspace(lowmel, highmel, nfilt + 2)
    bins = np.floor((nfft + 1) * mel2hz(melpoints) / samplerate).astype(int)
    fbank = np.zeros((nfilt, nfft // 2 + 1))
    for j in range(nfilt):
        for i in range(bins[j], bins[j + 1]):
            fbank[j, i] = (i - bins[j]) / (bins[j + 1] - bins[j])
        for i in range(bins[j + 1], bins[j + 2]):
            fbank[j, i] = (bins[j + 2] - i) / (bins[j + 2] - bins[j + 1])
    return fbank.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dct2_ortho_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_in, n_out) DCT-II matrix with ortho norm (scipy.fftpack.dct)."""
    k = np.arange(n_out)[None, :]
    n = np.arange(n_in)[:, None]
    mat = 2.0 * np.cos(np.pi * k * (2 * n + 1) / (2.0 * n_in))
    scale = np.ones(n_out) * np.sqrt(1.0 / (4.0 * n_in))
    scale[0] = np.sqrt(1.0 / (4.0 * n_in * 2)) * np.sqrt(2.0)
    # ortho: X0 *= sqrt(1/(4N))*sqrt(2)? scipy: f = sqrt(1/(4N)) if k==0 else sqrt(1/(2N))
    scale = np.where(k[0] == 0, np.sqrt(1.0 / (4.0 * n_in)), np.sqrt(1.0 / (2.0 * n_in)))
    return (mat * scale[None, :]).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _lifter_coeffs(numcep: int, ceplifter: int) -> np.ndarray:
    n = np.arange(numcep)
    return (1.0 + (ceplifter / 2.0) * np.sin(np.pi * n / ceplifter)).astype(np.float32)


def mfcc_np(
    signal: "np.ndarray",
    samplerate: int = 16000,
    winlen: float = 0.025,
    winstep: float = 0.01,
    numcep: int = 13,
    nfilt: int = 26,
    nfft: int = 512,
    ceplifter: int = 22,
    num_frames: int | None = None,
) -> "np.ndarray":
    """Host-side numpy twin of :func:`mfcc` for data loaders (the ASD
    pipeline computes MFCCs per variable-fps track on the host, matching
    the reference's python_speech_features call at
    HHI/dataset/asd/dataLoader.py:69)."""
    signal = np.asarray(signal, dtype=np.float64)
    frame_len = _round_half_up(winlen * samplerate)
    frame_step = _round_half_up(winstep * samplerate)
    emph = np.concatenate([signal[:1], signal[1:] - 0.97 * signal[:-1]])
    n = len(emph)
    psf_frames = 1 if n <= frame_len else 1 + int(math.ceil((n - frame_len) / frame_step))
    out_frames = num_frames if num_frames is not None else psf_frames
    padlen = (out_frames - 1) * frame_step + frame_len
    if padlen > n:
        emph = np.concatenate([emph, np.zeros(padlen - n)])
    idx = np.arange(out_frames)[:, None] * frame_step + np.arange(frame_len)[None, :]
    frames = emph[idx]
    pspec = np.abs(np.fft.rfft(frames, nfft)) ** 2 / nfft
    energy = pspec.sum(axis=1)
    energy = np.where(energy == 0, np.finfo(np.float32).eps, energy)
    fb = _psf_filterbank(nfilt, nfft, samplerate, 0.0, samplerate / 2.0).astype(np.float64)
    feat = pspec @ fb.T
    feat = np.log(np.where(feat == 0, np.finfo(np.float32).eps, feat))
    feat = feat @ _dct2_ortho_matrix(nfilt, numcep).astype(np.float64)
    feat = feat * _lifter_coeffs(numcep, ceplifter).astype(np.float64)
    feat[:, 0] = np.log(energy)
    return feat.astype(np.float32)


def mfcc(
    signal: jax.Array,  # (..., samples)
    samplerate: int = 16000,
    winlen: float = 0.025,
    winstep: float = 0.01,
    numcep: int = 13,
    nfilt: int = 26,
    nfft: int = 512,
    lowfreq: float = 0.0,
    highfreq: float | None = None,
    preemph: float = 0.97,
    ceplifter: int = 22,
    append_energy: bool = True,
    num_frames: int | None = None,
) -> jax.Array:
    """MFCCs (..., n_frames, numcep).

    ``num_frames`` forces a static frame count (pad/truncate) so the op
    can live inside a fixed-shape jit; default derives psf's count from
    the (static) signal length.
    """
    highfreq = highfreq if highfreq is not None else samplerate / 2.0
    frame_len = _round_half_up(winlen * samplerate)
    frame_step = _round_half_up(winstep * samplerate)

    # pre-emphasis (psf keeps the first sample unchanged)
    first = signal[..., :1]
    emph = jnp.concatenate([first, signal[..., 1:] - preemph * signal[..., :-1]], axis=-1)

    n = emph.shape[-1]
    if n <= frame_len:
        psf_frames = 1
    else:
        psf_frames = 1 + int(math.ceil((n - frame_len) / frame_step))
    out_frames = num_frames if num_frames is not None else psf_frames
    padlen = (out_frames - 1) * frame_step + frame_len
    if padlen > n:
        pad = [(0, 0)] * (emph.ndim - 1) + [(0, padlen - n)]
        emph = jnp.pad(emph, pad)
    idx = np.arange(out_frames)[:, None] * frame_step + np.arange(frame_len)[None, :]
    frames = emph[..., idx]  # (..., T, frame_len)

    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    pspec = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2) / nfft  # (..., T, nfft//2+1)
    energy = jnp.sum(pspec, axis=-1)
    energy = jnp.where(energy == 0, np.finfo(np.float32).eps, energy)

    fb = jnp.asarray(_psf_filterbank(nfilt, nfft, samplerate, lowfreq, highfreq))
    feat = jnp.einsum("...tf,mf->...tm", pspec, fb)
    feat = jnp.where(feat == 0, np.finfo(np.float32).eps, feat)
    feat = jnp.log(feat)

    dct_m = jnp.asarray(_dct2_ortho_matrix(nfilt, numcep))
    feat = jnp.einsum("...tm,mk->...tk", feat, dct_m)
    feat = feat * jnp.asarray(_lifter_coeffs(numcep, ceplifter))
    if append_energy:
        feat = feat.at[..., 0].set(jnp.log(energy))
    return feat
