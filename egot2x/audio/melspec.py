"""Log-mel spectrogram frontend in pure JAX.

Replaces the reference's ``torchaudio.transforms.MelSpectrogram`` inside
``ResNetSE`` (HHI/models/ttm/resse.py:37-45): sample_rate 16 kHz,
n_fft 512, win_length 400, hop_length 160, periodic Hamming window,
n_mels 64, HTK mel scale, power 2, center-padded (reflect) — followed by
``+1e-6 → log → InstanceNorm1d`` (resse.py:101-105).

Because it is pure ``jnp``, the whole frontend fuses into the model's
jit: framing is a gather, the rFFT runs on-device, and the mel projection
is a (frames, 257) @ (257, 64) matmul on the MXU — no host round-trip,
unlike the reference's CPU torchaudio path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hamming_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """torch.hamming_window semantics (periodic=True divides by N, not N-1)."""
    n = np.arange(win_length, dtype=np.float64)
    denom = win_length if periodic else win_length - 1
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * n / denom)).astype(np.float32)


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sample_rate: int = 16000,
    n_fft: int = 512,
    n_mels: int = 64,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """(n_freqs, n_mels) triangular HTK-mel filterbank (torchaudio MelScale,
    norm=None, mel_scale='htk')."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel_htk(f_min), hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def pre_emphasis(x: jax.Array, coef: float = 0.97) -> jax.Array:
    """Reflect-padded pre-emphasis (HHI/models/ttm/resse.py:181-197)."""
    # reflect pad 1 on the left: pad value is x[..., 1]
    left = x[..., 1:2]
    padded = jnp.concatenate([left, x], axis=-1)
    return padded[..., 1:] - coef * padded[..., :-1]


def _frame(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """Frame the last axis into (..., n_frames, frame_length)."""
    n = x.shape[-1]
    n_frames = 1 + (n - frame_length) // hop
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :])
    return x[..., idx]


def spectrogram_power(
    x: jax.Array,
    n_fft: int = 512,
    win_length: int = 400,
    hop_length: int = 160,
    window: np.ndarray | None = None,
    center: bool = True,
) -> jax.Array:
    """Power spectrogram |STFT|^2 with torch.stft center/reflect semantics.

    Returns (..., n_freqs, n_frames).
    """
    if window is None:
        window = hamming_window(win_length)
    # torch.stft pads the window symmetrically to n_fft.
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    win = jnp.asarray(window)
    if center:
        pad = n_fft // 2
        x = jnp.concatenate(
            [x[..., 1 : pad + 1][..., ::-1], x, x[..., -pad - 1 : -1][..., ::-1]],
            axis=-1,
        )
    frames = _frame(x, n_fft, hop_length) * win
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.swapaxes(power, -1, -2)  # (..., n_freqs, n_frames)


def melspectrogram(
    x: jax.Array,
    sample_rate: int = 16000,
    n_fft: int = 512,
    win_length: int = 400,
    hop_length: int = 160,
    n_mels: int = 64,
) -> jax.Array:
    """torchaudio-MelSpectrogram-compatible mel power spectrogram.

    x: (..., samples) → (..., n_mels, n_frames).
    """
    power = spectrogram_power(x, n_fft, win_length, hop_length)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
    # (..., n_freqs, T) x (n_freqs, n_mels) → (..., n_mels, T)
    return jnp.einsum("...ft,fm->...mt", power, fb)


def instance_norm_1d(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm1d(affine=False): normalize over time per (batch, channel)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def resse_frontend(wave: jax.Array) -> jax.Array:
    """The full ResNetSE audio frontend (resse.py:99-105).

    wave: (B, samples) raw 16 kHz audio → (B, 64, T) normalized log-mels.
    """
    x = pre_emphasis(wave)
    x = melspectrogram(x) + 1e-6
    x = jnp.log(x)
    return instance_norm_1d(x)
