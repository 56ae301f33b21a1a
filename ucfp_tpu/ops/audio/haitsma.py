"""Haitsma-Kalker (Philips) robust hash kernel.

Rebuilds the audiofp Haitsma path (reference call-site audio.rs:181-224,
algorithm REPORT.md:913-944, density contract "312 B/sec" at
algorithms_manifest.rs:654):

  * input resampled to 5 kHz mono upstream (audio.rs:193-201)
  * frame 2048 samples, hop 64 (31/32 overlap) -> 78.125 frames/sec;
    one u32 sub-fingerprint per frame = 312.5 B/sec, matching the
    manifest's quoted density
  * 33 log-spaced bands between fmin 300 Hz and fmax 2000 Hz
    (algorithms_manifest.rs:657-672), rectangular band energies
  * bit[n, m] = 1 iff (E[n,m] - E[n,m+1]) - (E[n-1,m] - E[n-1,m+1]) > 0;
    the first frame has no predecessor, so T frames yield T-1 words

Wire: frames as u32 little-endian, cast straight to bytes like the
reference's bytemuck cast of HaitsmaFingerprint::frames (audio.rs:209).
Device pipeline: matmul-DFT (2048-point) -> band-matrix matmul ->
double-diff sign -> bit pack, one jit fusion.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import dsp

HAITSMA_SR = 5_000
FRAME = 2048
HOP = 64
N_BANDS = 33


@dataclass(frozen=True)
class HaitsmaConfig:
    fmin: float = 300.0
    fmax: float = 2000.0


@functools.lru_cache(maxsize=None)
def band_matrix(fmin: float, fmax: float) -> np.ndarray:
    """[K, 33] 0/1 rectangular log-spaced band selectors."""
    k = FRAME // 2 + 1
    freqs = np.arange(k, dtype=np.float64) * HAITSMA_SR / FRAME
    edges = fmin * (fmax / fmin) ** (np.arange(N_BANDS + 1) / N_BANDS)
    m = np.zeros((k, N_BANDS), dtype=np.float32)
    for b in range(N_BANDS):
        m[:, b] = ((freqs >= edges[b]) & (freqs < edges[b + 1])).astype(np.float32)
    return m


@functools.partial(jax.jit, static_argnums=(1, 2))
def haitsma_words(samples: jax.Array, fmin: float, fmax: float) -> jax.Array:
    """5 kHz mono f32 -> [T-1] uint32 sub-fingerprints."""
    power = dsp.stft_power(samples, FRAME, HOP, center=False)  # [T, K]
    bank = jnp.asarray(band_matrix(fmin, fmax))
    e = jnp.dot(
        power, bank, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [T, 33]
    d = e[:, :-1] - e[:, 1:]  # [T, 32] band differentials
    dd = d[1:] - d[:-1]  # [T-1, 32] time differential
    bits = (dd > 0.0).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
    return jnp.sum(bits * weights, axis=1, dtype=jnp.uint32)


def fingerprint_frames(samples: np.ndarray, sr: int, cfg: HaitsmaConfig) -> np.ndarray:
    """Resample to 5 kHz and compute the u32 frame sequence."""
    x = dsp.resample_linear(np.asarray(samples, np.float32), sr, HAITSMA_SR)
    if len(x) < FRAME + HOP:
        return np.zeros(0, np.uint32)
    return np.asarray(haitsma_words(jnp.asarray(x), cfg.fmin, cfg.fmax))
