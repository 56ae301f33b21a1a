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
    # ucfp-int-fft-v1 spectrogram (ops/audio/intfft.py): ~8x fewer MACs
    # than the dense integer DFT, a DIFFERENT exactness spec (staged
    # truncation) — words don't bit-match the default path, so the
    # config_hash forks when enabled. VERDICT r04 #9.
    fft: bool = False


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


@functools.lru_cache(maxsize=None)
def band_ranges(fmin: float, fmax: float) -> tuple:
    """Each log-spaced band is a CONTIGUOUS bin interval [k0, k1)
    (band_matrix selects `edges[b] <= freq < edges[b+1]` over
    monotonically increasing bin frequencies) — precomputed on host so
    the device band-energy stage is static slices, not masked
    full-row passes."""
    m = band_matrix(fmin, fmax)  # [K, N_BANDS]
    out = []
    for b in range(N_BANDS):
        nz = np.nonzero(m[:, b])[0]
        if len(nz) == 0:
            out.append((0, 0))
            continue
        k0, k1 = int(nz[0]), int(nz[-1]) + 1
        assert len(nz) == k1 - k0, "haitsma band must be contiguous"
        out.append((k0, k1))
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def haitsma_words(samples: jax.Array, fmin: float, fmax: float,
                  fft: bool = False) -> jax.Array:
    """5 kHz mono f32 -> [T-1] uint32 sub-fingerprints.

    Fully integer (call under jax.experimental.enable_x64): band
    energies are int64 sums of the bit-exact integer spectrogram, and
    the double-differential sign bits are integer comparisons — CPU and
    TPU emit identical words (the image-path exactness recipe applied
    to audio; round-1 PARITY measured 1.2% frame drift on the f32 path).

    fft=True swaps the dense integer DFT for the staged ucfp-int-fft-v1
    spectrogram (intfft.py) — same CPU<->TPU bit-identity guarantee,
    different truncation spec, so the words fork (HaitsmaConfig.fft)."""
    if fft:
        from . import intfft

        power = intfft.stft_power_int_fft(samples, FRAME, HOP,
                                          center=False)  # [T, K] int64
    else:
        power = dsp.stft_power_int(samples, FRAME, HOP, center=False,
                                   shift=14)  # [T, K] int64
    # one static [T, k0:k1] slice-sum per band: the bands partition a
    # contiguous bin range, so together these touch each needed column
    # ONCE — the previous per-band `where(mask, power, 0).sum(axis=1)`
    # read the ENTIRE 38 MB int64 row 33 times (~1.25 GB of HBM
    # traffic, the dominant cost of the 60 s clip). Identical int64
    # sums: the mask selected exactly these columns.
    t_dim = power.shape[0]
    e = jnp.stack(
        [
            (power[:, k0:k1].sum(axis=1) if k1 > k0
             else jnp.zeros(t_dim, power.dtype))
            for (k0, k1) in band_ranges(fmin, fmax)
        ],
        axis=1,
    )  # [T, 33] int64 (exact: <= 2^51 * K < 2^62)
    d = e[:, :-1] - e[:, 1:]  # [T, 32] band differentials
    dd = d[1:] - d[:-1]  # [T-1, 32] time differential
    bits = (dd > 0).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
    return jnp.sum(bits * weights, axis=1, dtype=jnp.uint32)


def fingerprint_frames(samples: np.ndarray, sr: int, cfg: HaitsmaConfig) -> np.ndarray:
    """Resample to 5 kHz and compute the u32 frame sequence."""
    from jax import enable_x64

    x = dsp.resample_linear(np.asarray(samples, np.float32), sr, HAITSMA_SR)
    if len(x) < FRAME + HOP:
        return np.zeros(0, np.uint32)
    with enable_x64():
        # ship the 14-bit quantized form (i16, half the transfer bytes;
        # value-identical — dsp.quantize_samples_i16)
        return np.asarray(haitsma_words(
            jnp.asarray(dsp.quantize_samples_i16(x)), cfg.fmin, cfg.fmax,
            cfg.fft))


def fingerprint_frames_batch(stack_5k: np.ndarray,
                             cfg: HaitsmaConfig) -> list[np.ndarray]:
    """Batched fingerprint_frames over ALREADY-5 kHz equal-length clips
    ([B, T] f32): one vmapped device dispatch for the group. Each row
    is bit-identical to the single-clip path (integer pipeline; pinned
    in tests/test_audio_batch.py). Short clips (T < FRAME + HOP) yield
    empty frame arrays like the single path, with no device call."""
    import jax

    from jax import enable_x64

    b, t = stack_5k.shape
    if t < FRAME + HOP:
        return [np.zeros(0, np.uint32) for _ in range(b)]
    with enable_x64():
        words = np.asarray(jax.vmap(
            lambda x: haitsma_words(x, cfg.fmin, cfg.fmax, cfg.fft)
        )(jnp.asarray(dsp.quantize_samples_i16(stack_5k))))
    return [words[i] for i in range(b)]


def _next_pow2(n: int) -> int:
    c = 64
    while c < n:
        c *= 2
    return c


@jax.jit
def _min_ber_bucketed(
    db_pad: jax.Array,  # [Tb] uint32 (zero padded)
    q_pad: jax.Array,  # [Qb] uint32 (zero padded)
    t_true: jax.Array,  # scalar int32
    q_true: jax.Array,  # scalar int32
):
    """Best bit-error-rate of the query block across all alignments.

    The classic Philips lookup (REPORT.md:913-944 describes the frame
    stream; matching slides the query block over the stored stream and
    takes the minimum BER). Both streams are padded to power-of-two
    buckets with validity carried as traced scalars, so XLA compiles one
    variant per (Tb, Qb) bucket pair instead of one per exact length —
    a catalog of arbitrary-duration tracks stays at O(log^2) compiles.
    """
    tb = db_pad.shape[0]
    qb = q_pad.shape[0]
    n_off_max = tb - qb + 1
    idx = jnp.arange(n_off_max)[:, None] + jnp.arange(qb)[None, :]
    windows = db_pad[idx]  # [n_off_max, Qb]
    x = jnp.bitwise_xor(windows, q_pad[None, :])
    colmask = (jnp.arange(qb) < q_true)[None, :]
    errs = jnp.sum(
        jax.lax.population_count(x).astype(jnp.int32) * colmask, axis=1
    )
    ber = errs.astype(jnp.float32) / (32.0 * q_true.astype(jnp.float32))
    valid_off = jnp.arange(n_off_max) < (t_true - q_true + 1)
    ber = jnp.where(valid_off, ber, jnp.inf)
    best = jnp.argmin(ber)
    return ber[best], best.astype(jnp.int32)


@jax.jit
def min_ber_batch(
    db_pad: jax.Array,  # [R, Tb] uint32, zero padded rows
    t_true: jax.Array,  # [R] int32 true stream lengths (0 = dead row)
    q_pad: jax.Array,  # [Qb] uint32 zero padded
    q_true: jax.Array,  # scalar int32
):
    """Batched Philips lookup: ONE device dispatch scores the query block
    against every stored stream (the per-record kernel-dispatch loop was
    O(catalog) launches per query — VERDICT weak #3). A fori_loop slides
    the block over all offsets, so the live intermediate is [R, Qb] per
    step, never [R, offsets, Qb]. Rows whose stream is shorter than the
    query (including zero-length padding rows) come back as (inf, -1).
    Returns (ber [R] f32, offset [R] int32).

    Under a row-sharded db_pad (NamedSharding P('d', None)) the body is
    purely row-parallel, so GSPMD partitions the whole loop across the
    mesh with no collectives until the host gather."""
    r, tb = db_pad.shape
    qb = q_pad.shape[0]
    n_off = tb - qb + 1
    colmask = (jnp.arange(qb) < q_true)[None, :]
    denom = 32.0 * jnp.maximum(q_true, 1).astype(jnp.float32)
    max_off = t_true - q_true  # [R]; negative = query longer than stream

    def body(o, carry):
        best_ber, best_off = carry
        win = jax.lax.dynamic_slice_in_dim(db_pad, o, qb, axis=1)  # [R, Qb]
        x = jnp.bitwise_xor(win, q_pad[None, :])
        errs = jnp.sum(
            jax.lax.population_count(x).astype(jnp.int32) * colmask, axis=1
        )
        ber = errs.astype(jnp.float32) / denom
        ber = jnp.where(o <= max_off, ber, jnp.inf)
        better = ber < best_ber  # strict: first minimal offset wins
        return (
            jnp.where(better, ber, best_ber),
            jnp.where(better, jnp.int32(o), best_off),
        )

    init = (
        jnp.full((r,), jnp.inf, jnp.float32),
        jnp.full((r,), -1, jnp.int32),
    )
    return jax.lax.fori_loop(0, n_off, body, init)


def min_ber(db_frames: np.ndarray, q_frames: np.ndarray) -> tuple[float, int]:
    """Host wrapper; returns (1.0, -1) when the query is longer than the
    stored stream."""
    t, q = len(db_frames), len(q_frames)
    if q == 0 or t < q:
        return 1.0, -1
    tb, qb = _next_pow2(t), _next_pow2(q)
    tb = max(tb, qb)
    db_pad = np.zeros(tb, np.uint32)
    db_pad[:t] = db_frames
    q_pad = np.zeros(qb, np.uint32)
    q_pad[:q] = q_frames
    b, off = _min_ber_bucketed(
        jnp.asarray(db_pad), jnp.asarray(q_pad),
        jnp.int32(t), jnp.int32(q),
    )
    return float(b), int(off)
