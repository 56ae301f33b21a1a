"""Core audio DSP on device: framing, matmul-DFT STFT, mel bank, resample.

Rebuilds the audiofp::dsp surface the reference consumes
(src/modality/audio.rs:621-699): ShortTimeFFT (n_fft 1024 / hop 256 /
Hann / centered), Slaney MelFilterBank, linear resampler.

TPU-first choice: the DFT is two fixed f32 matmuls (cos/sin bases) at
HIGHEST precision rather than an FFT — ~40x the FLOPs but it rides the
MXU, has no cross-backend butterfly-ordering drift, and at fingerprint
scale (a 1-hour clip is ~236 GFLOP) is milliseconds on a v5e. Framing is
one gather; the whole spectrogram pipeline jits into a single fusion.

Canonical spec (documented; audiofp's internals are not vendored in the
reference):
  * window  = periodic Hann: 0.5 * (1 - cos(2*pi*n / N))
  * centered STFT reflect-pads N/2 both sides
  * magnitude^2 = re^2 + im^2 from the matmul-DFT
  * linear resample: out[i] = lerp(in, i * sr_in / sr_out), f64 positions
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def hann_periodic(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * math.pi * i / n))).astype(np.float32)


@functools.lru_cache(maxsize=None)
def dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT bases: cos[n_fft, K], -sin[n_fft, K] with K = n_fft//2 + 1."""
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    n = np.arange(n_fft, dtype=np.float64)
    ang = 2.0 * math.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def num_frames(n_samples: int, n_fft: int, hop: int, center: bool) -> int:
    if center:
        return n_samples // hop + 1
    return max(0, (n_samples - n_fft) // hop + 1)


def _frame_rows(x: jax.Array, n_fft: int, hop: int, t: int) -> jax.Array:
    """[T, n_fft] frame matrix, frames[i] = x[i*hop : i*hop + n_fft].

    When hop divides n_fft (every fingerprint config: 1024/256 Wang,
    2048/64 Haitsma), built from n_fft//hop shifted [T, hop] reshapes
    concatenated along axis 1 — pure slicing/data movement. The gather
    formulation (`x[arange(t)[:, None]*hop + arange(n_fft)]`) pays the
    ~10 ns/element TPU gather constant — ~13 ms for the 60 s Wang
    spectrogram's 1.9M-element index, vs ~0.1 ms for the DFT matmuls it
    feeds — and is kept only for hop-indivisible configs. Values are
    identical either way (bit-exact contract)."""
    if n_fft % hop == 0 and t > 0:
        r = n_fft // hop
        segs = [x[j * hop : (j + t) * hop].reshape(t, hop) for j in range(r)]
        return jnp.concatenate(segs, axis=1)
    idx = jnp.arange(t)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return x[idx]


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def stft_power(
    samples: jax.Array, n_fft: int = 1024, hop: int = 256, center: bool = True
) -> jax.Array:
    """Power spectrogram [T, K] from mono f32 samples (matmul-DFT)."""
    x = samples.astype(jnp.float32)
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, (pad, pad), mode="reflect")
    t = (x.shape[0] - n_fft) // hop + 1
    frames = _frame_rows(x, n_fft, hop, t) * jnp.asarray(hann_periodic(n_fft))[None, :]
    c, s = dft_matrices(n_fft)
    kwargs = dict(
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    re = jnp.dot(frames, jnp.asarray(c), **kwargs)
    im = jnp.dot(frames, jnp.asarray(s), **kwargs)
    return re * re + im * im


def stft_magnitude(samples, n_fft: int = 1024, hop: int = 256, center: bool = True):
    return jnp.sqrt(stft_power(samples, n_fft, hop, center))


# ---------------------------------------------------------------------------
# Integer (bit-exact) STFT — the fingerprint-path spectrogram
# ---------------------------------------------------------------------------
#
# The f32 matmul-DFT drifts across backends (MXU vs CPU accumulation
# order), which flipped ~19% of Wang hashes at spectral plateaus
# (PARITY.md round 1). This path makes the whole spectrogram exact
# integer arithmetic, the same recipe that made the image hashes
# bit-identical:
#   1. samples quantize to 14-bit ints (x_q = round(clip(x,-1,1)*16383))
#   2. the window-combined DFT basis quantizes to 15-bit ints
#   3. both split into two 7/8-bit limbs; FOUR int8xint8->int32 MXU
#      matmuls are exact (|partial dot| <= n_fft*128^2 <= 2^26 < 2^31)
#   4. limbs recombine in int64; re/im truncate to 24-ish bits
#      (canonical >>14 — the quantization IS the spec)
#   5. power = re*re + im*im in int64 — no float op anywhere, so CPU
#      and TPU agree to the bit; every downstream comparison (peak
#      picking, dB floors, Haitsma band-energy signs) is deterministic.
# Absolute scale is arbitrary (relative thresholds only).

SAMPLE_Q = 16383  # 14-bit sample quantization
BASIS_Q = 16383  # 15-bit (signed) basis quantization


@functools.lru_cache(maxsize=None)
def dft_basis_int_limbs(n_fft: int):
    """Window-combined quantized DFT bases split into int8 limbs.

    Returns (ch, cl, sh, sl), each [n_fft, K] int8 with
    B_q = 128*bh + bl, bl in [0, 127]."""
    c, s = dft_matrices(n_fft)  # f32 from f64 angles
    w = hann_periodic(n_fft).astype(np.float64)[:, None]
    out = []
    for b in (c.astype(np.float64) * w, s.astype(np.float64) * w):
        bq = np.round(b * BASIS_Q).astype(np.int32)
        bh = np.floor_divide(bq, 128)
        bl = bq - 128 * bh
        assert bh.min() >= -128 and bh.max() <= 127
        out.append((bh.astype(np.int8), bl.astype(np.int8)))
    (ch, cl), (sh, sl) = out
    return ch, cl, sh, sl


@functools.lru_cache(maxsize=None)
def dft_basis_int_combined(n_fft: int):
    """[n_fft, 4K] int8: the four limb bases side by side
    ([ch | cl | sh | sl]) so the spectrogram runs TWO MXU dots (one per
    frame limb) instead of eight — each frame-limb matrix is read once,
    and the wider N dimension tiles the MXU better than four separate
    [.., K=n_fft/2+1] outputs (K is odd: 1025 at n_fft 2048).
    Bit-exact: integer dot columns accumulate independently, so
    concatenating RHS columns changes nothing per column."""
    return np.concatenate(dft_basis_int_limbs(n_fft), axis=1)


def quantize_samples_i16(x: np.ndarray) -> np.ndarray:
    """Host-side copy of stft_power_int's sample quantization — the
    SMALLEST exact device representation for the fingerprint path
    (14-bit values in an i16, HALF the f32 transfer bytes; the same
    ship-the-smallest-exact-form move as the host image resize).

    np.round and jnp.round are both round-half-to-even and the
    clip/scale are elementwise IEEE f32 ops, so shipping pre-quantized
    samples is byte-identical to quantizing on device (fuzz-pinned in
    tests/test_audio_i16_ship.py incl. half-to-even boundary products;
    on-chip identity rides the bench parity gate)."""
    x = np.asarray(x)
    if x.dtype == np.int16:
        # s16-wire fast path: the i16 IS the sample at full scale
        # (wire contract: value = i / 32768). One fused multiply+round
        # replaces decode -> nan_to_num -> clip -> round: clip is a
        # no-op (|i/32768| <= 1.0 for every int16), NaN is impossible,
        # and rounding is identical — i * 2^-15 is EXACT in f32 (power
        # of two scale) and SAMPLE_Q/32768 is exactly representable
        # (14-bit numerator), so both orderings round the same exact
        # real product i * SAMPLE_Q * 2^-15 exactly once. Bit-equality
        # vs decode-then-quantize is fuzz-pinned over the full int16
        # range in tests/test_audio_i16_ship.py.
        return np.round(
            x.astype(np.float32) * np.float32(SAMPLE_Q / 32768.0)
        ).astype(np.int16)
    # nan_to_num first: a NaN in a wire body would otherwise ride
    # through clip/round into an undefined int cast (host RuntimeWarning
    # + platform-defined value). NaN->0, +/-inf -> clipped to +/-1 —
    # mirrored in stft_power_int's float branch so both quantizers stay
    # value-identical on every input, degenerate ones included.
    xf = np.clip(np.nan_to_num(np.asarray(x, np.float32)), -1.0, 1.0)
    return np.round(xf * np.float32(SAMPLE_Q)).astype(np.int16)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def stft_power_int(
    samples: jax.Array, n_fft: int = 1024, hop: int = 256, center: bool = True,
    shift: int = 8,
) -> jax.Array:
    """Bit-exact integer power spectrogram [T, K] int64.

    `shift` is the canonical re/im truncation: |re| <= 2^(38-shift) for
    n_fft=1024, and power = re^2+im^2 must stay under 2^62, so shift=8
    is the floor at n_fft 1024 (finest resolution -> fewest exact-tie
    plateaus in peak picking); Haitsma's 2048-point frames pass 14 (its
    band-energy sums add ~10 bits and only signs matter there).

    Integer input (i16 from quantize_samples_i16) is consumed as the
    already-quantized xq; float input quantizes here. Both forms are
    value-identical — the i16 form halves the HBM/tunnel transfer."""
    if jnp.issubdtype(samples.dtype, jnp.integer):
        xq = samples.astype(jnp.int32)
    else:
        xq = jnp.round(
            jnp.clip(jnp.nan_to_num(samples.astype(jnp.float32)), -1.0, 1.0)
            * SAMPLE_Q
        ).astype(jnp.int32)
    if center:
        pad = n_fft // 2
        xq = jnp.pad(xq, (pad, pad), mode="reflect")
    t = (xq.shape[0] - n_fft) // hop + 1
    frames = _frame_rows(xq, n_fft, hop, t)  # [T, n_fft] int32
    fh = jnp.floor_divide(frames, 128).astype(jnp.int8)
    fl = (frames - 128 * jnp.floor_divide(frames, 128)).astype(jnp.int8)
    k = n_fft // 2 + 1
    bcomb = jnp.asarray(dft_basis_int_combined(n_fft))  # [n_fft, 4K]

    def i8dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    # TWO dots instead of eight (see dft_basis_int_combined); slices of
    # the [T, 4K] outputs are the eight per-limb dot results, bit-exact
    hq = i8dot(fh, bcomb)  # [fh@ch | fh@cl | fh@sh | fh@sl]
    lq = i8dot(fl, bcomb)  # [fl@ch | fl@cl | fl@sh | fl@sl]
    # re limbs: hh = fh@ch, mid = fh@cl + fl@ch, ll = fl@cl
    re_hh, re_mid, re_ll = (
        hq[:, :k], hq[:, k : 2 * k] + lq[:, :k], lq[:, k : 2 * k]
    )
    # im limbs: hh = fh@sh, mid = fh@sl + fl@sh, ll = fl@sl
    im_hh, im_mid, im_ll = (
        hq[:, 2 * k : 3 * k],
        hq[:, 3 * k :] + lq[:, 2 * k : 3 * k],
        lq[:, 3 * k :],
    )

    if shift >= 14:
        # int32-exact recombine (the Haitsma path; int64 elementwise ops
        # lower to multi-op i32 sequences on TPU): with r = mid*2^7 + ll
        # and ll >= 0 (both low limbs are in [0, 127]), the floor-shift
        # identity
        #   full >> 14 == hh + ((mid + (ll >> 7)) >> 7)
        # holds exactly for ANY sign of hh/mid (remainder bound:
        # (A & 127)*2^7 + (ll & 127) < 2^14), and arithmetic shifts
        # compose, so full >> s = (full >> 14) >> (s - 14) for s >= 14.
        # Ranges fit int32 for any n_fft the int32 i8dot accumulator
        # already requires (n_fft < 2^16): |hh| <= n_fft*128^2,
        # |mid| <= 2*n_fft*128^2, ll >> 7 <= n_fft*128^2 / 2^7. Only
        # the final squares widen to int64. Bit-identical to the
        # generic path (pinned in test_audio.py).
        def combine32(hh, mid, ll):
            return (hh + ((mid + (ll >> 7)) >> 7)) >> (shift - 14)

        re = combine32(re_hh, re_mid, re_ll).astype(jnp.int64)
        im = combine32(im_hh, im_mid, im_ll).astype(jnp.int64)
        return re * re + im * im

    def combine(hh, mid, ll):
        full = (
            (hh.astype(jnp.int64) << 14)
            + (mid.astype(jnp.int64) << 7)
            + ll.astype(jnp.int64)
        )
        return full >> shift  # canonical truncation (see docstring)

    re = combine(re_hh, re_mid, re_ll)
    im = combine(im_hh, im_mid, im_ll)
    return re * re + im * im  # int64; <= 2^61 at n_fft 1024 / shift 8


# ---------------------------------------------------------------------------
# Slaney mel filter bank
# ---------------------------------------------------------------------------


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3.0)
    log_region = f >= 1000.0
    mel = np.where(
        log_region,
        15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / (np.log(6.4) / 27.0),
        mel,
    )
    return mel


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * (200.0 / 3.0)
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
    return f


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    n_mels: int, n_fft: int, sr: int, fmin: float, fmax: float
) -> np.ndarray:
    """Slaney-style triangular mel bank [K, n_mels], area-normalized."""
    k = n_fft // 2 + 1
    fft_freqs = np.arange(k, dtype=np.float64) * sr / n_fft
    mels = np.linspace(
        _hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2
    )
    hz = _mel_to_hz_slaney(mels)
    bank = np.zeros((k, n_mels), dtype=np.float64)
    for m in range(n_mels):
        lo, ctr, hi = hz[m], hz[m + 1], hz[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-9)
        tri = np.maximum(0.0, np.minimum(up, down))
        bank[:, m] = tri * (2.0 / max(hi - lo, 1e-9))  # slaney norm
    return bank.astype(np.float32)


def mel_spectrogram(power: jax.Array, n_mels: int, n_fft: int, sr: int,
                    fmin: float = 0.0, fmax: float | None = None) -> jax.Array:
    fmax = fmax if fmax is not None else sr / 2
    bank = jnp.asarray(mel_filterbank(n_mels, n_fft, sr, float(fmin), float(fmax)))
    return jnp.dot(
        power, bank, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# ---------------------------------------------------------------------------
# Linear resample (host numpy: cheap, feeds the device pipeline)
# ---------------------------------------------------------------------------


def resample_linear(samples: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """audiofp::dsp::resample::linear equivalent (audio.rs:193-201)."""
    if sr_in == sr_out:
        return np.asarray(samples, np.float32)
    x = np.asarray(samples, np.float64)
    n_out = int(round(len(x) * sr_out / sr_in))
    if n_out <= 0:
        return np.zeros(0, np.float32)
    pos = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    i0 = np.minimum(pos.astype(np.int64), len(x) - 1)
    i1 = np.minimum(i0 + 1, len(x) - 1)
    frac = pos - i0
    return ((1.0 - frac) * x[i0] + frac * x[i1]).astype(np.float32)
