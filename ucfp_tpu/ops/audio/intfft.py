"""Integer Cooley-Tukey FFT power spectrogram — "ucfp-int-fft-v1".

The flagged alternative to dsp.stft_power_int's dense matmul-DFT for the
Haitsma path (VERDICT r04 #9; reference consumes an f32 FFT via audiofp,
src/modality/audio.rs:181-224 — its internals are a library call, so
EITHER integer spec is a ucfp-defined exactness contract, not reference
parity). The dense 2048-point DFT costs ~16.8M int8 MACs/frame; this
two-stage factorization costs ~2.6M (6.5x fewer):

    N = N1 * N2,  N1 = 64 (fixed),  N2 = N/64   (2048 -> N2 = 32)
    n = N2*p + q,  k = N1*s + r
    X[k] = sum_q W_N2^{qs} * [ sum_p x[N2 p + q] * W_N1^{pr} W_N^{qr} ]

  stage 1:  C[t,q,r]  = sum_p xw[t, N2 p + q] * A_q[r,p]
            where A_q[r,p] = W_N1^{pr} * W_N^{qr} is the TWIDDLE-FOLDED
            stage-1 basis — a [N2]-batched matmul, quantized ONCE (the
            classic separate twiddle pass costs an extra truncation AND
            ~1.3 ms of int32 elementwise on a 60 s clip; folding it into
            the basis removes both)
  stage 2:  D[t,r,s]  = sum_q C[t,q,r] * F_N2[q,s], with the complex
            multiply PACKED into one real matmul: U = [C_re | C_im]
            (contraction 2*N2 = 64) against B2 = [[c2, -s2],[s2, c2]]
            — K=32 int8 matmuls measured ~0.4 TMAC/s on a v5e MXU
            vs ~2.6 at K=64; packing re/im doubles K and halves the
            dot count
  output:   X[t, N1 s + r] = D[t,r,s];  power = re^2 + im^2

Exactness spec (every op below is integer; CPU and TPU agree to the
bit, the same contract as stft_power_int — pinned against a plain-int64
numpy mirror in tests/test_intfft.py):

  window    wq = round(hann_periodic(N) * 16383)                 15-bit
  frames    xw = (frame(x_q) * wq) >> 14            |xw| <= 16383 (14b)
  exponent  m = max|xw| over the CLIP; amp_bits = bit_length(m);
            s1 = max(14, amp_bits + 6)   -- a per-clip block exponent:
            full-scale clips get the worst-case s1 = 20, quiet clips
            keep up to 6 more bits of precision. Uniform over the clip,
            so band-energy SIGN comparisons (all Haitsma consumes) are
            scale-invariant. Computed by exact integer compares (no
            float log2 -> no cross-backend flip risk).
  bases     A_q (re/im) and B2 entries quantized round(value * 16383)
            (round = numpy half-to-even, baked host-side)
  stage 1   int8-limb dots (|acc| <= 64*128^2 = 2^20 < 2^31) recombined
            exactly, then  C = full >> s1,
            |C| <= floor(64*16383^2 / 2^14) = 16380
  stage 2   one packed limb matmul per frame block,
            D = (C_re @ c2 +- C_im @ s2) >> 14
            (sum first, ONE truncation; |acc| <= 64*16380*16383 < 2^34
            recombined via the combine32 identity),  |D| < 2^20
  power     re^2 + im^2 in int64  (<= 2^41)

All shifts are arithmetic (floor); the >>14 limb recombines use the
combine32 identity documented at dsp.stft_power_int. Scale is arbitrary
by a per-clip power of two — Haitsma's double-differential thresholds
compare values within one clip only, so words are invariant to it.

Why this is a FLAG, not the default (BASELINE.md "Haitsma integer FFT"
has the measured decomposition): (a) the staged truncations keep ~14
bits of magnitude per stage vs the DFT's single end truncation
(~25-bit re/im), so near-tie band-energy signs can flip — a DIFFERENT
fingerprint, cross-matching the DFT words only approximately (measured
bit agreement in tests); (b) on the TPU the MAC saving does NOT pay:
the dense [T,2048]x[2048,4100] int8 dot runs near MXU speed while the
staged K=64 dots measure ~20x lower MAC throughput, and the extra
elementwise recombines/transposes are pure overhead — the dense DFT is
the faster TPU program (measured; see BASELINE.md). Kept as the honest
answer to "would an integer FFT cut deeper?": no, not on this
hardware. Enable with HaitsmaConfig(fft=True) / `haitsma_fft=1`; the
config_hash gains spectrogram="ucfp-int-fft-v1" so mixed catalogs
cannot collide.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import dsp

N1 = 64  # fixed radix of stage 1 (bounds below assume it)
Q = 16383  # basis quantization (matches dsp.BASIS_Q)


@functools.lru_cache(maxsize=None)
def _window_q(n_fft: int) -> np.ndarray:
    return np.round(
        dsp.hann_periodic(n_fft).astype(np.float64) * Q
    ).astype(np.int32)


def _limbs(b: np.ndarray) -> list[np.ndarray]:
    """int matrix (|b| <= 16383) -> [high, low] int8 limbs, b = 128*h + l,
    l in [0, 127] (the dsp.dft_basis_int_limbs split)."""
    h = np.floor_divide(b, 128)
    l = b - 128 * h
    assert h.min() >= -128 and h.max() <= 127
    return [h.astype(np.int8), l.astype(np.int8)]


def _stage1_angles(n_fft: int) -> np.ndarray:
    """[N2, N1(r), N1(p)] f64 angles of A_q[r,p] = W_N1^{pr} W_N^{qr}."""
    n2 = n_fft // N1
    r = np.arange(N1, dtype=np.float64)
    p = np.arange(N1, dtype=np.float64)
    q = np.arange(n2, dtype=np.float64)
    return (2.0 * math.pi / N1) * np.einsum("r,p->rp", r, p)[None] + (
        2.0 * math.pi / n_fft) * np.einsum("q,r->qr", q, r)[:, :, None]


@functools.lru_cache(maxsize=None)
def _stage1_basis(n_fft: int) -> np.ndarray:
    """[N2, N1(p), 4*2*N1] int8 batched twiddle-folded basis:
    per q, [Ch | Cl | Sh | Sl] columns over r, transposed to contract p;
    C = round(cos * Q), S = round(-sin * Q)."""
    ang = _stage1_angles(n_fft)
    c = np.round(np.cos(ang) * Q).astype(np.int64)
    s = np.round(-np.sin(ang) * Q).astype(np.int64)
    ch, cl = _limbs(c)  # each [N2, r, p]
    sh, sl = _limbs(s)
    # [high limbs of [C|S] | low limbs of [C|S]] — the layout
    # _limb_matmul14 slices with k = 2*N1
    return np.concatenate(
        [b.transpose(0, 2, 1) for b in (ch, sh, cl, sl)],
        axis=2)  # [N2, p, 4*N1]


@functools.lru_cache(maxsize=None)
def _stage2_basis(n_fft: int) -> np.ndarray:
    """[2*N2, 2*2*N2] int8: limbs of B2 = [[c2, -s2], [s2, c2]] where
    c2/s2 = round(cos/sin(2 pi q s / N2) * Q) — U @ B2 = [D_re | D_im]."""
    n2 = n_fft // N1
    qs = np.outer(np.arange(n2, dtype=np.float64), np.arange(n2))
    ang = 2.0 * math.pi * qs / n2
    c2 = np.round(np.cos(ang) * Q).astype(np.int64)
    s2 = np.round(np.sin(ang) * Q).astype(np.int64)
    b2 = np.block([[c2, -s2], [s2, c2]])  # [2*N2, 2*N2]
    return np.concatenate(_limbs(b2), axis=1)  # [2*N2, 4*N2]


def _split_i8(v):
    """Traced int32 (|v| <= 16383) -> (high, low) int8 limbs."""
    h = jnp.floor_divide(v, 128)
    return h.astype(jnp.int8), (v - 128 * h).astype(jnp.int8)


def _combine14(hh, mid, ll):
    """Exact floor(full / 2^14) of full = hh*2^14 + mid*2^7 + ll in int32
    (the dsp.stft_power_int combine32 identity; ll >= 0 required)."""
    return hh + ((mid + (ll >> 7)) >> 7)


def _limb_matmul14(v, basis_hl, k, batched=False):
    """Exact (v @ B) >> 14 for B given as side-by-side limbs [.., Bh|Bl]
    ([n, 2k]); v traced int32. batched=True contracts the LAST axis of a
    [G, m, n] v against a [G, n, 2k] basis (dot_general batch dims)."""
    vh, vl = _split_i8(v)
    if batched:
        dims = (((2,), (1,)), ((0,), (0,)))
    else:
        dims = (((1,), (0,)), ((), ()))
    hq = jax.lax.dot_general(vh, basis_hl, dims,
                             preferred_element_type=jnp.int32)
    lq = jax.lax.dot_general(vl, basis_hl, dims,
                             preferred_element_type=jnp.int32)
    return _combine14(hq[..., :k], hq[..., k:] + lq[..., :k], lq[..., k:])


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def stft_power_int_fft(
    samples: jax.Array, n_fft: int = 2048, hop: int = 64,
    center: bool = False,
) -> jax.Array:
    """ucfp-int-fft-v1 power spectrogram [T, K] int64 (K = n_fft//2+1).

    Accepts pre-quantized i16 (dsp.quantize_samples_i16) or f32 samples,
    exactly like stft_power_int. Requires n_fft % 64 == 0 and
    n_fft//64 <= 128 (limb accumulator bounds)."""
    n2 = n_fft // N1
    assert n_fft % N1 == 0 and 1 < n2 <= 128, n_fft
    if jnp.issubdtype(samples.dtype, jnp.integer):
        xq = samples.astype(jnp.int32)
    else:
        xq = jnp.round(
            jnp.clip(jnp.nan_to_num(samples.astype(jnp.float32)), -1.0, 1.0)
            * dsp.SAMPLE_Q
        ).astype(jnp.int32)
    if center:
        pad = n_fft // 2
        xq = jnp.pad(xq, (pad, pad), mode="reflect")
    t = (xq.shape[0] - n_fft) // hop + 1
    frames = dsp._frame_rows(xq, n_fft, hop, t)  # [T, n_fft] int32
    xw = (frames * jnp.asarray(_window_q(n_fft))[None, :]) >> 14

    # per-clip block exponent: s1 = max(14, bit_length(max|xw|) + 6),
    # bit_length by exact integer compares (see module doc)
    m = jnp.max(jnp.abs(xw))
    amp_bits = jnp.sum(
        (m >= (jnp.int32(1) << jnp.arange(15, dtype=jnp.int32)))
        .astype(jnp.int32)
    )
    s1 = jnp.maximum(jnp.int32(14), amp_bits + 6)

    # stage 1 (+ folded twiddle): batched over q.
    # xw[t, N2 p + q] -> [q, t, p] to contract p against A_q.
    xt = xw.reshape(t, N1, n2).transpose(2, 0, 1)  # [N2, T, N1]
    basis1 = jnp.asarray(_stage1_basis(n_fft))  # [N2, N1, 4*N1]
    cq = _limb_matmul14(xt, basis1, 2 * N1, batched=True)  # [N2, T, 2*N1]
    c_re = cq[..., :N1] >> (s1 - 14)  # floor(full / 2^s1); |C| <= 16380
    c_im = cq[..., N1:] >> (s1 - 14)

    # stage 2: batched over r (a [T*N1, 64] tall-thin dot measured ~7x
    # slower than the same MACs as an r-batched [N1, T, 64] dot — the
    # int8 minor-dim-64 relayout), packed contraction [C_re | C_im]
    # over 2*N2.
    v = jnp.concatenate(
        [c_re.transpose(2, 1, 0), c_im.transpose(2, 1, 0)], axis=2
    )  # [N1(r), T, 2*N2]
    basis2 = jnp.broadcast_to(
        jnp.asarray(_stage2_basis(n_fft))[None],
        (N1, 2 * n2, 4 * n2))
    d = _limb_matmul14(v, basis2, 2 * n2, batched=True)  # [N1, T, 2*N2]
    d_re, d_im = d[..., :n2], d[..., n2:]

    # D[r, t, s] -> X[t, N1 s + r]; keep bins [0, K)
    k = n_fft // 2 + 1
    d_re = d_re.transpose(1, 2, 0).reshape(t, n_fft)[:, :k]
    d_im = d_im.transpose(1, 2, 0).reshape(t, n_fft)[:, :k]
    re64 = d_re.astype(jnp.int64)
    im64 = d_im.astype(jnp.int64)
    return re64 * re64 + im64 * im64


def stft_power_int_fft_mirror(samples: np.ndarray, n_fft: int = 2048,
                              hop: int = 64, center: bool = False
                              ) -> np.ndarray:
    """Plain-int64 numpy rendering of the EXACT same spec — no limb
    splitting, no MXU. tests/test_intfft.py pins the jitted path to this
    bit for bit; divergence means the limb algebra (not the spec) broke."""
    n2 = n_fft // N1
    x = np.asarray(samples)
    if np.issubdtype(x.dtype, np.integer):
        xq = x.astype(np.int64)
    else:
        xq = np.round(
            np.clip(np.nan_to_num(x.astype(np.float32)), -1.0, 1.0)
            * dsp.SAMPLE_Q
        ).astype(np.int64)
    if center:
        pad = n_fft // 2
        xq = np.pad(xq, (pad, pad), mode="reflect")
    t = (len(xq) - n_fft) // hop + 1
    idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
    xw = (xq[idx] * _window_q(n_fft)[None, :].astype(np.int64)) >> 14

    m = int(np.max(np.abs(xw))) if xw.size else 0
    s1 = max(14, m.bit_length() + 6)

    ang = _stage1_angles(n_fft)
    a_re = np.round(np.cos(ang) * Q).astype(np.int64)  # [N2, r, p]
    a_im = np.round(-np.sin(ang) * Q).astype(np.int64)
    xmat = xw.reshape(t, N1, n2)  # [t, p, q]
    c_re = np.einsum("tpq,qrp->tqr", xmat, a_re) >> s1
    c_im = np.einsum("tpq,qrp->tqr", xmat, a_im) >> s1

    qs = np.outer(np.arange(n2, dtype=np.float64), np.arange(n2))
    c2 = np.round(np.cos(2.0 * math.pi * qs / n2) * Q).astype(np.int64)
    s2 = np.round(np.sin(2.0 * math.pi * qs / n2) * Q).astype(np.int64)
    d_re = (np.einsum("tqr,qs->trs", c_re, c2)
            + np.einsum("tqr,qs->trs", c_im, s2)) >> 14
    d_im = (np.einsum("tqr,qs->trs", c_im, c2)
            - np.einsum("tqr,qs->trs", c_re, s2)) >> 14

    k = n_fft // 2 + 1
    d_re = d_re.transpose(0, 2, 1).reshape(t, n_fft)[:, :k]
    d_im = d_im.transpose(0, 2, 1).reshape(t, n_fft)[:, :k]
    return d_re * d_re + d_im * d_im
