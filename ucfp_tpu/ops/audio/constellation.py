"""Peak constellation + Wang / Panako landmark hashing on device.

Rebuilds the audiofp classical pipeline the reference wraps
(src/modality/audio.rs:64-156) with the pairing rule the reference itself
re-derives for its inspector (audio.rs:965-1003): for each anchor peak,
scan forward in time within the target zone (0 < dt <= target_zone_t,
|df| <= target_zone_f) and take up to fan_out targets.

Canonical peak picker (documented; audiofp's PeakPicker internals are not
vendored):
  * a peak is a frequency-axis local max (strictly above f-1, >= f+1 —
    the left-strict tie break picks exactly one bin per frequency
    plateau) that is also >= its time neighbours at the same bin
    (time-inclusive: a stationary tone's ridge is exactly tied frame to
    frame and must survive). Diagonals are not consulted — they make
    selection unstable under small time shifts, which destroys landmark
    overlap between a clip and the same clip embedded in other audio.
  * magnitude floor: >= min_anchor_mag_db relative to the global max.
    Note the global-relative floor makes peak selection sensitive to the
    loudest event in the clip (a louder irrelevant passage shifts the
    floor for everything); per-slab local thresholds are the planned
    refinement.
  * per-second cap: the top `peaks_per_sec` peaks per slab of
    floor(sr / hop) frames, magnitude order, ties to the earlier (t, f)
Peaks order by (t, f) ascending — the order the pairing rule walks.

Device shape discipline: everything is fixed-size + validity-masked. The
pairing scans a W=256-successor window per anchor (documented cap; at the
default 30 peaks/sec a 2-second zone holds ~60 successors). Wang hash
wire layout (8 bytes LE per landmark):
  u32 hash = f1(10 bits) << 22 | f2(10 bits) << 12 | dt(12 bits)
  u32 t1   = anchor frame index
Panako triplet layout (8 bytes LE per triplet) builds pitch- AND
tempo-invariance the way the real Panako family does: frequencies map to
log-spaced bands (24/octave), where a uniform pitch shift is an ADDITIVE
offset — so band DIFFERENCES are invariant; a uniform tempo change
scales all time deltas — so the time RATIO is invariant:
  u32 hash = db12(8, offset 128) << 24 | db23(8, offset 128) << 16
             | tratio(4) << 12 | b1coarse(8 = semitone band >> 3) << 4
  u32 aux  = t1 frame index
  where db12 = sb(f2) - sb(f1), db23 = sb(f3) - sb(f2),
        tratio = round(15 * (t2 - t1) / (t3 - t1)),
        sb(f) = round(12 * log2(f_hz / 32.7)) (semitones above C1).
Quantization is deliberately coarse: peak times land on integer frames,
so a fine ratio would flip on ±1-frame jitter; semitone bands keep a 3%
pitch shift (~0.5 semitone) inside one rounding step most of the time.
b1coarse (8-semitone granularity) keeps some absolute-pitch selectivity
without breaking small-shift invariance.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import dsp

PAIR_WINDOW = 256  # successor-scan cap per anchor


@dataclass(frozen=True)
class WangConfig:
    """Defaults from the reference manifest (algorithms_manifest.rs:546-600).

    local_floor=True applies min_anchor_mag_db relative to each time
    slab's own maximum instead of the clip-global maximum — robust to a
    loud unrelated passage shifting the floor for the whole clip (off by
    default to keep the documented global-floor behavior)."""

    fan_out: int = 10
    target_zone_t: int = 63
    target_zone_f: int = 64
    peaks_per_sec: int = 30
    min_anchor_mag_db: float = -50.0
    local_floor: bool = False


@dataclass(frozen=True)
class PanakoConfig:
    """Defaults from the reference manifest (algorithms_manifest.rs:601-650)."""

    fan_out: int = 5
    target_zone_t: int = 96
    target_zone_f: int = 96
    peaks_per_sec: int = 30
    min_anchor_mag_db: float = -50.0


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def pick_peaks(
    power: jax.Array,  # [T, K] power spectrogram
    slab_frames: int,
    peaks_per_sec: int,
    min_mag_db: float,
    local_floor: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """-> (t [P], f [P], valid [P]) sorted by (t, f); P = n_slabs * cap."""
    t_dim, k_dim = power.shape
    neg = jnp.float32(-1.0)
    p = jnp.pad(power, ((1, 1), (1, 1)), constant_values=neg)

    def sh(dt, df):
        return p[1 + dt : 1 + dt + t_dim, 1 + df : 1 + df + k_dim]

    center = power
    is_max = (
        (center > sh(0, -1))
        & (center >= sh(0, 1))
        & (center >= sh(-1, 0))
        & (center >= sh(1, 0))
    )
    gmax = jnp.max(power)
    # magnitude threshold of m dB == power threshold of 10^(m/10):
    # 10*log10(power ratio) = 20*log10(mag ratio)
    rel = jnp.float32(10.0 ** (min_mag_db / 10.0))
    n_slabs = -(-t_dim // slab_frames)
    pad_t = n_slabs * slab_frames - t_dim
    if local_floor:
        # per-slab reference: each second's floor tracks its own max
        pmax = jnp.pad(power, ((0, pad_t), (0, 0)), constant_values=0.0)
        slab_max = jnp.max(
            pmax.reshape(n_slabs, slab_frames * k_dim), axis=1
        )  # [S]
        floor2d = jnp.repeat(slab_max * rel, slab_frames)[:t_dim][:, None]
        is_max = is_max & (center >= floor2d) & (gmax > 0.0)
    else:
        is_max = is_max & (center >= gmax * rel) & (gmax > 0.0)

    # per-slab top-k by magnitude
    mag = jnp.where(is_max, power, neg)
    mag = jnp.pad(mag, ((0, pad_t), (0, 0)), constant_values=neg)
    mag = mag.reshape(n_slabs, slab_frames * k_dim)
    top_mag, top_idx = jax.lax.top_k(mag, peaks_per_sec)  # [S, cap]
    t_local = top_idx // k_dim
    f_idx = top_idx % k_dim
    t_idx = t_local + jnp.arange(n_slabs, dtype=jnp.int32)[:, None] * slab_frames
    valid = (top_mag > 0.0).reshape(-1)
    t_flat = t_idx.reshape(-1).astype(jnp.int32)
    f_flat = f_idx.reshape(-1).astype(jnp.int32)
    # sort by (t, f); invalid entries to the end
    key = jnp.where(valid, t_flat * k_dim + f_flat, jnp.int32(0x7FFFFFF0))
    order = jnp.argsort(key)
    return t_flat[order], f_flat[order], valid[order]


def _successor_window(a: jax.Array, w: int) -> jax.Array:
    """[P, W] matrix whose column j-1 holds a[min(i+j, p-1)] — the
    forward-successor window — built from W static shifted slices of an
    edge-padded copy instead of a [P, W] gather. The gather form
    (`a[jnp.minimum(idx[:, None] + arange(1, w+1), p-1)]`) lowers to a
    ~P*W-element TPU gather at ~10 ns/element (the same gather constant
    that bounds the knn rescore pool) and measured ~3 ms per [1800, 256]
    operand at the 60 s Wang shape; the slice form is pure data
    movement. Values are identical by construction: slice j of the
    edge-padded vector is a[min(i+j, p-1)] exactly."""
    p = a.shape[0]
    ap = jnp.concatenate([a, jnp.broadcast_to(a[p - 1 :], (w,))])
    return jnp.stack([ap[j : j + p] for j in range(1, w + 1)], axis=1)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def wang_pairs(
    t: jax.Array, f: jax.Array, valid: jax.Array,
    fan_out: int, zone_t: int, zone_f: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pair anchors with forward-in-time targets (audio.rs:965-1003).

    Returns (hash u32 [P, W], t1 u32 [P, W], mask [P, W]) over the
    W-successor window; the host packs valid entries in (anchor, rank)
    order.
    """
    p = t.shape[0]
    w = min(PAIR_WINDOW, p - 1) if p > 1 else 1
    idx = jnp.arange(p, dtype=jnp.int32)
    succ = idx[:, None] + jnp.arange(1, w + 1, dtype=jnp.int32)[None, :]  # [P, W]
    in_range = succ < p
    t_s = _successor_window(t, w)
    f_s = _successor_window(f, w)
    v_s = _successor_window(valid, w)
    dt = t_s - t[:, None]
    df = jnp.abs(f_s - f[:, None])
    ok = (
        in_range
        & valid[:, None]
        & v_s
        & (dt > 0)
        & (dt <= zone_t)
        & (df <= zone_f)
    )
    # rank among valid targets per anchor, in time order; keep < fan_out
    rank = jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1
    ok = ok & (rank < fan_out)
    h = (
        (f[:, None].astype(jnp.uint32) << 22)
        | (f_s.astype(jnp.uint32) << 12)
        | dt.astype(jnp.uint32)
    )
    return h, jnp.broadcast_to(t[:, None].astype(jnp.uint32), h.shape), ok


PANAKO_BANDS_PER_OCTAVE = 12  # semitones
PANAKO_FREF_HZ = 32.7  # C1
_BAND_TABLE_BINS = 4096  # covers any n_fft <= 8190


@functools.lru_cache(maxsize=None)
def _band_table_np(bin_hz: float):
    """Semitone band of each STFT bin, precomputed on host in f64.
    Device log2 is a transcendental whose last-ulp differs between
    backends; round() at a band boundary would then flip hashes. A
    host table makes the bin->band map one gather — bit-identical."""
    hz = np.maximum(
        np.arange(_BAND_TABLE_BINS, dtype=np.float64) * bin_hz, 1.0
    )
    return np.round(
        PANAKO_BANDS_PER_OCTAVE * np.log2(hz / PANAKO_FREF_HZ)
    ).astype(np.int32)


def _log_band(f_bin: jax.Array, bin_hz: float) -> jax.Array:
    """Linear STFT bin -> semitone band above C1 (int32 table gather)."""
    return jnp.asarray(_band_table_np(bin_hz))[f_bin]


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def panako_triplets(
    t: jax.Array, f: jax.Array, valid: jax.Array,
    fan_out: int, zone_t: int, zone_f: int, bin_hz: float = 7.8125,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pitch/tempo-invariant triplets: anchor + every PAIR of its first
    fan_out+1 targets. Log-band differences cancel uniform pitch shifts;
    the quantized time ratio (t2-t1)/(t3-t1) survives +/-5% tempo shifts
    (manifest algorithms_manifest.rs:604).

    All C(fan_out+1, 2) target pairs are hashed, not just consecutive
    ones: consecutive-pair hashing collapses under peak insertion —
    one spurious peak between targets reindexes every later pair, so a
    3% resample (whose interpolation artifacts add peaks) destroyed
    nearly all hash overlap. With all pairs, surviving original peaks
    keep their mutual hashes regardless of insertions (Panako's
    published design pairs the full target zone for the same reason).
    """
    p = t.shape[0]
    w = min(PAIR_WINDOW, p - 1) if p > 1 else 1
    idx = jnp.arange(p, dtype=jnp.int32)
    succ = idx[:, None] + jnp.arange(1, w + 1, dtype=jnp.int32)[None, :]
    in_range = succ < p
    t_s = _successor_window(t, w)
    f_s = _successor_window(f, w)
    v_s = _successor_window(valid, w)
    dt = t_s - t[:, None]
    df = jnp.abs(f_s - f[:, None])
    ok = (
        in_range & valid[:, None] & v_s
        & (dt > 0) & (dt <= zone_t) & (df <= zone_f)
    )
    rank = jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1
    ok = ok & (rank < fan_out + 1)  # need fan_out consecutive pairs

    # select, per anchor, the first (fan_out+1) valid targets. The rank
    # cumsum already assigns each selected lane its output slot, so a
    # one-hot masked reduction does the selection with NO sort and NO
    # gather — the earlier top_k/argsort + take_along_axis formulation
    # measured 2.4 ms of the 2.6 ms clip at [1800, 256] (sort cost +
    # the TPU gather constant); the [P, W, S] masked sums are ~3M
    # multiply-adds. Slots beyond the valid-target count read 0 instead
    # of a clamped duplicate — pair_ok masks them, and the wire
    # contract packs h[pair_ok] only (pinned in test_audio.py against
    # the argsort reference).
    slots = jnp.arange(fan_out + 1, dtype=jnp.int32)
    sel = ok[:, :, None] & (rank[:, :, None] == slots[None, None, :])
    seli = sel.astype(jnp.int32)  # [P, W, S]
    gv = jnp.any(sel, axis=1)  # [P, S]
    t2 = jnp.sum(t_s[:, :, None] * seli, axis=1)  # [P, S]
    f2 = jnp.sum(f_s[:, :, None] * seli, axis=1)
    # band lookup ONCE per peak ([P]-sized table gather), then selected
    # through the same masked reduction — the previous per-pair lookups
    # were [P, 15] gathers
    lbf = _log_band(f, bin_hz)  # [P]
    lb_s = _successor_window(lbf, w)  # [P, W]
    lb2s = jnp.sum(lb_s[:, :, None] * seli, axis=1)  # [P, S]
    # all target pairs (i1 < i2) among the fan_out+1 selected targets
    i1, i2 = np.triu_indices(fan_out + 1, k=1)
    i1 = jnp.asarray(i1, jnp.int32)
    i2 = jnp.asarray(i2, jnp.int32)
    t2a, t3a = t2[:, i1], t2[:, i2]
    pair_ok = gv[:, i1] & gv[:, i2]
    denom = jnp.maximum(t3a - t[:, None], 1)
    # rounded (not floored) 4-bit ratio: +/-1-frame jitter on small dt
    # stays within one step far more often than an 8-bit ratio would
    ratio = jnp.clip(
        (15 * (t2a - t[:, None]) + denom // 2) // denom, 0, 15
    ).astype(jnp.uint32)
    lb1 = lbf[:, None]
    lb2 = lb2s[:, i1]
    lb3 = lb2s[:, i2]
    db12 = jnp.clip(lb2 - lb1 + 128, 0, 255).astype(jnp.uint32)
    db23 = jnp.clip(lb3 - lb2 + 128, 0, 255).astype(jnp.uint32)
    b1coarse = jnp.clip(lb1 >> 3, 0, 255).astype(jnp.uint32)
    h = (db12 << 24) | (db23 << 16) | (ratio << 12) | (b1coarse << 4)
    aux = jnp.broadcast_to(t[:, None].astype(jnp.uint32), h.shape)
    return h, aux, pair_ok


# ---------------------------------------------------------------------------
# Host assembly
# ---------------------------------------------------------------------------


def extract_landmarks(
    samples: np.ndarray,
    sr: int,
    cfg: WangConfig,
    n_fft: int = 1024,
    hop: int = 256,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (hashes u32 [L], t1 u32 [L]) in (anchor, rank) order."""
    from jax import enable_x64

    with enable_x64():
        # bit-exact integer spectrogram (int64 needs x64 tracing); one
        # deterministic convert to f32 feeds the unchanged selection code
        power = dsp.stft_power_int(
            jnp.asarray(dsp.quantize_samples_i16(samples)), n_fft, hop, True
        ).astype(jnp.float32)
    slab = max(1, sr // hop)
    t, f, valid = pick_peaks(
        power, slab, cfg.peaks_per_sec, cfg.min_anchor_mag_db,
        getattr(cfg, "local_floor", False),
    )
    h, t1, ok = wang_pairs(
        t, f, valid, cfg.fan_out, cfg.target_zone_t, cfg.target_zone_f
    )
    ok = np.asarray(ok)
    return np.asarray(h)[ok], np.asarray(t1)[ok]


def extract_panako(
    samples: np.ndarray,
    sr: int,
    cfg: PanakoConfig,
    n_fft: int = 1024,
    hop: int = 256,
) -> tuple[np.ndarray, np.ndarray]:
    from jax import enable_x64

    with enable_x64():
        # bit-exact integer spectrogram (int64 needs x64 tracing); one
        # deterministic convert to f32 feeds the unchanged selection code
        power = dsp.stft_power_int(
            jnp.asarray(dsp.quantize_samples_i16(samples)), n_fft, hop, True
        ).astype(jnp.float32)
    slab = max(1, sr // hop)
    t, f, valid = pick_peaks(
        power, slab, cfg.peaks_per_sec, cfg.min_anchor_mag_db,
        getattr(cfg, "local_floor", False),
    )
    h, aux, ok = panako_triplets(
        t, f, valid, cfg.fan_out, cfg.target_zone_t, cfg.target_zone_f
    )
    ok = np.asarray(ok)
    return np.asarray(h)[ok], np.asarray(aux)[ok]


def _extract_batch(stack, sr, cfg, pair_fn, n_fft, hop):
    """Shared batched pipeline: ONE device dispatch per stage for the
    whole clip group instead of per clip (the DP ingest seam, SURVEY
    §2.4). vmap applies the identical per-example math — the integer
    spectrogram stays exact and the f32 selection compares the same
    values — so each row is BIT-IDENTICAL to the single-clip path
    (pinned by tests/test_audio_batch.py). pair_fn is wang_pairs or
    panako_triplets; both singles share the same first two stages, so
    this is the ONE place the batched stage sequence lives."""
    from jax import enable_x64, vmap

    with enable_x64():
        power = vmap(
            lambda x: dsp.stft_power_int(x, n_fft, hop, True)
        )(jnp.asarray(dsp.quantize_samples_i16(stack))).astype(jnp.float32)
    slab = max(1, sr // hop)
    t, f, valid = vmap(
        lambda p: pick_peaks(
            p, slab, cfg.peaks_per_sec, cfg.min_anchor_mag_db,
            getattr(cfg, "local_floor", False),
        )
    )(power)
    h, aux, ok = vmap(
        lambda tt, ff, vv: pair_fn(
            tt, ff, vv, cfg.fan_out, cfg.target_zone_t, cfg.target_zone_f
        )
    )(t, f, valid)
    h, aux, ok = np.asarray(h), np.asarray(aux), np.asarray(ok)
    return [(h[b][ok[b]], aux[b][ok[b]]) for b in range(stack.shape[0])]


def extract_landmarks_batch(
    stack: np.ndarray,  # [B, T] f32 — equal-length clips
    sr: int,
    cfg: WangConfig,
    n_fft: int = 1024,
    hop: int = 256,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Batched extract_landmarks (see _extract_batch)."""
    return _extract_batch(stack, sr, cfg, wang_pairs, n_fft, hop)


def extract_panako_batch(
    stack: np.ndarray,
    sr: int,
    cfg: PanakoConfig,
    n_fft: int = 1024,
    hop: int = 256,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Batched extract_panako (see _extract_batch)."""
    return _extract_batch(stack, sr, cfg, panako_triplets, n_fft, hop)


def peaks_for_inspect(
    samples: np.ndarray, sr: int, cfg: WangConfig, n_fft: int = 1024, hop: int = 256
):
    """(t, f, mag_power) arrays of valid peaks, for the inspector."""
    t, f, mags, pw, _h, _t1 = peaks_and_landmarks(samples, sr, cfg, n_fft, hop)
    return t, f, mags, pw


def peaks_and_landmarks(
    samples: np.ndarray, sr: int, cfg: WangConfig,
    n_fft: int = 1024, hop: int = 256,
) -> tuple:
    """One STFT + one peak pick serving BOTH the inspector overlays and
    the wang fingerprint: -> (t, f, mag_power, power, hashes, t1). The
    inspector previously ran the full pipeline three times per request
    (peaks, overlay landmarks, fingerprint) on identical input."""
    from jax import enable_x64

    with enable_x64():
        # bit-exact integer spectrogram (int64 needs x64 tracing); one
        # deterministic convert to f32 feeds the unchanged selection code
        power = dsp.stft_power_int(
            jnp.asarray(dsp.quantize_samples_i16(samples)), n_fft, hop, True
        ).astype(jnp.float32)
    slab = max(1, sr // hop)
    t, f, valid = pick_peaks(
        power, slab, cfg.peaks_per_sec, cfg.min_anchor_mag_db,
        getattr(cfg, "local_floor", False),
    )
    h, t1, ok = wang_pairs(
        t, f, valid, cfg.fan_out, cfg.target_zone_t, cfg.target_zone_f
    )
    ok = np.asarray(ok)
    tv, fv, validv = np.asarray(t), np.asarray(f), np.asarray(valid)
    pw = np.asarray(power)
    sel_t, sel_f = tv[validv], fv[validv]
    return (sel_t, sel_f, pw[sel_t, sel_f], pw,
            np.asarray(h)[ok], np.asarray(t1)[ok])
