"""EmbeddedBackend: WAL-durable host store + device-cached ANN matrices.

Rebuild of the reference's redb-backed EmbeddedBackend
(src/index/embedded/mod.rs). Storage layout follows the same four
logical tables keyed (tenant u32, record u64) — fingerprints, metadata,
vectors, catalog (mod.rs:37-43) — plus the BM25 corpus updated in the
same logical transaction as every fingerprint write (bm25.rs:7-9: the
text index never lags the catalog).

Durability model: an fsync'd append-only WAL (one fsync per upsert/delete
batch, matching redb's one-commit-per-txn), replayed on open; `compact()`
rewrites the snapshot. The database file is the checkpoint, exactly as in
the reference (ARCHITECTURE.md:182-193) — device state is a pure cache
rebuilt from the host store, never persisted.

The ANN path is the flagship TPU change: instead of redb range scan +
rayon cosine fold (mod.rs:268-360), each (tenant, dim) owns a padded
device-resident f32 matrix (capacity-doubled so jit recompiles only on
growth) queried with ops.knn.cosine_topk — one MXU matmul + lax.top_k.
Packed fingerprint bytes get the same treatment per (tenant, algorithm)
for Hamming top-k. Caches mark dirty on writes and re-upload lazily on
the next query, so bulk ingest costs one transfer, not N.
"""

from __future__ import annotations

import asyncio
import os
import threading
from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np

from ..core import (
    FingerprintMeta,
    Hit,
    HitSource,
    IndexError_,
    IngestError,
    Modality,
    Record,
    RecordNotFound,
    TermHit,
)
from ..ops import knn as knn_ops
from .backend import IndexBackend
from .bm25 import Bm25Engine

LSH_ALGORITHM = "minhash-lsh-h128"
AUDIO_LANDMARK_ALGOS = ("audiofp-wang-v1", "audiofp-panako-v1")
HAITSMA_ALGORITHM = "audiofp-haitsma-v1"


def _upsert_event(tenant_id: int, record_id: int, row: dict) -> dict:
    return {
        "op": "upsert",
        "tenant_id": tenant_id,
        "record_id": record_id,
        "modality": row["modality"],
        "algorithm": row["algorithm"],
        "config_hash": row["config_hash"],
        "format_version": row["format_version"],
        "fingerprint": row["fingerprint"],
        "embedding": row["embedding"],
        "model_id": row["model_id"],
        "metadata": row["metadata"],
        "text": row["text"],
    }


def _record_event(rec: Record) -> dict:
    return {
        "op": "upsert",
        "tenant_id": rec.tenant_id,
        "record_id": rec.record_id,
        "modality": rec.modality.value,
        "algorithm": rec.algorithm,
        "config_hash": rec.config_hash,
        "format_version": rec.format_version,
        "fingerprint": rec.fingerprint,
        "embedding": rec.embedding,
        "model_id": rec.model_id,
        "metadata": rec.metadata,
        "text": rec.text,
    }


@dataclass
class _RowCache:
    """Dense row matrix with capacity-doubled padding and swap-with-last
    removal. One implementation serves both the f32 embedding caches
    (width = dim) and the packed uint32 fingerprint caches (width =
    words) — the grow/swap invariants live in exactly one place."""

    width: int
    dtype: type = np.float32
    rids: list[int] = field(default_factory=list)
    rows: dict[int, int] = field(default_factory=dict)  # rid -> row
    data: np.ndarray | None = None  # [cap, width]
    # interned (algorithm, model_id) codes per row, for device-masked
    # query filters; only the vector caches track them
    track_tags: bool = False
    tags: np.ndarray | None = None  # [cap, 2] int32
    n: int = 0
    dirty: bool = True
    device: tuple | None = None  # device-side cache arrays
    # rows touched since the last device sync; None = full re-upload
    # needed (growth / first build). Bounded so a huge backlog falls back
    # to one bulk transfer instead of thousands of scattered updates.
    pending: list | None = None
    # bumped whenever a row CHANGES POSITION (remove's swap-with-last —
    # appends and in-place updates never move rows < n). Queries map
    # kernel indices back to rids AFTER the kernel by re-checking gen
    # instead of copying the whole rid list under the lock: list(rids)
    # measured 118 ms at 10M rows — 20x the device scan — per query.
    gen: int = 0

    MAX_PENDING = 256

    def _note(self, row: int) -> None:
        if self.dirty or self.pending is None:
            self.dirty = True
            self.pending = None
        elif len(self.pending) >= self.MAX_PENDING:
            self.dirty = True
            self.pending = None
        else:
            self.pending.append(row)

    def upsert(self, rid: int, vec: np.ndarray,
               tag: tuple[int, int] | None = None) -> None:
        if rid in self.rows:
            row = self.rows[rid]
            self.data[row] = vec
            if self.track_tags and tag is not None:
                self.tags[row] = tag
            self._note(row)
        else:
            if self.data is None:
                self.data = np.zeros((1024, self.width), self.dtype)
                if self.track_tags:
                    self.tags = np.zeros((1024, 2), np.int32)
                self.dirty = True
                self.pending = None
            elif self.n == self.data.shape[0]:
                grown = np.zeros((self.data.shape[0] * 2, self.width), self.dtype)
                grown[: self.n] = self.data
                self.data = grown
                if self.track_tags:
                    gt = np.zeros((grown.shape[0], 2), np.int32)
                    gt[: self.n] = self.tags
                    self.tags = gt
                self.dirty = True  # capacity change: full re-upload
                self.pending = None
            self.data[self.n] = vec
            if self.track_tags and tag is not None:
                self.tags[self.n] = tag
            self.rows[rid] = self.n
            self.rids.append(rid)
            self._note(self.n)
            self.n += 1

    def upsert_many(self, rids: list[int], mat: np.ndarray,
                    tag: tuple[int, int] | None = None) -> None:
        """Bulk append of all-NEW rids (callers gate on novelty): one
        slice assignment instead of per-row copies — the per-record
        upsert() measured ~19 us/record of the 1-core ingest budget at
        batch 128. Equivalent to upsert() called per row, including the
        pending/dirty device-sync bookkeeping. `tag` (uniform across the
        batch — bulk callers gate on that) fills the filter-tag rows the
        way per-row upsert(tag=...) does."""
        m = len(rids)
        if m == 0:
            return
        grew = False
        if self.data is None:
            cap = 1024
            while cap < m:
                cap *= 2
            self.data = np.zeros((cap, self.width), self.dtype)
            if self.track_tags:
                self.tags = np.zeros((cap, 2), np.int32)
            grew = True
        elif self.n + m > self.data.shape[0]:
            cap = self.data.shape[0]
            while cap < self.n + m:
                cap *= 2
            grown = np.zeros((cap, self.width), self.dtype)
            grown[: self.n] = self.data[: self.n]
            self.data = grown
            if self.track_tags:
                gt = np.zeros((cap, 2), np.int32)
                gt[: self.n] = self.tags[: self.n]
                self.tags = gt
            grew = True
        self.data[self.n: self.n + m] = mat
        if self.track_tags and tag is not None:
            self.tags[self.n: self.n + m] = tag
        row = self.n
        for rid in rids:
            self.rows[rid] = row
            row += 1
        self.rids.extend(rids)
        self.n += m
        if (grew or self.dirty or self.pending is None
                or len(self.pending) + m > self.MAX_PENDING):
            self.dirty = True
            self.pending = None
        else:
            self.pending.extend(range(self.n - m, self.n))

    def remove(self, rid: int) -> None:
        row = self.rows.pop(rid, None)
        if row is None:
            return
        self.gen += 1  # rows move: invalidate deferred rid mappings
        # swap-with-last keeps the matrix dense
        last = self.n - 1
        if row != last:
            self.data[row] = self.data[last]
            if self.track_tags:
                self.tags[row] = self.tags[last]
            moved = self.rids[last]
            self.rids[row] = moved
            self.rows[moved] = row
            self._note(row)
        self.rids.pop()
        self.data[last] = 0
        if self.track_tags:
            self.tags[last] = 0
        self._note(last)
        self.n -= 1


@dataclass
class _StreamCache:
    """Variable-length u32 streams packed into one padded device matrix
    [cap, tmax] + true lengths, so a haitsma query is ONE batched device
    dispatch over the whole catalog instead of a per-record launch loop.
    Row capacity and tmax both grow by doubling (O(log^2) recompiles)."""

    rids: list[int] = field(default_factory=list)
    rows: dict[int, int] = field(default_factory=dict)
    data: np.ndarray | None = None  # [cap, tmax] uint32
    lens: np.ndarray | None = None  # [cap] int32
    n: int = 0
    dirty: bool = True
    device: tuple | None = None
    gen: int = 0  # bumped on row moves (see _RowCache.gen)

    def upsert(self, rid: int, frames: np.ndarray) -> None:
        t = len(frames)
        if self.data is None:
            tmax = 64
            while tmax < t:
                tmax *= 2
            self.data = np.zeros((64, tmax), np.uint32)
            self.lens = np.zeros(64, np.int32)
        if t > self.data.shape[1]:
            tmax = self.data.shape[1]
            while tmax < t:
                tmax *= 2
            grown = np.zeros((self.data.shape[0], tmax), np.uint32)
            grown[:, : self.data.shape[1]] = self.data
            self.data = grown
        row = self.rows.get(rid)
        if row is None:
            if self.n == self.data.shape[0]:
                grown = np.zeros((self.data.shape[0] * 2, self.data.shape[1]),
                                 np.uint32)
                grown[: self.n] = self.data
                self.data = grown
                glen = np.zeros(grown.shape[0], np.int32)
                glen[: self.n] = self.lens
                self.lens = glen
            row = self.n
            self.rows[rid] = row
            self.rids.append(rid)
            self.n += 1
        self.data[row, :] = 0
        self.data[row, :t] = frames
        self.lens[row] = t
        self.dirty = True

    def remove(self, rid: int) -> None:
        row = self.rows.pop(rid, None)
        if row is None:
            return
        self.gen += 1  # rows move: invalidate deferred rid mappings
        last = self.n - 1
        if row != last:
            self.data[row] = self.data[last]
            self.lens[row] = self.lens[last]
            moved = self.rids[last]
            self.rids[row] = moved
            self.rows[moved] = row
        self.rids.pop()
        self.data[last] = 0
        self.lens[last] = 0
        self.n -= 1
        self.dirty = True


class _LandmarkIndex:
    """Columnar landmark postings, sorted by hash: one vectorized
    searchsorted answers a whole query's hash lookups at once, and a
    delete is one boolean-mask filter (the dict-of-lists version walked
    Python lists per query hash and rebuilt posting lists per delete —
    VERDICT weak #6). Inserts buffer and consolidate lazily on the next
    read, so bulk ingest costs one O(N log N) merge, not N."""

    def __init__(self) -> None:
        self.hashes = np.zeros(0, np.uint32)
        self.rids = np.zeros(0, np.uint64)
        self.ts = np.zeros(0, np.int64)
        self._pend: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []

    def __len__(self) -> int:
        return len(self.hashes) + sum(len(p[0]) for p in self._pend)

    def insert(self, rid: int, pairs: np.ndarray) -> None:
        """pairs [L, 2] uint32 (hash, t)."""
        if len(pairs) == 0:
            return
        self._pend.append((
            pairs[:, 0].astype(np.uint32),
            np.full(len(pairs), rid, np.uint64),
            pairs[:, 1].astype(np.int64),
        ))

    def _consolidate(self) -> None:
        if not self._pend:
            return
        ph = np.concatenate([p[0] for p in self._pend])
        pr = np.concatenate([p[1] for p in self._pend])
        pt = np.concatenate([p[2] for p in self._pend])
        order = np.argsort(ph, kind="stable")
        ph, pr, pt = ph[order], pr[order], pt[order]
        if len(self.hashes) == 0:
            self.hashes, self.rids, self.ts = ph, pr, pt
        else:
            # the base is already sorted: merge in O(N + P) instead of
            # re-sorting everything (an interleaved write/query workload
            # would otherwise pay O(N log N) per query)
            pos = np.searchsorted(self.hashes, ph, side="right")
            self.hashes = np.insert(self.hashes, pos, ph)
            self.rids = np.insert(self.rids, pos, pr)
            self.ts = np.insert(self.ts, pos, pt)
        self._pend = []

    def remove(self, rid: int) -> None:
        self._consolidate()
        keep = self.rids != np.uint64(rid)
        self.hashes = self.hashes[keep]
        self.rids = self.rids[keep]
        self.ts = self.ts[keep]

    def lookup(self, h_query: np.ndarray):
        """All postings matching each query hash.
        -> (qidx [M], rids [M], ts [M]): qidx maps each match back to
        its position in h_query."""
        self._consolidate()
        if len(self.hashes) == 0 or len(h_query) == 0:
            z = np.zeros(0, np.int64)
            return z, np.zeros(0, np.uint64), np.zeros(0, np.int64)
        lo = np.searchsorted(self.hashes, h_query, "left")
        hi = np.searchsorted(self.hashes, h_query, "right")
        reps = hi - lo
        m = int(reps.sum())
        if m == 0:
            z = np.zeros(0, np.int64)
            return z, np.zeros(0, np.uint64), np.zeros(0, np.int64)
        starts = np.repeat(lo, reps)
        offs = np.arange(m, dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        idx = starts + offs
        qidx = np.repeat(np.arange(len(h_query), dtype=np.int64), reps)
        return qidx, self.rids[idx], self.ts[idx]


def _VecCache(dim: int) -> _RowCache:  # noqa: N802 - constructor alias
    return _RowCache(width=dim, dtype=np.float32, track_tags=True)


def _HamCache(words: int) -> _RowCache:  # noqa: N802 - constructor alias
    return _RowCache(width=words, dtype=np.uint32)


class EmbeddedBackend(IndexBackend):
    """Single-file-directory embedded index (open() then use).

    wal_engine: "auto" prefers the native C++ log (ucfp_tpu/native) and
    falls back to the pure-Python JSON log; existing files are sniffed so
    a store written by either engine reopens correctly.
    """

    def __init__(self, data_dir: str, wal_engine: str = "auto",
                 knn_quant: str | None = None):
        from .wal import JsonWal, open_wal

        # knn_quant: None/"none" = exact f32 cosine (reference semantics);
        # "int8" = per-row symmetric quantized scan (4x bandwidth, the
        # sub-ms @10M representation; scores are cosines of the quantized
        # rows); "sketch" = int8 PLUS a 768-bit SimHash sketch prefilter
        # for single-vector queries (8x less HBM scanned, pool-selected
        # candidates, exact int8 rescore — responses marked approximate);
        # "int4" = int8 PLUS a nibble-packed int4 prefilter (2x less HBM
        # than the exact scan at near-exact ordering, tiny rescore pool —
        # the recommended approximate tier, ops/pallas_int4.py);
        # "int2" = int8 PLUS a 2-bit packed prefilter (4x less HBM than
        # exact; fixed 8k rescore pool, ops/pallas_int2.py — the fastest
        # single-query tier; batched queries ride the exact GEMM). Also
        # settable via UCFP_KNN_QUANT.
        self.knn_quant = (knn_quant or os.environ.get("UCFP_KNN_QUANT", "none")).lower()
        self._planes: dict[int, object] = {}  # dim -> device planes
        self._tag_codes: dict[str, int] = {}  # algorithm/model_id interning
        # tenant -> insertion-ordered record ids (listing pagination)
        self._tenant_rows: dict[int, dict[int, None]] = {}
        self.data_dir = data_dir
        os.makedirs(data_dir, exist_ok=True)
        self._wal_path = os.path.join(data_dir, "ucfp.wal")
        self._lock = threading.Lock()  # one writer, same-txn BM25 semantics
        self._records: dict[tuple[int, int], dict] = {}
        from .bm25 import make_engine

        self._bm25 = make_engine(
            prefer_native=os.environ.get("UCFP_BM25", "native") != "python"
        )
        self._vec: dict[tuple[int, int], _VecCache] = {}  # (tenant, dim)
        self._ham: dict[tuple[int, str], _HamCache] = {}  # (tenant, algorithm)
        # ICI-sharded serving (SURVEY §7 step 7): with more than one
        # device the ANN caches are row-sharded over a 1-D mesh and every
        # query rides the two-stage distributed top-k. UCFP_SHARD=off
        # forces single-device; "auto" (default) shards over the largest
        # power-of-two device count (capacities are powers of two, so
        # rows always divide evenly).
        self._mesh = None
        self._mesh_axes: tuple = ("d",)
        if (os.environ.get("UCFP_SHARD", "auto").lower() != "off"):
            import jax

            n = len(jax.devices())
            shape = os.environ.get("UCFP_MESH_SHAPE", "").lower()
            if "x" in shape:
                # multi-slice pod: UCFP_MESH_SHAPE=<slices>x<chips/slice>;
                # the hierarchical merge keeps the wide reduction on ICI
                from ..parallel.mesh import data_mesh_2d

                s_, d_ = (int(x) for x in shape.split("x", 1))
                self._mesh = data_mesh_2d(s_, d_)
                self._mesh_axes = ("s", "d")
            elif n >= 2:
                from ..parallel.mesh import data_mesh

                self._mesh = data_mesh(1 << (n.bit_length() - 1))
        # Query micro-batching (opt-in, UCFP_QUERY_BATCH_MS > 0):
        # concurrent single-vector queries coalesce into ONE batched
        # device dispatch per (tenant, dim, k) inside the deadline
        # window — a single-query scan at 10M x 768 costs 5-10 ms while
        # the batched path costs ~0.3-0.6 ms/query, so under concurrent
        # load coalescing multiplies serving throughput. Only
        # plain queries coalesce (no filter / exact / pool_frac);
        # per-mode semantics are same-or-better than the single path
        # (batch paths are exact or recall-1.0 int4) and the
        # approximate marker stays conservative.
        self._qbatch_ms = float(
            os.environ.get("UCFP_QUERY_BATCH_MS", "0") or 0
        )
        # flush-size cap + padding policy. "pow2" (default) pads each
        # coalesced batch to the next power of two — O(log max) compiled
        # shapes, minimal padded work. "max" pads every flush to
        # UCFP_QBATCH_MAX — exactly ONE compiled batched shape per
        # (tenant, dim, k) bucket, for runtimes where each compile costs
        # minutes (remote/tunneled PJRT); the padded columns are nearly
        # free because the catalog scan dominates and is shared.
        self._qbatch_max = max(1, int(
            os.environ.get("UCFP_QBATCH_MAX", "64") or 64))
        self._qbatch_pad = (
            os.environ.get("UCFP_QBATCH_PAD", "pow2").lower())
        # kind ("vec"/"fp") -> {event loop -> DeadlineBatcher}
        self._batchers: dict[str, dict] = {}
        # coalescing observability (served via /v1/info): flushes and
        # total queries through the micro-batchers since boot
        self._qbatch_flushes = 0
        self._qbatch_items = 0
        self._lsh: dict[int, dict[tuple[int, int], set[int]]] = {}  # tenant -> band buckets
        # (tenant, algorithm) -> columnar postings: wang and panako
        # hashes share the u32 space, so one per-tenant index would let
        # queries match records across algorithms
        self._audio: dict[tuple[int, str], _LandmarkIndex] = {}
        self._haitsma: dict[int, _StreamCache] = {}  # tenant -> padded streams
        # an EXISTING log's on-disk format always wins over the requested
        # engine (replaying a log with the wrong engine = silent zero
        # events); open_wal("auto") performs the sniff — the format
        # invariant lives in exactly one place
        if os.path.exists(self._wal_path) and os.path.getsize(self._wal_path) > 0:
            wal_engine = "auto"
        from .wal import GroupCommitWal

        # group commit: concurrent requests' appends share one fsync —
        # see GroupCommitWal. The event-dict protocol and on-disk format
        # are unchanged; only durability scheduling moves.
        self._wal = GroupCommitWal(
            JsonWal(self._wal_path) if wal_engine == "json"
            else open_wal(self._wal_path, wal_engine)
        )
        self._replay()
        self._wal_floor = self._wal_size()

    # -- WAL ----------------------------------------------------------------

    def _replay(self) -> None:
        # Restart-scale path: the native engine replays as run-grouped
        # items (wal.iter_frame_groups) so uniform fingerprint-only runs
        # — the batch-ingest / compaction shape — apply columnar with no
        # per-record event dicts or Record objects (the per-event path
        # measured ~10 us/record = 100 s restarts at 10M rows). Engines
        # without the hook (JSON) keep the per-event loop; semantics are
        # identical either way (state-equality fuzzed in test_wal.py).
        skipped = 0
        groups_fn = getattr(self._wal, "replay_groups", None)
        groups = groups_fn() if groups_fn is not None else None
        if groups is None:
            groups = (("events", [ev]) for ev in self._wal.replay())
        for kind, payload in groups:
            if kind == "fp_run":
                skipped += self._replay_fp_run(payload)
            elif kind == "emb_run":
                skipped += self._replay_emb_run(payload)
            else:
                for ev in payload:
                    skipped += self._replay_event(ev)
        if skipped:
            from ..server.logging import logger

            logger().warn("wal_replay_skipped_events", count=skipped)

    def _replay_event(self, ev: dict) -> int:
        # A single malformed event must not brick the store: a bad row
        # that somehow reached the log (pre-validation builds, partial
        # corruption the CRC missed) is skipped with a warning instead of
        # crashing open() on every restart. Returns the skip count.
        try:
            if ev.get("op") == "upsert":
                self._apply_upsert(self._rec_from_wal(ev), wal=False)
            elif ev.get("op") == "delete":
                for rid in ev["record_ids"]:
                    self._apply_delete(ev["tenant_id"], rid, wal=False)
            return 0
        except Exception as e:  # noqa: BLE001 - replay must finish
            from ..server.logging import logger

            logger().warn(
                "wal_replay_skip", op=ev.get("op"),
                tenant_id=ev.get("tenant_id"),
                record_id=ev.get("record_id"), error=str(e),
            )
            return 1

    def _replay_fp_run(self, run: dict) -> int:
        """Columnar apply of one uniform fingerprint-only upsert run.
        Gated on exactly what _apply_fp_rows handles (all-new unique
        rids, plain Hamming algorithms, width fit) — anything else
        expands back to per-event replay, so semantics never fork.
        Returns the skip count."""
        from .wal import fp_run_events

        t = run["tenant_id"]
        alg = run["algorithm"]
        flen = run["flen"]
        rids = run["record_ids"]
        gate = (
            flen > 0 and flen % 4 == 0
            and alg != LSH_ALGORITHM
            and alg not in AUDIO_LANDMARK_ALGOS
            and alg != HAITSMA_ALGORITHM
        )
        if gate:
            hcache = self._ham.get((t, alg))
            gate = hcache is None or hcache.width == flen // 4
        if gate:
            records = self._records
            seen: set[int] = set()
            for rid in rids:
                if rid in seen or (t, rid) in records:
                    gate = False  # dup/update: per-event semantics
                    break
                seen.add(rid)
        if gate:
            try:
                block = run["fp_block"]
                fps = [
                    block[i * flen : (i + 1) * flen]
                    for i in range(len(rids))
                ]
                self._apply_fp_rows(
                    t, alg, rids, fps, flen, run["modality"],
                    run["config_hash"], run["format_version"],
                    meta=run["metadata"], fp_block=block,
                )
                return 0
            except Exception:  # noqa: BLE001 - replay must finish
                # fall through: re-applying the same rows per event is
                # idempotent (an upsert of identical content replaces
                # the row with itself), so a partial columnar apply is
                # safely completed — and per-row errors get the
                # per-event skip accounting
                pass
        skipped = 0
        for ev in fp_run_events(run):
            skipped += self._replay_event(ev)
        return skipped

    def _replay_emb_run(self, run: dict) -> int:
        """Columnar apply of one uniform embedding upsert run (the bulk
        vector-load / compaction shape). Gated on exactly what
        _apply_emb_rows handles — all-new unique rids, plain Hamming
        algorithm, width fit, finite floats — anything else expands
        back to per-event replay, so semantics never fork. Returns the
        skip count."""
        from .wal import emb_run_events

        t = run["tenant_id"]
        alg = run["algorithm"]
        flen = run["flen"]
        rids = run["record_ids"]
        gate = (
            flen > 0 and flen % 4 == 0
            and alg != LSH_ALGORITHM
            and alg not in AUDIO_LANDMARK_ALGOS
            and alg != HAITSMA_ALGORITHM
        )
        if gate:
            hcache = self._ham.get((t, alg))
            gate = hcache is None or hcache.width == flen // 4
        if gate:
            records = self._records
            seen: set[int] = set()
            for rid in rids:
                if rid in seen or (t, rid) in records:
                    gate = False  # dup/update: per-event semantics
                    break
                seen.add(rid)
        mat = None
        if gate:
            mat = run["emb_mat"]
            # non-finite rows must get the per-event skip accounting
            gate = bool(np.all(np.isfinite(mat)))
        if gate:
            try:
                block = run["fp_block"]
                fps = [
                    block[i * flen : (i + 1) * flen]
                    for i in range(len(rids))
                ]
                self._apply_emb_rows(
                    t, alg, rids, fps, flen, run["modality"],
                    run["config_hash"], run["format_version"],
                    meta=run["metadata"], model_id=run["model_id"],
                    emb_mat=mat, fp_block=block,
                )
                return 0
            except Exception:  # noqa: BLE001 - replay must finish
                # fall through: per-event re-apply is idempotent (see
                # _replay_fp_run)
                pass
        skipped = 0
        for ev in emb_run_events(run):
            skipped += self._replay_event(ev)
        return skipped

    @staticmethod
    def _rec_from_wal(ev: dict) -> Record:
        return Record(
            tenant_id=ev["tenant_id"],
            record_id=ev["record_id"],
            modality=Modality(ev["modality"]),
            algorithm=ev["algorithm"],
            fingerprint=ev["fingerprint"],
            format_version=ev.get("format_version", 1),
            config_hash=ev.get("config_hash", 0),
            embedding=ev.get("embedding"),
            model_id=ev.get("model_id"),
            metadata=ev.get("metadata", b""),
            text=ev.get("text"),
        )

    def _wal_write(self, events: list[dict]) -> None:
        """Synchronous append + durability (non-hot callers/tests)."""
        if self._wal is None:
            return
        self._wal.append_events(events)

    # -- mutations ------------------------------------------------------------

    def _apply_upsert(self, rec: Record, wal: bool) -> None:
        key = (rec.tenant_id, rec.record_id)
        # convert fallible inputs BEFORE touching any table: a malformed
        # record (e.g. non-numeric embedding from an old log) must fail
        # without leaving partial state behind for _replay to skip over
        emb_arr = (np.asarray(rec.embedding, np.float32)
                   if rec.embedding is not None else None)
        if emb_arr is not None and (emb_arr.ndim != 1 or not np.all(np.isfinite(emb_arr))):
            raise ValueError("embedding must be a flat finite float vector")
        packed = np.asarray(knn_ops.pack_bits_to_u32(rec.fingerprint), np.uint32)
        old = self._records.get(key)
        if old is None:
            # insertion-ordered per-tenant id table for O(offset+limit)
            # listing (dict preserves order; delete is O(1))
            self._tenant_rows.setdefault(rec.tenant_id, {})[rec.record_id] = None
        # embeddings are stored as np.float32 rows (the reference's
        # Vec<f32> and the device caches are f32 too) — ~25x less RAM
        # than per-element Python float lists at 768-d, and the WAL
        # round-trip is f32 anyway so restart never changed values.
        # Consumers that serialize to JSON convert at the edge
        # (handlers._describe_includes, JsonWal._to_json).
        self._records[key] = {
            "modality": rec.modality.value,
            "algorithm": rec.algorithm,
            "config_hash": rec.config_hash,
            "format_version": rec.format_version,
            "fingerprint": rec.fingerprint,
            "embedding": emb_arr,
            "model_id": rec.model_id,
            "metadata": rec.metadata,
            "text": rec.text,
        }
        # vectors table
        if old is not None and old["embedding"] is not None:
            olddim = len(old["embedding"])
            if rec.embedding is None or len(rec.embedding) != olddim:
                c = self._vec.get((rec.tenant_id, olddim))
                if c:
                    c.remove(rec.record_id)
        if emb_arr is not None:
            dim = len(emb_arr)
            cache = self._vec.setdefault((rec.tenant_id, dim), _VecCache(dim))
            cache.upsert(
                rec.record_id, emb_arr,
                tag=(self._tag_code(rec.algorithm),
                     self._tag_code(rec.model_id)),
            )
        # packed fingerprint table
        if old is not None and old["algorithm"] != rec.algorithm:
            h = self._ham.get((rec.tenant_id, old["algorithm"]))
            if h:
                h.remove(rec.record_id)
        hcache = self._ham.get((rec.tenant_id, rec.algorithm))
        if hcache is None:
            hcache = _HamCache(words=len(packed))
            self._ham[(rec.tenant_id, rec.algorithm)] = hcache
        if len(packed) == hcache.width:
            hcache.upsert(rec.record_id, packed)
        else:
            # width mismatch: drop any stale row so knn_fingerprint never
            # scores this record against its previous fingerprint
            hcache.remove(rec.record_id)
        # LSH band-bucket index for re-tagged MinHash records
        # (reference text.rs:434-446: "the index layer knows to insert
        # into the LSH buckets")
        if old is not None and old["algorithm"] == LSH_ALGORITHM:
            self._lsh_remove(rec.tenant_id, rec.record_id, old["fingerprint"])
        if rec.algorithm == LSH_ALGORITHM:
            self._lsh_insert(rec.tenant_id, rec.record_id, rec.fingerprint)
        # audio landmark inverted index (wang/panako offset voting)
        if old is not None and old["algorithm"] in AUDIO_LANDMARK_ALGOS:
            self._audio_index_remove(rec.tenant_id, old["algorithm"],
                                     rec.record_id)
        if rec.algorithm in AUDIO_LANDMARK_ALGOS:
            self._audio_index_insert(rec.tenant_id, rec.algorithm,
                                     rec.record_id, rec.fingerprint)
        # haitsma padded-stream cache (batched min-BER lookups)
        if old is not None and old["algorithm"] == HAITSMA_ALGORITHM:
            sc = self._haitsma.get(rec.tenant_id)
            if sc and (rec.algorithm != HAITSMA_ALGORITHM
                       or len(rec.fingerprint) % 4 != 0):
                # replacing with another algorithm OR a misaligned
                # fingerprint: either way the old stream is stale
                sc.remove(rec.record_id)
        if rec.algorithm == HAITSMA_ALGORITHM and len(rec.fingerprint) % 4 == 0:
            sc = self._haitsma.setdefault(rec.tenant_id, _StreamCache())
            sc.upsert(rec.record_id,
                      np.frombuffer(rec.fingerprint, dtype="<u4"))
        # BM25 — same logical txn (bm25.rs:333-401; no text clears the
        # doc). Textless records that never had text skip the engine
        # entirely (clear-of-absent is a no-op, and the ctypes hop per
        # image record measured on the 1-core ingest profile)
        if rec.text is not None or (old is not None
                                    and old["text"] is not None):
            self._bm25.upsert_one(rec.tenant_id, rec.record_id, rec.text)

    def _apply_upsert_batch(self, recs: list[Record],
                            emb_mat: np.ndarray | None = None) -> bool:
        """Vectorized apply for the high-rate ingest shape: one batch of
        all-NEW fingerprint-only records sharing (tenant, algorithm) and
        fingerprint width. Returns False — mutating NOTHING — when any
        record doesn't fit, and the caller runs the per-record path.
        Packing + row insert collapse to one np.frombuffer and one slice
        assignment (the per-record _apply_upsert measured ~19 us/record
        of the 1-core ingest budget at batch 128). `emb_mat`, when
        given, is the batch's _validate_records matrix (finite [n, d]
        f32, row i = recs[i].embedding) for the embedding branch to
        reuse.
        """
        first = recs[0]
        t = first.tenant_id
        alg = first.algorithm
        flen = len(first.fingerprint)
        if (alg == LSH_ALGORITHM or alg in AUDIO_LANDMARK_ALGOS
                or alg == HAITSMA_ALGORITHM or flen == 0 or flen % 4 != 0):
            return False
        if first.embedding is not None:
            return self._apply_upsert_batch_emb(recs, t, alg, flen,
                                                mat=emb_mat)
        seen: set[int] = set()
        for r in recs:
            if (r.tenant_id != t or r.algorithm != alg
                    or r.embedding is not None or r.text is not None
                    or len(r.fingerprint) != flen
                    or r.record_id in seen
                    or (t, r.record_id) in self._records):
                return False
            seen.add(r.record_id)
        hcache = self._ham.get((t, alg))
        if hcache is None:
            hcache = _HamCache(words=flen // 4)
            self._ham[(t, alg)] = hcache
        elif hcache.width != flen // 4:
            return False
        # all gates passed: nothing below can fail half-way
        packed = np.frombuffer(
            b"".join(bytes(r.fingerprint) for r in recs), "<u4"
        ).reshape(len(recs), flen // 4)
        trows = self._tenant_rows.setdefault(t, {})
        records = self._records
        for r in recs:
            trows[r.record_id] = None
            records[(t, r.record_id)] = {
                "modality": r.modality.value,
                "algorithm": alg,
                "config_hash": r.config_hash,
                "format_version": r.format_version,
                "fingerprint": r.fingerprint,
                "embedding": None,
                "model_id": r.model_id,
                "metadata": r.metadata,
                "text": None,
            }
        hcache.upsert_many([r.record_id for r in recs], packed)
        return True

    def _apply_upsert_batch_emb(self, recs: list[Record], t: int,
                                alg: str, flen: int,
                                mat: np.ndarray | None = None) -> bool:
        """Vectorized apply for the bulk vector-load shape: one batch of
        all-NEW embedding records sharing (tenant, algorithm, model_id,
        dim) and fingerprint width. Same contract as
        _apply_upsert_batch: returns False — mutating NOTHING — when
        any record doesn't fit (incl. ragged/non-finite embeddings,
        which the per-record path then rejects with its canonical
        errors). The per-record _apply_upsert measured ~0.18 ms/record
        on a 768-d bulk load; this path is one np.asarray + two bulk
        cache appends."""
        first = recs[0]
        model = first.model_id
        seen: set[int] = set()
        for r in recs:
            if (r.tenant_id != t or r.algorithm != alg
                    or r.embedding is None or r.text is not None
                    or r.model_id != model
                    or len(r.fingerprint) != flen
                    or r.record_id in seen
                    or (t, r.record_id) in self._records):
                return False
            seen.add(r.record_id)
        if mat is None:
            try:
                mat = np.asarray([r.embedding for r in recs], np.float32)
            except (TypeError, ValueError):
                return False
            if (mat.ndim != 2 or mat.shape[0] != len(recs)
                    or not np.all(np.isfinite(mat))):
                # ragged dims are legal per-record (each lands in its
                # own (tenant, dim) cache); non-finite must raise the
                # canonical per-record ValueError — both fall back
                return False
        dim = mat.shape[1]
        hcache = self._ham.get((t, alg))
        if hcache is None:
            hcache = _HamCache(words=flen // 4)
            self._ham[(t, alg)] = hcache
        elif hcache.width != flen // 4:
            return False
        # all gates passed: nothing below can fail half-way
        packed = np.frombuffer(
            b"".join(bytes(r.fingerprint) for r in recs), "<u4"
        ).reshape(len(recs), flen // 4)
        trows = self._tenant_rows.setdefault(t, {})
        records = self._records
        for i, r in enumerate(recs):
            trows[r.record_id] = None
            records[(t, r.record_id)] = {
                "modality": r.modality.value,
                "algorithm": alg,
                "config_hash": r.config_hash,
                "format_version": r.format_version,
                "fingerprint": r.fingerprint,
                "embedding": mat[i],  # f32 row view (see _apply_upsert)
                "model_id": model,
                "metadata": r.metadata,
                "text": None,
            }
        rids = [r.record_id for r in recs]
        cache = self._vec.setdefault((t, dim), _VecCache(dim))
        cache.upsert_many(
            rids, mat,
            tag=(self._tag_code(alg), self._tag_code(model)),
        )
        hcache.upsert_many(rids, packed)
        return True

    def _apply_delete(self, tenant_id: int, rid: int, wal: bool) -> None:
        key = (tenant_id, rid)
        old = self._records.pop(key, None)
        if old is not None:
            t = self._tenant_rows.get(tenant_id)
            if t is not None:
                t.pop(rid, None)
            if old["embedding"] is not None:
                c = self._vec.get((tenant_id, len(old["embedding"])))
                if c:
                    c.remove(rid)
            h = self._ham.get((tenant_id, old["algorithm"]))
            if h:
                h.remove(rid)
            if old["algorithm"] == LSH_ALGORITHM:
                self._lsh_remove(tenant_id, rid, old["fingerprint"])
            if old["algorithm"] in AUDIO_LANDMARK_ALGOS:
                self._audio_index_remove(tenant_id, old["algorithm"], rid)
            if old["algorithm"] == HAITSMA_ALGORITHM:
                sc = self._haitsma.get(tenant_id)
                if sc:
                    sc.remove(rid)
        self._bm25.clear_one(tenant_id, rid)

    # -- LSH band buckets --------------------------------------------------------

    @staticmethod
    def _lsh_signature(fp: bytes) -> Optional[np.ndarray]:
        if len(fp) < 8 + 8 or (len(fp) - 8) % 8 != 0:
            return None
        return np.frombuffer(fp, dtype="<u8", offset=8)

    def _lsh_insert(self, tenant_id: int, rid: int, fp: bytes) -> None:
        from ..ops.textsig import band_hashes

        sig = self._lsh_signature(fp)
        if sig is None or len(sig) < 120:
            return
        buckets = self._lsh.setdefault(tenant_id, {})
        for j, bh in enumerate(band_hashes(sig)):
            buckets.setdefault((j, bh), set()).add(rid)

    def _lsh_remove(self, tenant_id: int, rid: int, fp: bytes) -> None:
        from ..ops.textsig import band_hashes

        sig = self._lsh_signature(fp)
        if sig is None or len(sig) < 120:
            return
        buckets = self._lsh.get(tenant_id)
        if not buckets:
            return
        for j, bh in enumerate(band_hashes(sig)):
            s = buckets.get((j, bh))
            if s is not None:
                s.discard(rid)
                if not s:
                    del buckets[(j, bh)]

    async def knn_lsh(self, tenant_id: int, fingerprint: bytes, k: int) -> list[Hit]:
        """Sub-linear candidate retrieval: union the band buckets the query
        signature lands in, then rank candidates by MinHash slot agreement
        (estimated Jaccard)."""
        sig = self._lsh_signature(fingerprint)
        if sig is None or len(sig) < 120 or k == 0:
            return []

        def work():
            from ..ops.textsig import band_hashes

            with self._lock:
                buckets = self._lsh.get(tenant_id, {})
                cands: set[int] = set()
                for j, bh in enumerate(band_hashes(sig)):
                    cands |= buckets.get((j, bh), set())
                rows = {
                    rid: self._records.get((tenant_id, rid)) for rid in cands
                }
            rids_l, sigs = [], []
            for rid, row in rows.items():
                if row is None:
                    continue
                other = self._lsh_signature(row["fingerprint"])
                if other is None or len(other) != len(sig):
                    continue
                rids_l.append(rid)
                sigs.append(other)
            if not sigs:
                return []
            # one vectorized slot-agreement pass over all candidates
            mat = np.stack(sigs)  # [N, h]
            scores = (mat == sig[None, :]).mean(axis=1)
            rid_arr = np.asarray(rids_l, np.uint64)
            order = np.lexsort((rid_arr, -scores))[:k]
            return [
                Hit(record_id=int(rid_arr[i]), score=float(scores[i]),
                    source=HitSource.VECTOR)
                for i in order
            ]

        return await asyncio.to_thread(work)

    def bm25_idf_map(self, tenant_id: int, terms: list[str]) -> dict[str, float]:
        """Corpus IDF for the SimHash-IDF weighting (REPORT.md 4.1.2).

        The caller's tokens come from the TEXT tokenizer (\\w+, keeps
        underscores; or grapheme/cjk forms) while the BM25 corpus is
        keyed by its own tokenizer ([^\\W_]+) — so each term is mapped
        to its BM25 subtokens and weighted by the MAX sub-IDF (its most
        informative component). Without this, "snake_case" would never
        match the postings for "snake"/"case" and silently fall back to
        the TF default."""
        from .bm25 import tokenize as bm25_tokenize

        sub_of: dict[str, list[str]] = {}
        for t in terms:
            subs = bm25_tokenize(t)
            sub_of[t] = subs if subs else [t.lower()]
        flat = sorted({s for subs in sub_of.values() for s in subs})
        with self._lock:
            base = self._bm25.idf_map(tenant_id, flat)
        out: dict[str, float] = {}
        for t, subs in sub_of.items():
            vals = [base[s] for s in subs if s in base]
            if vals:
                out[t] = max(vals)
        return out

    def _tag_code(self, value: str | None) -> int:
        """Intern algorithm/model_id strings to dense int codes for the
        per-row filter tags (0 = absent)."""
        if value is None:
            return 0
        code = self._tag_codes.get(value)
        if code is None:
            code = len(self._tag_codes) + 1
            self._tag_codes[value] = code
        return code

    def _vector_filter_mask(self, cache, flt: dict):
        """[cap] bool row mask for a supported filter, or raise
        Unsupported for shapes this build can't honor. Returns None when
        no row can possibly match (a never-seen value)."""
        from .backend import validate_filter

        validate_filter(flt)
        cap = cache.data.shape[0]
        mask = np.ones(cap, bool)
        for col, key in ((0, "algorithm"), (1, "model_id")):
            v = flt.get(key)
            if v is None:
                continue
            code = self._tag_codes.get(v)
            if code is None:
                return None  # value never ingested: nothing matches
            mask &= cache.tags[:, col] == code
        return mask

    # -- audio landmark matching (offset voting) ---------------------------------

    def _audio_index_insert(self, tenant_id: int, algorithm: str, rid: int,
                            fp: bytes) -> None:
        pairs = np.frombuffer(fp, dtype="<u4")
        if pairs.size % 2:
            return
        self._audio.setdefault(
            (tenant_id, algorithm), _LandmarkIndex()
        ).insert(rid, pairs.reshape(-1, 2))

    def _audio_index_remove(self, tenant_id: int, algorithm: str,
                            rid: int) -> None:
        idx = self._audio.get((tenant_id, algorithm))
        if idx is not None:
            idx.remove(rid)

    def _device_haitsma(self, cache: _StreamCache):
        """Padded stream matrix + lengths on device (row-sharded over the
        mesh like the ANN caches — min_ber_batch is row-parallel, so
        GSPMD partitions it with no collectives)."""
        if cache.dirty or cache.device is None:
            cache.device = (
                self._put_matrix(cache.data),
                self._put_rowvec(cache.lens),
            )
            cache.dirty = False
        return cache.device

    async def knn_haitsma(
        self, tenant_id: int, fingerprint: bytes, k: int
    ) -> list[Hit]:
        """Philips-style sliding bit-error-rate lookup, ONE batched device
        dispatch over the whole padded-stream catalog (the old path
        launched one kernel per stored record); records rank by minimum
        BER (score = 1 - ber)."""
        if k == 0 or len(fingerprint) < 4 or len(fingerprint) % 4:
            return []
        q = np.frombuffer(fingerprint, dtype="<u4")
        cache = self._haitsma.get(tenant_id)
        if cache is None or cache.n == 0:
            return []

        def work():
            import jax.numpy as jnp

            from ..ops.audio import haitsma as hops

            with self._lock:
                if cache.n == 0:
                    return []
                tmax = cache.data.shape[1]
                if len(q) > tmax:
                    # query longer than every stored stream
                    return []
                dev = self._device_haitsma(cache)
                rids = list(cache.rids)
            data, lens = dev
            qb = 64
            while qb < len(q):
                qb *= 2
            qb = min(qb, tmax)
            q_pad = np.zeros(qb, np.uint32)
            q_pad[: len(q)] = q
            ber, _off = hops.min_ber_batch(
                data, lens, jnp.asarray(q_pad), jnp.int32(len(q))
            )
            ber = np.asarray(ber)[: len(rids)]
            scored = [
                (rid, 1.0 - float(b))
                for rid, b in zip(rids, ber)
                if np.isfinite(b) and b < 1.0
            ]
            scored.sort(key=lambda x: (-x[1], x[0]))
            return [
                Hit(record_id=rid, score=s, source=HitSource.VECTOR)
                for rid, s in scored[:k]
            ]

        return await asyncio.to_thread(work)

    async def knn_audio(
        self, tenant_id: int, algorithm: str, fingerprint: bytes, k: int
    ) -> list[Hit]:
        """Shazam-style offset voting over stored Wang/Panako landmarks —
        a retrieval capability the reference lacks (it stores audio hashes
        but never matches them). For each query (hash, t) that appears in
        the inverted landmark index, vote for (record, t_db - t_q); the
        score is the largest consistent-offset bin per record, normalized
        by the query hash count.

        Panako queries additionally (a) expand each hash across the
        adjacent quantized time-ratio steps (the 4-bit ratio field sits
        at bits 12-15; +/-5% tempo stretch moves landmarks across one
        quantization boundary — the hash's other fields are
        pitch/tempo-invariant log-band differences), and (b) bin vote
        offsets by 8 frames, since a stretched query's t_db - t_q
        drifts linearly instead of staying constant (Panako's published
        design matches on coarse offset agreement for the same reason).
        """
        if k == 0 or not fingerprint:
            return []
        pairs = np.frombuffer(fingerprint, dtype="<u4")
        if pairs.size == 0 or pairs.size % 2:
            return []
        pairs = pairs.reshape(-1, 2)
        panako = algorithm == "audiofp-panako-v1"
        off_bin = 8 if panako else 1

        # expand panako hashes across adjacent quantized time-ratio steps
        # (bits 12-15; a +/-5% stretch crosses one boundary), vectorized
        h0 = pairs[:, 0].astype(np.uint32)
        tq0 = pairs[:, 1].astype(np.int64)
        qi0 = np.arange(len(pairs), dtype=np.int64)
        if panako:
            ratio = (h0 >> 12) & 0xF
            lo_ok = ratio > 0
            hi_ok = ratio < 15
            h_exp = np.concatenate(
                [h0, h0[lo_ok] - (1 << 12), h0[hi_ok] + (1 << 12)]
            )
            tq_exp = np.concatenate([tq0, tq0[lo_ok], tq0[hi_ok]])
            qi_exp = np.concatenate([qi0, qi0[lo_ok], qi0[hi_ok]])
        else:
            h_exp, tq_exp, qi_exp = h0, tq0, qi0

        def work():
            with self._lock:
                idx = self._audio.get((tenant_id, algorithm))
                if idx is None or len(idx) == 0:
                    return []
                qrep, rids_m, ts_m = idx.lookup(h_exp)
            if len(qrep) == 0:
                return []
            qi = qi_exp[qrep]
            offb = (ts_m - tq_exp[qrep]) // off_bin
            # one vote per (query landmark, record, offset-bin): a
            # stationary ridge stores the same hash at many frames, and
            # raw pair-counting lets those cross-products saturate the
            # bin. Dedupe + count fully vectorized: factorize record
            # ids (record_id is full-range u64, so it can't ride the
            # packed key directly), clamp the bounded fields into a
            # 64-bit key, unique once for dedupe, once for counting.
            urids, rinv = np.unique(rids_m, return_inverse=True)
            off0 = (offb - offb.min()).astype(np.uint64)
            qiu = qi.astype(np.uint64)
            # dynamic packing: bit widths sized to the actual ranges so
            # nothing aliases (a fixed clamp would merge distinct
            # offsets/landmarks on very long streams or huge queries)
            qbits = max(int(qiu.max()) if len(qiu) else 0, 1).bit_length()
            obits = max(int(off0.max()) if len(off0) else 0, 1).bit_length()
            rbits = max(len(urids) - 1, 1).bit_length()
            if rbits + obits + qbits <= 63:
                key = ((rinv.astype(np.uint64) << (obits + qbits))
                       | (off0 << qbits) | qiu)
                distinct = np.unique(key)
                vote_key, counts = np.unique(distinct >> qbits,
                                             return_counts=True)
                rid_idx = (vote_key >> obits).astype(np.int64)
            else:  # pathological ranges: exact 3-column unique
                triples = np.stack(
                    [rinv.astype(np.int64), off0.astype(np.int64),
                     qiu.astype(np.int64)], axis=1)
                distinct = np.unique(triples, axis=0)
                ro_pairs, counts = np.unique(distinct[:, :2], axis=0,
                                             return_counts=True)
                rid_idx = ro_pairs[:, 0]
            best = np.zeros(len(urids), np.int64)
            np.maximum.at(best, rid_idx, counts)
            total = max(len(pairs), 1)
            order = np.lexsort((urids, -best))
            out = []
            for i in order[: k]:
                if best[i] <= 0:
                    break
                out.append(Hit(
                    record_id=int(urids[i]),
                    score=min(float(best[i]) / total, 1.0),
                    source=HitSource.VECTOR,
                ))
            return out

        return await asyncio.to_thread(work)

    # -- IndexBackend -----------------------------------------------------------

    def _validate_records(self, records: list[Record]) -> "np.ndarray | None":
        """Per-record validation with a vectorized embedding pre-pass:
        a uniform all-embedding batch validates as ONE matrix
        conversion (the per-record np.asarray measured ~60% of the
        1-core bulk vector-load budget at 768-d) and the validated
        [n, d] f32 matrix is returned for the batched apply to reuse.
        Any batch the pre-pass can't prove (mixed/absent embeddings,
        ragged dims, non-finite values) falls back to the per-record
        checks — the same exception family, raised BEFORE the WAL
        append either way."""
        mat = None
        if len(records) >= 2 and all(
                r.embedding is not None for r in records):
            try:
                m = np.asarray([r.embedding for r in records], np.float32)
            except (TypeError, ValueError):
                m = None
            if (m is not None and m.ndim == 2
                    and m.shape[0] == len(records)
                    and np.all(np.isfinite(m))):
                mat = m
        if mat is not None:
            for rec in records:
                if not isinstance(rec.fingerprint, (bytes, bytearray)):
                    raise ValueError(
                        f"record {rec.tenant_id}/{rec.record_id}: "
                        f"fingerprint must be bytes"
                    )
            return mat
        for rec in records:
            self._validate_record(rec)
        return None

    @staticmethod
    def _validate_record(rec: Record) -> None:
        """Reject malformed records BEFORE the WAL append for every
        caller (the HTTP handler validates too, but library callers must
        get the same guarantee): a bad event durably logged would be
        skipped on every replay, and a mid-batch apply failure would
        leave live state behind the log."""
        if rec.embedding is not None:
            emb = np.asarray(rec.embedding, np.float32)
            if emb.ndim != 1 or not np.all(np.isfinite(emb)):
                raise ValueError(
                    f"record {rec.tenant_id}/{rec.record_id}: embedding "
                    f"must be a flat finite float vector"
                )
        if not isinstance(rec.fingerprint, (bytes, bytearray)):
            raise ValueError(
                f"record {rec.tenant_id}/{rec.record_id}: fingerprint "
                f"must be bytes"
            )

    async def upsert(self, records: list[Record]) -> None:
        wal = self._wal  # snapshot: close() may null the attr mid-await

        def apply():
            emb_mat = self._validate_records(records)
            self._check_durability(wal)
            with self._lock:
                # buffered WAL append and memory apply share ONE critical
                # section, so replay order always equals apply order; the
                # shared fsync happens after the lock drops (group commit)
                ticket = (wal.append_buffered(
                    [_record_event(r) for r in records]
                ) if wal is not None else None)
                if len(records) < 2 or not self._apply_upsert_batch(
                        records, emb_mat=emb_mat):
                    for rec in records:
                        self._apply_upsert(rec, wal=False)
            return ticket

        ticket = await asyncio.to_thread(apply)
        if ticket is not None:
            # Durability before ack: a failed group fsync raises here
            # (500 / lost-ack). The rows WERE applied to memory and stay
            # queryable — their events sit in the WAL retry buffer, so a
            # later successful round makes them durable (replay is
            # upsert-idempotent). While the WAL stays degraded,
            # _check_durability refuses NEW writes with 503 and /healthz
            # fails (flush raises), bounding the non-durable divergence
            # window to the writes already in flight at first failure.
            await wal.wait_durable(ticket)
        await self._maybe_autocompact_async()

    async def upsert_fingerprint_batch(
        self,
        tenant_id: int,
        algorithm: str,
        record_ids: list[int],
        fingerprints: list[bytes],
        *,
        modality=None,
        config_hash: int = 0,
        format_version: int = 1,
    ) -> None:
        """Columnar fast path for the uniform batch-ingest shape: one
        WAL run append (array-direct encode, wal.encode_fp_run) + one
        vectorized store apply, with no per-record Record objects or
        event dicts (those measured ~25% of the 1-core batch-ingest
        host budget). Equivalent to upsert() of the corresponding
        Records — identical WAL bytes, catalog rows, and cache state —
        and FALLS BACK to that path whenever the batch doesn't qualify
        (mixed widths, dup/present rids, special algorithms), so the
        semantics including per-record errors never fork."""
        from ..core import Modality
        from ..core.types import _check_u32, _check_u64

        if modality is None:
            modality = Modality.IMAGE
        n = len(record_ids)
        if n != len(fingerprints):
            raise ValueError("record_ids and fingerprints length mismatch")
        if n == 0:
            return
        # range checks mirror Record.__post_init__ so library callers
        # get the same ValueError family the Record path raises
        _check_u32("tenant_id", tenant_id)
        _check_u64("config_hash", config_hash)
        wal = self._wal
        flen = len(fingerprints[0]) if isinstance(
            fingerprints[0], (bytes, bytearray)) else -1
        qualifies = (
            n >= 2 and flen > 0 and flen % 4 == 0
            and algorithm != LSH_ALGORITHM
            and algorithm not in AUDIO_LANDMARK_ALGOS
            and algorithm != HAITSMA_ALGORITHM
            and all(type(fp) is bytes and len(fp) == flen
                    for fp in fingerprints)
            and all(type(r) is int and 0 <= r <= 2**64 - 1
                    for r in record_ids)
        )

        def apply():
            self._check_durability(wal)
            with self._lock:
                # novelty gates under the SAME lock as the apply
                hcache = self._ham.get((tenant_id, algorithm))
                if hcache is not None and hcache.width != flen // 4:
                    return None  # width clash: per-record path errors
                seen: set[int] = set()
                for rid in record_ids:
                    if (rid in seen
                            or (tenant_id, rid) in self._records):
                        return None  # dup/update: per-record semantics
                    seen.add(rid)
                ticket = (wal.append_buffered_run(
                    tenant_id, modality.value, record_ids, fingerprints,
                    algorithm=algorithm, config_hash=config_hash,
                    format_version=format_version,
                ) if wal is not None else None)
                self._apply_fp_rows(
                    tenant_id, algorithm, record_ids, fingerprints, flen,
                    modality.value, config_hash, format_version,
                )
                return (ticket,)

        done = None
        if qualifies:
            done = await asyncio.to_thread(apply)
        if done is None:
            # slow path: exact legacy semantics (validation errors,
            # upserts of existing rids, mixed batches)
            await self.upsert([
                Record(tenant_id=tenant_id, record_id=rid,
                       modality=modality, algorithm=algorithm,
                       fingerprint=fp, config_hash=config_hash,
                       format_version=format_version)
                for rid, fp in zip(record_ids, fingerprints)
            ])
            return
        (ticket,) = done
        if ticket is not None:
            await wal.wait_durable(ticket)
        await self._maybe_autocompact_async()

    async def upsert_embedding_batch(
        self,
        tenant_id: int,
        algorithm: str,
        record_ids: list[int],
        embeddings,
        *,
        fingerprints: list[bytes] | None = None,
        modality=None,
        model_id: str | None = None,
        config_hash: int = 0,
        format_version: int = 1,
    ) -> None:
        """Columnar fast path for bulk vector loads: one WAL run append
        (array-direct encode, wal.encode_emb_run — the [n, d] f32
        matrix never becomes per-record float lists) + one vectorized
        store apply. `fingerprints=None` derives each row's f32-LE
        bytes, the representation fingerprint_semantic() records carry
        (modality/text.py). Equivalent to upsert() of the corresponding
        Records — identical WAL bytes, catalog rows, and cache state —
        and FALLS BACK to that path whenever the batch doesn't qualify
        (dup/present rids, special algorithms, width clash), so the
        semantics including per-record errors never fork. Measured
        ~9 us/record at 768-d vs ~346 us through generic upsert() on
        the 1-core host."""
        from ..core import Modality
        from ..core.types import _check_u32, _check_u64

        if modality is None:
            modality = Modality.IMAGE
        n = len(record_ids)
        mat = np.asarray(embeddings, np.float32)
        if mat.ndim != 2 or mat.shape[0] != n:
            raise ValueError(
                f"embeddings must be an [n={n}, d] matrix, got {mat.shape}"
            )
        if not np.all(np.isfinite(mat)):
            raise ValueError("embeddings must be finite")
        if n == 0:
            return
        if fingerprints is None:
            step = 4 * mat.shape[1]
            block = mat.astype("<f4", copy=False).tobytes()
            fingerprints = [
                block[i * step : (i + 1) * step] for i in range(n)
            ]
        if n != len(fingerprints):
            raise ValueError("record_ids and fingerprints length mismatch")
        _check_u32("tenant_id", tenant_id)
        _check_u64("config_hash", config_hash)
        wal = self._wal
        flen = len(fingerprints[0]) if isinstance(
            fingerprints[0], (bytes, bytearray)) else -1
        qualifies = (
            n >= 2 and flen > 0 and flen % 4 == 0
            and mat.shape[1] > 0
            and algorithm != LSH_ALGORITHM
            and algorithm not in AUDIO_LANDMARK_ALGOS
            and algorithm != HAITSMA_ALGORITHM
            and all(type(fp) is bytes and len(fp) == flen
                    for fp in fingerprints)
            and all(type(r) is int and 0 <= r <= 2**64 - 1
                    for r in record_ids)
        )

        def apply():
            self._check_durability(wal)
            with self._lock:
                # novelty gates under the SAME lock as the apply
                hcache = self._ham.get((tenant_id, algorithm))
                if hcache is not None and hcache.width != flen // 4:
                    return None  # width clash: per-record path errors
                seen: set[int] = set()
                for rid in record_ids:
                    if (rid in seen
                            or (tenant_id, rid) in self._records):
                        return None  # dup/update: per-record semantics
                    seen.add(rid)
                ticket = (wal.append_buffered_emb_run(
                    tenant_id, modality.value, record_ids, fingerprints,
                    mat, algorithm=algorithm, model_id=model_id,
                    config_hash=config_hash,
                    format_version=format_version,
                ) if wal is not None else None)
                self._apply_emb_rows(
                    tenant_id, algorithm, record_ids, fingerprints, flen,
                    modality.value, config_hash, format_version,
                    model_id=model_id, emb_mat=mat,
                )
                return (ticket,)

        done = None
        if qualifies:
            done = await asyncio.to_thread(apply)
        if done is None:
            # slow path: exact legacy semantics (validation errors,
            # upserts of existing rids, special algorithms)
            await self.upsert([
                Record(tenant_id=tenant_id, record_id=rid,
                       modality=modality, algorithm=algorithm,
                       fingerprint=bytes(fp), config_hash=config_hash,
                       format_version=format_version,
                       embedding=mat[i].tolist(), model_id=model_id)
                for i, (rid, fp) in enumerate(
                    zip(record_ids, fingerprints))
            ])
            return
        (ticket,) = done
        if ticket is not None:
            await wal.wait_durable(ticket)
        await self._maybe_autocompact_async()

    def _apply_fp_rows(self, t: int, alg: str, rids: list[int],
                       fps: list[bytes], flen: int, mod_value: str,
                       cfg: int, fmt: int, *, meta: bytes = b"",
                       fp_block: bytes | None = None) -> None:
        """Store apply for a gated uniform fingerprint run (see
        upsert_fingerprint_batch and _replay_fp_run; caller holds the
        lock — or owns the store single-threaded during replay — and
        has verified novelty + width fit). Row content matches
        _apply_upsert_batch's exactly. `fp_block`, when given, is the
        pre-concatenated fingerprint bytes (replay hands the WAL run
        column through without re-joining)."""
        hcache = self._ham.get((t, alg))
        if hcache is None:
            hcache = _HamCache(words=flen // 4)
            self._ham[(t, alg)] = hcache
        packed = np.frombuffer(
            b"".join(fps) if fp_block is None else fp_block, "<u4"
        ).reshape(len(fps), flen // 4)
        trows = self._tenant_rows.setdefault(t, {})
        records = self._records
        for rid, fp in zip(rids, fps):
            trows[rid] = None
            records[(t, rid)] = {
                "modality": mod_value,
                "algorithm": alg,
                "config_hash": cfg,
                "format_version": fmt,
                "fingerprint": fp,
                "embedding": None,
                "model_id": None,
                "metadata": meta,
                "text": None,
            }
        hcache.upsert_many(rids, packed)

    def _apply_emb_rows(self, t: int, alg: str, rids: list[int],
                        fps: list[bytes], flen: int, mod_value: str,
                        cfg: int, fmt: int, *, meta: bytes = b"",
                        model_id: str | None = None,
                        emb_mat: np.ndarray = None,
                        fp_block: bytes | None = None) -> None:
        """_apply_fp_rows for a uniform embedding run (see
        _replay_emb_run; caller holds the lock — or owns the store
        single-threaded during replay — and has verified novelty, width
        fit, and finite floats). Row content matches
        _apply_upsert_batch_emb's exactly (embeddings stored as f32
        rows, see _apply_upsert)."""
        hcache = self._ham.get((t, alg))
        if hcache is None:
            hcache = _HamCache(words=flen // 4)
            self._ham[(t, alg)] = hcache
        packed = np.frombuffer(
            b"".join(fps) if fp_block is None else fp_block, "<u4"
        ).reshape(len(fps), flen // 4)
        trows = self._tenant_rows.setdefault(t, {})
        records = self._records
        for rid, fp, emb in zip(rids, fps, emb_mat):
            trows[rid] = None
            records[(t, rid)] = {
                "modality": mod_value,
                "algorithm": alg,
                "config_hash": cfg,
                "format_version": fmt,
                "fingerprint": fp,
                "embedding": emb,
                "model_id": model_id,
                "metadata": meta,
                "text": None,
            }
        cache = self._vec.setdefault(
            (t, emb_mat.shape[1]), _VecCache(emb_mat.shape[1]))
        cache.upsert_many(
            rids, emb_mat,
            tag=(self._tag_code(alg), self._tag_code(model_id)),
        )
        hcache.upsert_many(rids, packed)

    @staticmethod
    def _check_durability(wal) -> None:
        """Ingest admission gate: refuse new writes while the WAL cannot
        commit (persistent fsync failure, e.g. ENOSPC). Without this,
        memory-applied rows would accumulate unboundedly ahead of a log
        that never fsyncs — served but lost on restart."""
        if wal is not None and getattr(wal, "degraded", False):
            raise IngestError(
                "write-ahead log durability failure: ingest refused until "
                "a WAL fsync round succeeds (check disk space/health)"
            )

    async def delete(self, tenant_id: int, record_ids: list[int]) -> None:
        wal = self._wal

        def apply():
            self._check_durability(wal)
            with self._lock:
                ticket = (wal.append_buffered(
                    [{"op": "delete", "tenant_id": tenant_id,
                      "record_ids": record_ids}]
                ) if wal is not None else None)
                for rid in record_ids:
                    self._apply_delete(tenant_id, rid, wal=False)
            return ticket

        ticket = await asyncio.to_thread(apply)
        if ticket is not None:
            await wal.wait_durable(ticket)
        await self._maybe_autocompact_async()

    def _shardings(self):
        """(matrix, row-vector) NamedShardings, or (None, None) single-chip."""
        if self._mesh is None:
            return None, None
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        return (
            NamedSharding(self._mesh, P(self._mesh_axes, None)),
            NamedSharding(self._mesh, P(self._mesh_axes)),
        )

    def _put_matrix(self, arr: np.ndarray):
        """HBM placement: row-sharded over the mesh when serving is
        sharded, plain single-device upload otherwise."""
        import jax
        import jax.numpy as jnp

        ms, _ = self._shardings()
        return jax.device_put(arr, ms) if ms is not None else jnp.asarray(arr)

    def _put_rowvec(self, arr: np.ndarray):
        import jax
        import jax.numpy as jnp

        _, vs = self._shardings()
        return jax.device_put(arr, vs) if vs is not None else jnp.asarray(arr)

    def _put_tiled(self, arr):
        """Placement for the lane-tiled sketch [C/128, SKETCH_WORDS, 128]
        (SKETCH_WORDS = SKETCH_BITS/32, 24 at the 768-bit width): sharded
        on the tile-row axis (row blocks of 128 align with any
        power-of-two shard split)."""
        if self._mesh is None:
            return arr
        import jax
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        return jax.device_put(
            arr, NamedSharding(self._mesh, P(self._mesh_axes, None, None))
        )

    def _device_valid(self, cap: int, n: int):
        if self._mesh is not None:
            return self._put_rowvec(np.arange(cap) < n)
        import jax.numpy as jnp

        # built on device (no host transfer): rows below n are live
        return jnp.arange(cap) < n

    def _scatter_rows(self, m, ridx, vals):
        """In-place-style row update that PRESERVES the array's sharding
        (eager .at[].set keeps it via propagation; device_put is a no-op
        when the sharding already matches, a reshard if it drifted)."""
        import jax

        out = m.at[ridx].set(vals)
        if self._mesh is not None:
            out = jax.device_put(out, m.sharding)
        return out

    def _device_vec(self, cache: _RowCache):
        """Sync the per-tenant vector matrix to the device(s).

        Full upload on first build / capacity growth; otherwise only the
        rows touched since the last sync transfer (scatter update), so a
        write between queries costs O(changed rows), not O(matrix).
        Under a mesh the matrix is row-sharded (P("d", None)) so each
        chip holds cap/n rows in HBM.
        """
        import jax.numpy as jnp

        cap = cache.data.shape[0]
        quant = self.knn_quant in ("int8", "sketch", "int4", "int2")
        sketch_on = self._sketch_on()
        # odd dims can't nibble-pair (and int2 needs dim % 4): the cache
        # simply omits the packed parts and the dispatch (gated on
        # int4_supported / int2_supported) serves exact
        int4_on = self._int4_on() and cache.data.shape[1] % 2 == 0
        int2_on = self._int2_on() and cache.data.shape[1] % 4 == 0
        packed_on = int4_on or int2_on
        pack_full = (knn_ops.pack_int2_cols_chunked if int2_on
                     else knn_ops.pack_int4_cols_chunked)
        pack_rows = (knn_ops.pack_int2_cols if int2_on
                     else knn_ops.pack_int4_cols)
        packed_min_cap = 2 * (knn_ops.INT2_MIN_POOL if int2_on
                              else knn_ops.INT4_MIN_POOL)
        packed_den = 4 if int2_on else 2
        if cache.dirty or cache.device is None:
            if quant:
                q8, row_norm = knn_ops.quantize_rows_int8(cache.data)
                q8m = self._put_matrix(q8)
                parts = [q8m, self._put_rowvec(row_norm)]
                if packed_on:
                    if cap > packed_min_cap:
                        # packed columns ([D/2 or D/4, cap] int8) +
                        # 1/|packed row|; chunked pack over the already-
                        # resident q8m (the one-shot pack stages a full
                        # f32 copy — OOM at multi-GB capacities)
                        packed_t, inv_np = pack_full(q8m)
                        parts.append(self._put_packed(packed_t))
                        parts.append(self._put_rowvec(inv_np))
                    else:
                        # below 2*MIN_POOL every k gives pool*2 >= cap,
                        # so the kernel's exhaustive branch never reads
                        # the packed columns — zero-width placeholders
                        # keep the 5-tuple layout stable without pack
                        # compute, device transfer, or the +50%/+25% HBM
                        # copy (growth past the threshold triggers a
                        # full rebuild)
                        parts.append(
                            jnp.zeros((cache.data.shape[1] // packed_den,
                                       0), jnp.int8)
                        )
                        parts.append(jnp.zeros((0,), jnp.float32))
                if sketch_on:
                    planes = self._sketch_planes(cache.data.shape[1])
                    if self._mesh is not None:
                        # one sharded matmul: XLA keeps the row sharding
                        # through dot+pack, so each chip sketches only
                        # its own rows; re-pin the lane-tiled layout
                        sk = knn_ops.tile_sketch(
                            knn_ops.sketch_rows_int8(q8m, planes)
                        )
                    else:
                        sk = knn_ops.tile_sketch(
                            knn_ops.build_sketch_chunked(q8m, planes)
                        )
                    parts.append(self._put_tiled(sk))
                parts.append(self._device_valid(cap, cache.n))
                cache.device = tuple(parts)
            else:
                cache.device = (
                    self._put_matrix(cache.data),
                    self._device_valid(cap, cache.n),
                )
            cache.dirty = False
            cache.pending = []
        elif cache.pending:
            rows = sorted(set(cache.pending))
            ridx = jnp.asarray(rows)
            if quant:
                q8u, rnu = knn_ops.quantize_rows_int8(cache.data[rows])
                m, rn = cache.device[0], cache.device[1]
                q8u_dev = jnp.asarray(q8u)
                parts = [
                    self._scatter_rows(m, ridx, q8u_dev),
                    self._scatter_rows(rn, ridx, jnp.asarray(rnu)),
                ]
                if packed_on:
                    if cache.device[2].shape[1]:
                        # column scatter into the packed [D/2|D/4, cap]
                        # layout (row i of the catalog is COLUMN i) +
                        # inv-norm rows
                        pk, inv = pack_rows(q8u_dev)
                        packed = cache.device[2].at[:, ridx].set(pk)
                        if self._mesh is not None:
                            import jax

                            packed = jax.device_put(
                                packed, cache.device[2].sharding
                            )
                        parts.append(packed)
                        parts.append(
                            self._scatter_rows(cache.device[3], ridx, inv)
                        )
                    else:  # zero-width placeholders: nothing to update
                        parts.append(cache.device[2])
                        parts.append(cache.device[3])
                if sketch_on:
                    sk_rows = knn_ops.sketch_rows_int8(
                        q8u_dev, self._sketch_planes(cache.data.shape[1])
                    ).astype(jnp.int32)  # [n, SKETCH_WORDS]
                    # lane-tiled scatter: row i lives at
                    # [i // 128, :, i % 128]
                    tiled = cache.device[2]
                    r_i = ridx // knn_ops.SKETCH_LANES
                    l_i = ridx % knn_ops.SKETCH_LANES
                    w_i = jnp.arange(knn_ops.SKETCH_WORDS)
                    upd = tiled.at[
                        r_i[:, None], w_i[None, :], l_i[:, None]
                    ].set(sk_rows)
                    parts.append(self._put_tiled(upd))
                parts.append(self._device_valid(cap, cache.n))
                cache.device = tuple(parts)
            else:
                m, _v = cache.device
                cache.device = (
                    self._scatter_rows(m, ridx, jnp.asarray(cache.data[rows])),
                    self._device_valid(cap, cache.n),
                )
            cache.pending = []
        return cache.device

    def _sketch_on(self) -> bool:
        return self.knn_quant == "sketch"

    def _int4_on(self) -> bool:
        return self.knn_quant == "int4"

    def _int2_on(self) -> bool:
        return self.knn_quant == "int2"

    def _put_packed(self, arr):
        """Placement for the packed-int4 [D/2, cap] columns: catalog
        rows ride the LANE axis, so under a mesh the shard split is on
        axis 1 (power-of-two capacities divide evenly)."""
        if self._mesh is None:
            return arr
        import jax
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        return jax.device_put(
            arr, NamedSharding(self._mesh, P(None, self._mesh_axes))
        )

    def _int4_worth_it(self, cap: int, dim: int, k: int,
                       fused: bool = True) -> bool:
        """Cost-model gate for the int4 prefilter, per-shard like
        _sketch_worth_it: serve it only when the modeled pipeline beats
        the exhaustive int8 scan at this capacity. fused=False models
        the slower filtered (valid-array) path."""
        nsh = self._n_shards()
        cap_l = max(1, cap // nsh)
        return knn_ops.int4_beats_exact(
            cap_l, dim, knn_ops.int4_pool(cap_l, k), fused=fused
        )

    def _int2_worth_it(self, cap: int, dim: int, k: int,
                       fused: bool = True) -> bool:
        """Cost-model gate for the int2 prefilter (per-shard, like
        _int4_worth_it)."""
        nsh = self._n_shards()
        cap_l = max(1, cap // nsh)
        return knn_ops.int2_beats_exact(
            cap_l, dim, knn_ops.int2_pool(cap_l, k), fused=fused
        )

    def _int4_batch_worth_it(self, cap: int, dim: int, k: int,
                             q: int) -> bool:
        """Dispatch gate for the BATCHED int4 prefilter, per-shard like
        _int4_worth_it: the packed cache must be real (capacities at or
        below the placeholder threshold keep a zero-width packed cache —
        the batch pool is smaller than the single-query pool, so the
        kernel's own exhaustive short-circuit does NOT cover the whole
        placeholder range) and the batched cost model must say the
        packed scan beats the exact GEMM at the per-shard capacity."""
        if cap <= 2 * knn_ops.INT4_MIN_POOL:
            return False  # zero-width placeholder packed cache
        nsh = self._n_shards()
        cap_l = max(1, cap // nsh)
        return knn_ops.int4_batch_beats_exact(
            cap_l, dim, q, knn_ops.int4_batch_pool(cap_l, k)
        )

    def _int2_batch_worth_it(self, cap: int, dim: int, k: int,
                             q: int) -> bool:
        """Dispatch gate for the BATCHED int2 prefilter — the int4
        batch gate with the quarter-byte models and the int2 cache's
        own placeholder threshold."""
        if cap <= 2 * knn_ops.INT2_MIN_POOL:
            return False  # zero-width placeholder packed cache
        nsh = self._n_shards()
        cap_l = max(1, cap // nsh)
        return knn_ops.int2_batch_beats_exact(
            cap_l, dim, q, knn_ops.int2_batch_pool(cap_l, k)
        )

    def _sketch_planes(self, dim: int):
        import jax.numpy as jnp

        p = self._planes.get(dim)
        if p is None:
            p = jnp.asarray(knn_ops.sketch_planes(dim))
            self._planes[dim] = p
        return p

    def _device_ham(self, cache: _RowCache):
        import jax.numpy as jnp

        cap = cache.data.shape[0]
        if cache.dirty or cache.device is None:
            cache.device = (
                self._put_matrix(cache.data),
                self._device_valid(cap, cache.n),
            )
            cache.dirty = False
            cache.pending = []
        elif cache.pending:
            rows = sorted(set(cache.pending))
            ridx = jnp.asarray(rows)
            m, _v = cache.device
            cache.device = (
                self._scatter_rows(m, ridx, jnp.asarray(cache.data[rows])),
                self._device_valid(cap, cache.n),
            )
            cache.pending = []
        return cache.device

    @staticmethod
    def _fused_pool_ok(cap: int, n: int, k: int) -> bool:
        """THE dispatch predicate for the fused partial-reduce candidate
        path — the query paths and the approximate-markers must agree,
        so it lives in exactly one place."""
        from ..ops import pallas_scan

        tile = pallas_scan.ROWS_PER_TILE * pallas_scan.LANES
        n_candidates = (cap // tile) * pallas_scan.LANES
        return cap % tile == 0 and min(k, n) <= min(16, n_candidates)

    def _n_shards(self) -> int:
        return int(self._mesh.devices.size) if self._mesh is not None else 1

    def _sketch_worth_it(self, q8m_cap: int, dim: int, k: int,
                         pool_frac: "float | None") -> bool:
        """Cost-model gate for the sketch prefilter: serve it only when
        the modeled sketch pipeline beats the exhaustive int8 scan at
        this (capacity, pool). Under a mesh both capacity and pool
        divide by the shard count (sharded_knn.py per-shard pool), so
        the model runs on per-shard values — mirroring what each chip
        actually executes."""
        cand = knn_ops.sketch_pool(q8m_cap, k, pool_frac)
        nsh = self._n_shards()
        cap_l = max(1, q8m_cap // nsh)
        # per-shard pool mirrors _sharded_cosine_sketch_impl's floor
        cand_l = min(cap_l, max(512, 16 * k, -(-cand * cap_l // q8m_cap))) \
            if nsh > 1 else cand
        return knn_ops.sketch_beats_exact(cap_l, dim, cand_l)

    def _int8_single_topk(self, q, q8m, row_norm, valid, kk: int, n: int,
                          exact: bool = False,
                          n_prefix: "int | None" = None):
        """Exact single-query int8 cosine top-k (single chip): the fused
        GEMV + pallas partial-reduce when shapes allow (near-exact for
        k <= 16, exact top-1 — the exact kernel's lax.top_k over the
        full row count costs ~7x more at 10M), else the exact kernel.
        exact=True forces the exhaustive kernel unconditionally.
        n_prefix asserts `valid == arange < n_prefix` (no filters) —
        enabling the fused normalize kernel straight off the GEMV
        output (no [C] f32 mask/divide pass)."""
        from ..ops import pallas_scan

        if not exact and self._fused_pool_ok(q8m.shape[0], n, kk):
            import jax
            import jax.numpy as jnp

            qa = float(np.abs(q).max())
            qs = 1.0 if qa == 0.0 else qa / 127.0
            qq = jnp.asarray(
                np.clip(np.round(q / qs), -127, 127).astype(np.int8)
            )
            qn = float(np.linalg.norm(np.asarray(qq, np.float32)))
            dots = jax.lax.dot_general(
                qq[None, :], q8m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )[0]
            if n_prefix is not None:
                s1, i1 = pallas_scan.dots_norm_topk_fused(
                    dots, row_norm, jnp.int32(n_prefix),
                    jnp.float32(1.0 / max(qn, 1e-9)), kk,
                )
                return s1[None, :], i1[None, :]
            denom = max(qn, 1e-9) * jnp.maximum(row_norm, 1e-9)
            ok = valid & (row_norm > 0.0)
            sc = jnp.where(ok, dots.astype(jnp.float32) / denom, -jnp.inf)
            s1, i1 = pallas_scan.scores_topk_fused(sc, kk)
            return s1[None, :], i1[None, :]
        return knn_ops.cosine_topk_int8(q[None], q8m, row_norm, valid, kk)

    def knn_is_approximate(self, tenant_id: int, dim: int, k: int,
                           batch: bool = False,
                           pool_frac: "float | None" = None,
                           exact: bool = False,
                           batch_q: int = 1,
                           filtered: bool = False) -> bool:
        """True when a (dim, k) vector query rides an approximate path —
        the fused partial-reduce candidates (near-exact for k <= 16,
        exact top-1; collision odds in ops/pallas_scan.py) or a
        prefilter pool. Lets the serving layer mark responses instead of
        silently changing semantics under UCFP_KNN_QUANT. `batch=True`
        mirrors knn_batch's dispatch: batched queries never use the
        sketch prefilter (the int8 GEMM is exact up to the fused
        candidate reduce); under int4 mode an UNFILTERED batch of
        `batch_q` queries rides the batched packed scan when the cost
        model prefers it (`filtered` batches stay on the exact GEMM)."""
        if exact:
            # the exact flag pins the dispatch to the exhaustive kernels
            # on every path below — nothing approximate can serve it
            return False
        cache = self._vec.get((tenant_id, dim))
        if cache is None or cache.n == 0 or cache.data is None:
            return False
        # every branch below gates on kk = min(k, n), NOT the raw
        # request k: knn()/knn_batch() dispatch on kk, and after deletes
        # shrink n below k the two would otherwise straddle the
        # cost-model boundary — an approximate pooled answer would be
        # served UNMARKED (the batch path fixed this first; the
        # single-query branches had the same straddle)
        kk = min(k, cache.n)
        if self._sketch_on() and not batch:
            cap = cache.data.shape[0]
            if not self._sketch_worth_it(cap, dim, kk, pool_frac):
                # the cost model routed this query to the EXACT int8
                # path (sketch must never serve slower than exact) —
                # fall through to that path's own marker below
                pass
            else:
                # candidate recall bounds result quality whenever the
                # pool does not cover the whole catalog (under a mesh
                # each shard keeps its own pool, so the aggregate only
                # grows — this marker stays conservative)
                # mirrors cosine_sketch_topk's dispatch exactly: the
                # kernel rescores EVERY row (exact) when pool * 2 >=
                # capacity, and capacity <= 2n makes pool >= n
                # impossible below that line
                return knn_ops.sketch_pool(cap, kk, pool_frac) * 2 < cap
        kk_b = kk
        if self._int4_on() and batch and not filtered \
                and self._int4_batch_worth_it(
                    cache.data.shape[0], dim, kk_b, batch_q):
            # mirrors knn_batch's packed-scan branch PER SHARD: each
            # shard keeps its own batch pool and rescores its whole
            # shard exactly when the pool covers it
            cap = cache.data.shape[0]
            cap_l = max(1, cap // self._n_shards())
            return knn_ops.int4_batch_pool(cap_l, kk_b) * 2 < cap_l
        if self._int2_on() and batch and not filtered \
                and self._int2_batch_worth_it(
                    cache.data.shape[0], dim, kk_b, batch_q):
            # same per-shard batch-pool rule for the int2 packed scan
            cap = cache.data.shape[0]
            cap_l = max(1, cap // self._n_shards())
            return knn_ops.int2_batch_pool(cap_l, kk_b) * 2 < cap_l
        if (not batch and not exact and self._qbatch_ms > 0
                and pool_frac is None and self._int4_on()):
            # query micro-batching may coalesce this single query onto
            # the batched packed scan, whose dispatch depends on the
            # runtime batch size the marker cannot know — stay
            # conservative with the worst-case (full) batch
            kk_s = kk
            if self._int4_batch_worth_it(cache.data.shape[0], dim,
                                         kk_s, 64):
                cap_l = max(1, cache.data.shape[0] // self._n_shards())
                if knn_ops.int4_batch_pool(cap_l, kk_s) * 2 < cap_l:
                    return True
        if (not batch and not exact and self._qbatch_ms > 0
                and pool_frac is None and self._int2_on()):
            # int2 twin of the micro-batching worst-case rule above
            kk_s = kk
            if self._int2_batch_worth_it(cache.data.shape[0], dim,
                                         kk_s, 64):
                cap_l = max(1, cache.data.shape[0] // self._n_shards())
                if knn_ops.int2_batch_pool(cap_l, kk_s) * 2 < cap_l:
                    return True
        if self._int4_on() and not batch:
            cap = cache.data.shape[0]
            if self._int4_worth_it(cap, dim, kk):
                # mirrors the kernel's own dispatch PER SHARD: each
                # shard keeps a full fixed pool and rescores its whole
                # shard exhaustively (exact) when pool * 2 >= its local
                # capacity — so the merged answer is only approximate
                # when the per-shard pools actually threshold
                nsh = self._n_shards()
                cap_l = max(1, cap // nsh)
                return knn_ops.int4_pool(cap_l, kk) * 2 < cap_l
            # cost model routed to the exact path; fall through to its
            # marker below
        if self._int2_on() and not batch:
            cap = cache.data.shape[0]
            if self._int2_worth_it(cap, dim, kk):
                # same per-shard threshold rule as the int4 marker
                nsh = self._n_shards()
                cap_l = max(1, cap // nsh)
                return knn_ops.int2_pool(cap_l, kk) * 2 < cap_l
        if self._mesh is not None:
            return False
        return self._fused_pool_ok(cache.data.shape[0], cache.n, kk)

    def fingerprint_is_approximate(self, tenant_id: int, algorithm: str,
                                   k: int) -> bool:
        """Same marker for the fused Hamming serving path."""
        from ..ops import pallas_scan

        if self._mesh is not None:
            return False
        cache = self._ham.get((tenant_id, algorithm))
        if cache is None or cache.n == 0 or cache.data is None:
            return False
        # mirrors knn_fingerprint_batch's dispatch: wide fingerprints
        # (W > the fused kernel's VMEM budget) serve the exact kernel
        if cache.width > pallas_scan.MAX_FUSED_HAMMING_WORDS:
            return False
        return self._fused_pool_ok(cache.data.shape[0], cache.n,
                                   min(k, cache.n))

    async def knn(
        self,
        tenant_id: int,
        query: list[float],
        k: int,
        filter: Optional[dict] = None,
        pool_frac: Optional[float] = None,
        exact: bool = False,
    ) -> list[Hit]:
        """Cosine top-k, semantics matching mod.rs:268-360: empty query or
        k=0 or zero-norm query -> empty; only vectors of matching dim.

        exact: force the fully-exact scan — skips the sketch prefilter
        and the fused partial-reduce, serving the exhaustive kernel for
        the active quant mode (never marked approximate).

        filter: optional {"algorithm": str, "model_id": str} — rows are
        masked on DEVICE (exact filtered top-k, not post-filtering), a
        capability beyond the reference's unimplemented filter contract.
        Unsupported shapes still surface UnsupportedError.

        pool_frac: per-request sketch rescore-pool override (sketch mode
        only). Quantized to core.POOL_FRAC_TIERS here — each distinct
        value compiles its own kernel, so the ladder must hold for
        direct backend callers, not just Query/HTTP."""
        if not query or k == 0:
            return []
        from ..core import quantize_pool_frac

        pool_frac = quantize_pool_frac(pool_frac)
        q = np.asarray(query, np.float32)
        if float(np.linalg.norm(q)) == 0.0:
            return []
        cache = self._vec.get((tenant_id, len(query)))
        if cache is None or cache.n == 0:
            from .backend import validate_filter

            validate_filter(filter)  # bad shapes surface even on empty
            return []
        if filter is not None:
            from .backend import validate_filter

            validate_filter(filter)  # surface bad shapes on the caller path
        if (self._qbatch_ms > 0 and filter is None and not exact
                and pool_frac is None):
            # opt-in micro-batching: coalesce concurrent plain queries
            # into one batched dispatch (see __init__). Gated AFTER the
            # cheap host early-outs so degenerate queries (zero-norm,
            # empty cache) never pay the batching window
            return await self._submit_query_batched(
                tenant_id, list(query), k
            )

        def work(_attempt=0, _last=2):
            with self._lock:
                # filter mask computed under the SAME lock as the device
                # snapshot: a concurrent capacity-doubling upsert would
                # otherwise leave mask length != device valid length
                flt_mask = (
                    self._vector_filter_mask(cache, filter)
                    if filter is not None else True
                )
                if flt_mask is None:
                    return []  # filter names a value no record carries
                dev = self._device_vec(cache)
                if flt_mask is not True:
                    # AND the filter rows into the validity mask: every
                    # downstream kernel already honors `valid`
                    dev = (*dev[:-1], dev[-1] & self._put_rowvec(flt_mask))
                # rid mapping is DEFERRED: copying the rid list here cost
                # O(catalog) under the writer lock (118 ms at 10M rows —
                # 20x the device scan). Instead snapshot the move
                # generation and resolve the <=k hit indices after the
                # kernel; a concurrent delete bumps gen and the query
                # retries (final attempt keeps the old full-copy
                # semantics so progress is guaranteed).
                gen_snap = cache.gen
                rids_copy = list(cache.rids) if _attempt == _last else None
                # prefix length captured UNDER the lock, consistent with
                # the dev snapshot: a concurrent delete swaps rows
                # and decrements n, so reading cache.n after release
                # could mask a live row / unmask a deleted one
                n_snap = cache.n
            kk = min(k, n_snap)
            if self._mesh is not None:
                # ICI-sharded serving: each chip scans its row shard,
                # per-chip top-k + all_gather merge (sharded_knn.py)
                from ..parallel import sharded_knn

                if self.knn_quant == "sketch" and not exact \
                        and self._sketch_worth_it(
                    q8m_cap=dev[0].shape[0], dim=len(query), k=kk,
                    pool_frac=pool_frac,
                ):
                    import jax.numpy as jnp

                    q8m, row_norm, sketch, valid = dev
                    cand = knn_ops.sketch_pool(q8m.shape[0], kk, pool_frac)
                    s1, i1 = sharded_knn.sharded_cosine_sketch_topk(
                        jnp.asarray(q), self._sketch_planes(len(query)),
                        q8m, row_norm, sketch, valid, kk, cand,
                        self._mesh, self._mesh_axes,
                    )
                    scores, idx = s1[None, :], i1[None, :]
                elif self._int4_on() and not exact and self._int4_worth_it(
                    dev[0].shape[0], len(query), kk,
                    fused=flt_mask is True,
                ):
                    import jax.numpy as jnp

                    q8m, row_norm, packed_t, inv_n4, valid = dev
                    s1, i1 = sharded_knn.sharded_cosine_int4_topk(
                        jnp.asarray(q), q8m, row_norm, packed_t, inv_n4,
                        valid, kk, self._mesh, self._mesh_axes,
                        # unfiltered queries assert prefix validity ->
                        # every shard runs the fused kernel
                        n_valid=(n_snap if flt_mask is True else None),
                    )
                    scores, idx = s1[None, :], i1[None, :]
                elif self._int2_on() and not exact and self._int2_worth_it(
                    dev[0].shape[0], len(query), kk,
                    fused=flt_mask is True,
                ):
                    import jax.numpy as jnp

                    q8m, row_norm, packed_t, inv_n2, valid = dev
                    s1, i1 = sharded_knn.sharded_cosine_int2_topk(
                        jnp.asarray(q), q8m, row_norm, packed_t, inv_n2,
                        valid, kk, self._mesh, self._mesh_axes,
                        n_valid=(n_snap if flt_mask is True else None),
                    )
                    scores, idx = s1[None, :], i1[None, :]
                elif self.knn_quant in ("int8", "sketch", "int4", "int2"):
                    # exact sharded int8 scan — also the sketch/int4/int2
                    # fallback when the cost model says exact wins
                    # (approximate tiers never serve slower than exact)
                    q8m, row_norm, valid = dev[0], dev[1], dev[-1]
                    scores, idx = sharded_knn.sharded_cosine_int8_batch_topk(
                        q[None], q8m, row_norm, valid, kk, self._mesh,
                        self._mesh_axes,
                    )
                else:
                    matrix, valid = dev
                    scores, idx = sharded_knn.sharded_cosine_topk(
                        q[None], matrix, valid, kk, self._mesh,
                        self._mesh_axes,
                    )
            elif self._sketch_on() and not exact and self._sketch_worth_it(
                q8m_cap=dev[0].shape[0], dim=len(query), k=kk,
                pool_frac=pool_frac,
            ):
                import jax.numpy as jnp

                q8m, row_norm, sketch, valid = dev
                cand = knn_ops.sketch_pool(q8m.shape[0], kk, pool_frac)
                s1, i1 = knn_ops.cosine_sketch_topk(
                    jnp.asarray(q), self._sketch_planes(len(query)),
                    q8m, row_norm, sketch, valid, kk, cand,
                )
                scores, idx = s1[None, :], i1[None, :]
            elif self._int4_on() and not exact and self._int4_worth_it(
                dev[0].shape[0], len(query), kk,
                fused=flt_mask is True,
            ):
                import jax.numpy as jnp

                q8m, row_norm, packed_t, inv_n4, valid = dev
                # unfiltered queries assert prefix validity, unlocking
                # the fused masked-scores kernel (no separate mask pass)
                npre = (jnp.int32(n_snap) if flt_mask is True else None)
                s1, i1 = knn_ops.cosine_int4_topk(
                    jnp.asarray(q), q8m, row_norm, packed_t, inv_n4,
                    valid, kk, knn_ops.int4_pool(q8m.shape[0], kk),
                    n_valid=npre,
                )
                scores, idx = s1[None, :], i1[None, :]
            elif self._int2_on() and not exact and self._int2_worth_it(
                dev[0].shape[0], len(query), kk,
                fused=flt_mask is True,
            ):
                import jax.numpy as jnp

                q8m, row_norm, packed_t, inv_n2, valid = dev
                npre = (jnp.int32(n_snap) if flt_mask is True else None)
                s1, i1 = knn_ops.cosine_int2_topk(
                    jnp.asarray(q), q8m, row_norm, packed_t, inv_n2,
                    valid, kk, knn_ops.int2_pool(q8m.shape[0], kk),
                    n_valid=npre,
                )
                scores, idx = s1[None, :], i1[None, :]
            elif self.knn_quant in ("int8", "sketch", "int4", "int2"):
                # exact int8 scan — also the sketch/int4/int2 fallback
                # when the cost model says exact wins at this capacity
                q8m, row_norm, valid = dev[0], dev[1], dev[-1]
                scores, idx = self._int8_single_topk(
                    q, q8m, row_norm, valid, kk, n_snap, exact=exact,
                    n_prefix=(n_snap if flt_mask is True else None),
                )
            else:
                matrix, valid = dev
                if not exact and self._fused_pool_ok(
                        matrix.shape[0], n_snap, kk):
                    scores, idx = knn_ops.cosine_topk_fused(
                        q[None], matrix, valid, kk)
                else:
                    scores, idx = knn_ops.cosine_topk(q[None], matrix, valid, kk)
            scores = np.asarray(scores[0])
            idx = np.asarray(idx[0])
            if rids_copy is not None:
                out = [(rids_copy[int(i)], float(s))
                       for s, i in zip(scores, idx) if np.isfinite(s)]
            else:
                with self._lock:
                    moved = cache.gen != gen_snap
                    if not moved:
                        # gen unchanged => no row moved and the rid
                        # list only grew, so every kernel index
                        # (< n_snap) still names its snapshot-time
                        # record
                        out = [(cache.rids[int(i)], float(s))
                               for s, i in zip(scores, idx)
                               if np.isfinite(s)]
                if moved:
                    # a delete moved rows mid-query: fresh snapshot
                    # (recurse OUTSIDE the lock — it is not reentrant)
                    return work(_attempt + 1)
            # descending score, ties by ascending record id
            out.sort(key=lambda t: (-t[1], t[0]))
            return [
                Hit(record_id=rid, score=s, source=HitSource.VECTOR)
                for rid, s in out
            ]

        return await asyncio.to_thread(work)

    def _deadline_batcher(self, kind: str, run):
        """Per-event-loop DeadlineBatcher registry. The batcher holds
        loop-bound asyncio primitives, so each running loop gets its
        own instance (servers run one loop; tests and multi-threaded
        direct callers run many — a shared instance would await a Lock
        bound to a foreign loop or set futures cross-thread). The
        registry swap happens under the backend's threading lock;
        closed loops' entries are pruned opportunistically."""
        import asyncio as _aio

        loop = _aio.get_running_loop()
        with self._lock:
            reg = self._batchers.setdefault(kind, {})
            b = reg.get(loop)
            if b is None:
                for dead in [lp for lp in reg if lp.is_closed()]:
                    del reg[dead]
                from ..ingest.batcher import DeadlineBatcher

                b = DeadlineBatcher(
                    run, max_batch=self._qbatch_max,
                    max_delay_ms=self._qbatch_ms
                )
                reg[loop] = b
        return b

    def _pad_pow2_list(self, payloads: list) -> list:
        """Pad a coalesced batch to its compile bucket: XLA traces one
        program per distinct Q, and a deadline batcher produces
        arbitrary sizes — unpadded, a busy server would compile up to
        64 variants per bucket (minutes each through a remote runtime).
        UCFP_QBATCH_PAD=pow2 (default) pads to the next power of two
        (O(log max) buckets); "max" pads every flush to UCFP_QBATCH_MAX
        (ONE bucket — for runtimes where every compile is minutes). The
        catalog scan dominates the cost either way, so padding rows (a
        repeat of the first payload, results sliced off by the caller)
        are nearly free."""
        n = len(payloads)
        if self._qbatch_pad == "max":
            qb = self._qbatch_max
        else:
            qb = 1 << (n - 1).bit_length() if n > 1 else 1
        return payloads + [payloads[0]] * (qb - n)

    async def _run_vec_bucket(self, bucket, payloads):
        t, _dim, kk = bucket
        with self._lock:  # multiple event-loop threads flush concurrently
            self._qbatch_flushes += 1
            self._qbatch_items += len(payloads)
        res = await self.knn_batch(t, self._pad_pow2_list(payloads), kk)
        return res[: len(payloads)]

    async def _submit_query_batched(self, tenant_id: int,
                                    query: list, k: int) -> list[Hit]:
        """Enqueue one plain vector query on the deadline batcher;
        resolves to its own hit list once the (tenant, dim, k) bucket
        flushes through knn_batch."""
        b = self._deadline_batcher("vec", self._run_vec_bucket)
        return await b.submit((tenant_id, len(query), k), query)

    async def knn_batch(
        self, tenant_id: int, queries: list[list[float]], k: int,
        filter: Optional[dict] = None, exact: bool = False,
    ) -> list[list[Hit]]:
        """Batched cosine top-k: all queries share ONE device matmul —
        the MXU runs a real GEMM instead of Q GEMVs (a single 10M x 64
        GEMV streams at ~30% of HBM peak; batching recovers it). Returns
        one hit list per query.

        Semantics match knn() except under UCFP_KNN_QUANT=int8 with
        small k, where the fused pallas partial-reduce keeps one
        candidate per (tile, lane) — exact for top-1 and near-exact for
        k <= 16 (collision odds documented in ops/pallas_scan.py); larger
        k falls back to the exact kernel."""
        if k == 0 or not queries:
            return [[] for _ in queries]
        dims = {len(q) for q in queries}
        if len(dims) != 1:
            from ..core import ModalityError

            raise ModalityError("all queries in a batch must share one dim")
        dim = dims.pop()
        if dim == 0:
            return [[] for _ in queries]
        qm = np.asarray(queries, np.float32)
        cache = self._vec.get((tenant_id, dim))
        if cache is None or cache.n == 0:
            return [[] for _ in queries]
        if filter is not None:
            from .backend import validate_filter

            validate_filter(filter)

        def work(_attempt=0, _last=2):
            import jax
            import jax.numpy as jnp

            with self._lock:
                # same-lock filter mask: see knn() — keeps mask length and
                # tag reads consistent with the device cache snapshot
                flt_mask = (
                    self._vector_filter_mask(cache, filter)
                    if filter is not None else True
                )
                if flt_mask is None:
                    return [[] for _ in queries]
                dev = self._device_vec(cache)
                if flt_mask is not True:
                    dev = (*dev[:-1], dev[-1] & self._put_rowvec(flt_mask))
                # deferred rid mapping (see knn): snapshot the move
                # generation instead of copying the O(catalog) rid list
                gen_snap = cache.gen
                rids_copy = list(cache.rids) if _attempt == _last else None
                # prefix length captured UNDER the lock (see knn): the
                # batched int4 path feeds it to the fused prefix-masked
                # kernel, so a post-lock read would race deletes
                n_snap = cache.n
            kk = min(k, n_snap)
            if self._mesh is not None:
                from ..parallel import sharded_knn

                if (self._int4_on() and not exact and flt_mask is True
                        and self._int4_batch_worth_it(
                            dev[0].shape[0], dim, kk, qm.shape[0])):
                    # sharded batched int4: each shard streams HALF its
                    # int8 bytes once for the whole block (unfiltered
                    # only — the fused kernel masks via the per-shard
                    # prefix rule)
                    q8m, row_norm, packed_t, inv_n4, _valid = dev
                    scores, idx = sharded_knn.sharded_cosine_int4_batch_topk(
                        jnp.asarray(qm), q8m, row_norm, packed_t, inv_n4,
                        n_snap, kk, self._mesh, self._mesh_axes,
                    )
                elif (self._int2_on() and not exact and flt_mask is True
                        and self._int2_batch_worth_it(
                            dev[0].shape[0], dim, kk, qm.shape[0])):
                    # sharded batched int2: quarter the int8 bytes per
                    # shard for the whole block (unfiltered only)
                    q8m, row_norm, packed_t, inv_n2, _valid = dev
                    scores, idx = sharded_knn.sharded_cosine_int2_batch_topk(
                        jnp.asarray(qm), q8m, row_norm, packed_t, inv_n2,
                        n_snap, kk, self._mesh, self._mesh_axes,
                    )
                elif self.knn_quant in ("int8", "sketch", "int4", "int2"):
                    # batched queries amortize the sharded scan; the
                    # prefilter caches' int8 matrix serves the GEMM
                    q8m, row_norm, valid = dev[0], dev[1], dev[-1]
                    scores, idx = sharded_knn.sharded_cosine_int8_batch_topk(
                        qm, q8m, row_norm, valid, kk, self._mesh,
                        self._mesh_axes,
                    )
                else:
                    matrix, valid = dev
                    scores, idx = sharded_knn.sharded_cosine_topk(
                        qm, matrix, valid, kk, self._mesh, self._mesh_axes,
                    )
            elif (self._int4_on() and not exact and flt_mask is True
                  and self._int4_batch_worth_it(
                      dev[0].shape[0], dim, kk, qm.shape[0])):
                # batched int4 prefilter: ONE packed scan (half the
                # exact GEMM's catalog bytes) serves the whole query
                # block, per-query pools rescore exactly. Unfiltered
                # only — the fused kernel masks via the prefix rule;
                # filtered batches ride the exact GEMM below.
                q8m, row_norm, packed_t, inv_n4, _valid = dev
                scores, idx = knn_ops.cosine_int4_topk_batched(
                    jnp.asarray(qm), q8m, row_norm, packed_t, inv_n4,
                    n_snap, kk, knn_ops.int4_batch_pool(q8m.shape[0], kk),
                )
            elif (self._int2_on() and not exact and flt_mask is True
                  and self._int2_batch_worth_it(
                      dev[0].shape[0], dim, kk, qm.shape[0])):
                # batched int2 prefilter: ONE quarter-byte packed scan
                # serves the whole query block (half the batched int4
                # path's catalog bytes), segmented-quota selection +
                # per-query stage-2 shrink + exact rescore. Unfiltered
                # only — the fused kernel masks via the prefix rule.
                q8m, row_norm, packed_t, inv_n2, _valid = dev
                scores, idx = knn_ops.cosine_int2_topk_batched(
                    jnp.asarray(qm), q8m, row_norm, packed_t, inv_n2,
                    n_snap, kk, knn_ops.int2_batch_pool(q8m.shape[0], kk),
                )
            elif self.knn_quant in ("int8", "sketch", "int4", "int2"):
                # batched queries amortize the HBM scan across the whole
                # GEMM, so the sketch prefilter buys little here — ride
                # the int8 path (the prefilter caches are supersets of
                # it); int4 batches that pass the cost model take the
                # packed-scan branch above
                from ..ops import pallas_scan

                q8m, row_norm, valid = dev[0], dev[1], dev[-1]
                # fused partial-reduce: only when the candidate pool covers
                # k with headroom (near-exact for small k; see docstring)
                if not exact and self._fused_pool_ok(q8m.shape[0], n_snap, kk):
                    # the measured sub-ms path: one MXU GEMM over all
                    # queries + one 2D-grid pallas partial-reduce
                    # the one shared quantization rule — the int4 batch
                    # tier's exactness-vs-int8 contract depends on both
                    # paths quantizing identically
                    qq = knn_ops._quantize_query_rows(jnp.asarray(qm))
                    dots = jax.lax.dot_general(
                        qq, q8m, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    qn = jnp.linalg.norm(qq.astype(jnp.float32), axis=1)
                    inv_q = jnp.where(qn > 0.0, 1.0 / jnp.maximum(qn, 1e-9),
                                      0.0)
                    if flt_mask is True:
                        # unfiltered: validity is the prefix rule — the
                        # fused normalize kernel masks in-stream (no
                        # [Q, C] f32 convert/mask/divide bounce)
                        scores, idx = pallas_scan.dots_norm_topk_fused_batched(
                            dots, row_norm, jnp.int32(n_snap), inv_q, kk)
                    else:
                        denom = jnp.maximum(qn, 1e-9)[:, None] * jnp.maximum(
                            row_norm, 1e-9)[None, :]
                        ok = valid[None, :] & (row_norm[None, :] > 0.0)
                        sc = jnp.where(ok, dots.astype(jnp.float32) / denom,
                                       -jnp.inf)
                        scores, idx = pallas_scan.scores_topk_fused_batched(
                            sc, kk)
                else:
                    scores, idx = knn_ops.cosine_topk_int8(
                        qm, q8m, row_norm, valid, kk
                    )
            else:
                matrix, valid = dev
                if not exact and self._fused_pool_ok(
                        matrix.shape[0], n_snap, kk):
                    scores, idx = knn_ops.cosine_topk_fused(
                        qm, matrix, valid, kk)
                else:
                    scores, idx = knn_ops.cosine_topk(qm, matrix, valid, kk)
            scores = np.asarray(scores)
            idx = np.asarray(idx)
            if rids_copy is not None:
                rids = rids_copy
            else:
                with self._lock:
                    moved = cache.gen != gen_snap
                    if not moved:
                        # <= Q*k lookups resolved under the lock
                        # (finite scores only — kernels may emit
                        # placeholder indices on -inf rows); gen
                        # unchanged => finite indices (< n_snap) still
                        # name their snapshot-time records
                        rids = {
                            int(i): cache.rids[int(i)]
                            for s, i in zip(scores.reshape(-1),
                                            idx.reshape(-1))
                            if np.isfinite(s)
                        }
                if moved:  # delete moved rows: retry OUTSIDE the lock
                    return work(_attempt + 1)
            out: list[list[Hit]] = []
            for row in range(qm.shape[0]):
                if float(np.linalg.norm(qm[row])) == 0.0:
                    out.append([])
                    continue
                pairs = [
                    (rids[int(i)], float(s))
                    for s, i in zip(scores[row], idx[row])
                    if np.isfinite(s)
                ]
                pairs.sort(key=lambda t: (-t[1], t[0]))
                out.append(
                    [Hit(record_id=r, score=s, source=HitSource.VECTOR)
                     for r, s in pairs]
                )
            return out

        return await asyncio.to_thread(work)

    async def knn_fingerprint(
        self, tenant_id: int, algorithm: str, fingerprint: bytes, k: int
    ) -> list[Hit]:
        """TPU extension: Hamming top-k over packed stored fingerprints.

        score = 1 - dist/bits so larger is better, consistent with Hit
        ordering elsewhere.
        """
        if k == 0 or not fingerprint:
            return []
        if self._qbatch_ms > 0:
            # same opt-in micro-batching as plain vector queries: one
            # XOR+popcount dispatch per (tenant, algorithm, k) bucket
            return await self._submit_fp_batched(
                tenant_id, algorithm, fingerprint, k
            )
        res = await self.knn_fingerprint_batch(tenant_id, algorithm,
                                               [fingerprint], k)
        return res[0]

    async def _run_fp_bucket(self, bucket, payloads):
        t, alg, kk = bucket
        with self._lock:  # multiple event-loop threads flush concurrently
            self._qbatch_flushes += 1
            self._qbatch_items += len(payloads)
        res = await self.knn_fingerprint_batch(
            t, alg, self._pad_pow2_list(payloads), kk
        )
        return res[: len(payloads)]

    async def _submit_fp_batched(self, tenant_id: int, algorithm: str,
                                 fingerprint: bytes, k: int) -> list[Hit]:
        """Fingerprint twin of _submit_query_batched (separate batcher
        registry kind, so bucket keys cannot collide)."""
        b = self._deadline_batcher("fp", self._run_fp_bucket)
        return await b.submit((tenant_id, algorithm, k), fingerprint)

    async def knn_fingerprint_batch(
        self, tenant_id: int, algorithm: str, fingerprints: list[bytes], k: int
    ) -> list[list[Hit]]:
        """Batched Hamming top-k: all queries share ONE device dispatch
        (the XOR+popcount matrix reads the packed catalog once for the
        whole batch instead of once per query). Width-mismatched or
        empty fingerprints return an empty hit list at their position."""
        if k == 0 or not fingerprints:
            return [[] for _ in fingerprints]
        cache = self._ham.get((tenant_id, algorithm))
        if cache is None or cache.n == 0:
            return [[] for _ in fingerprints]
        packs = []
        ok_rows = []
        for fp in fingerprints:
            p = (np.asarray(knn_ops.pack_bits_to_u32(fp), np.uint32)
                 if fp else np.zeros(0, np.uint32))
            ok = bool(fp) and len(p) == cache.width
            packs.append(p if ok else np.zeros(cache.width, np.uint32))
            ok_rows.append(ok)
        if not any(ok_rows):
            # every row is width-mismatched/empty: skip the whole-catalog
            # device scan whose results would all be discarded
            return [[] for _ in fingerprints]
        qm = np.stack(packs)

        def work(_attempt=0, _last=2):
            with self._lock:
                matrix, valid = self._device_ham(cache)
                # deferred rid mapping + n under the lock (see knn):
                # the rid-list copy was O(catalog) per query, and a
                # post-lock cache.n read races deletes
                gen_snap = cache.gen
                rids_copy = list(cache.rids) if _attempt == _last else None
                n_snap = cache.n
            kk = min(k, n_snap)
            if self._mesh is not None:
                from ..parallel import sharded_knn

                dist, idx = sharded_knn.sharded_hamming_topk(
                    qm, matrix, valid, kk, self._mesh, self._mesh_axes
                )
            else:
                from ..ops import pallas_scan

                if (self._fused_pool_ok(matrix.shape[0], n_snap, kk)
                        and cache.width
                        <= pallas_scan.MAX_FUSED_HAMMING_WORDS):
                    # big-catalog path: stream tiles through VMEM, never
                    # materialize [Q, C, W] (per-(tile,lane) partial
                    # reduce — near-exact for k <= 16, exact top-1; the
                    # collision bound is documented in ops/pallas_scan.py).
                    # Wide fingerprints (minhash signatures, W > 16)
                    # exceed the kernel's VMEM tile budget and ride the
                    # exact XLA kernel instead
                    dist, idx = pallas_scan.hamming_topk_fused_batched(
                        qm, matrix, valid, kk
                    )
                else:
                    dist, idx = knn_ops.hamming_topk(qm, matrix, valid, kk)
            dist = np.asarray(dist)
            idx = np.asarray(idx)
            if rids_copy is not None:
                rids = rids_copy
            else:
                with self._lock:
                    moved = cache.gen != gen_snap
                    if not moved:
                        rids = {
                            int(i): cache.rids[int(i)]
                            for d, i in zip(dist.reshape(-1),
                                            idx.reshape(-1))
                            if d < 2**30
                        }
                if moved:  # delete moved rows: retry OUTSIDE the lock
                    return work(_attempt + 1)
            bits = cache.width * 32
            res: list[list[Hit]] = []
            for row in range(qm.shape[0]):
                if not ok_rows[row]:
                    res.append([])
                    continue
                out = [
                    (rids[int(i)], int(d))
                    for d, i in zip(dist[row], idx[row])
                    if d < 2**30  # masked rows surface as 2^30 / 2^31-1
                ]
                out.sort(key=lambda t: (t[1], t[0]))
                res.append([
                    Hit(record_id=rid, score=1.0 - d / bits,
                        source=HitSource.VECTOR)
                    for rid, d in out
                ])
            return res

        return await asyncio.to_thread(work)

    async def knn_multihash(
        self, tenant_id: int, fingerprints: list[bytes], k: int,
        weights: Optional[dict] = None,
    ) -> list[list[Hit]]:
        """Weighted multi-hash comparison over stored 536-byte bundles
        (reference MultiHashConfigDto semantics, dto.rs:465-480): the
        score is the weighted sum of per-component similarities — three
        64-bit Hamming terms, histogram L1, and the fraction of 4x4
        blocks within block_distance_threshold. One batched device
        dispatch; weights default to the manifest's 0.4/.3/.1/.1/.1."""
        from ..modality.image import ALGORITHM_MULTI
        from ..ops import imagehash as ih

        if k == 0 or not fingerprints:
            return [[] for _ in fingerprints]
        cache = self._ham.get((tenant_id, ALGORITHM_MULTI))
        if cache is None or cache.n == 0 or cache.width != ih.MULTIHASH_WORDS:
            return [[] for _ in fingerprints]
        packs, ok_rows = [], []
        for fp in fingerprints:
            ok = len(fp) == ih.MULTIHASH_BYTES
            packs.append(
                np.asarray(knn_ops.pack_bits_to_u32(fp), np.uint32)
                if ok else np.zeros(ih.MULTIHASH_WORDS, np.uint32)
            )
            ok_rows.append(ok)
        if not any(ok_rows):
            return [[] for _ in fingerprints]
        qm = np.stack(packs)
        params = ih.multihash_params(weights)

        def work(_attempt=0, _last=2):
            import jax.numpy as jnp

            with self._lock:
                matrix, valid = self._device_ham(cache)
                # deferred rid mapping + n under the lock (see knn)
                gen_snap = cache.gen
                rids_copy = list(cache.rids) if _attempt == _last else None
                n_snap = cache.n
            kk = min(k, n_snap)
            scores, idx = ih.multihash_weighted_topk(
                jnp.asarray(qm), matrix, valid, jnp.asarray(params), kk
            )
            scores = np.asarray(scores)
            idx = np.asarray(idx)
            if rids_copy is not None:
                rids = rids_copy
            else:
                with self._lock:
                    moved = cache.gen != gen_snap
                    if not moved:
                        rids = {
                            int(i): cache.rids[int(i)]
                            for s, i in zip(scores.reshape(-1),
                                            idx.reshape(-1))
                            if np.isfinite(s)
                        }
                if moved:  # delete moved rows: retry OUTSIDE the lock
                    return work(_attempt + 1)
            res: list[list[Hit]] = []
            for row in range(qm.shape[0]):
                if not ok_rows[row]:
                    res.append([])
                    continue
                out = [
                    (rids[int(i)], float(s))
                    for s, i in zip(scores[row], idx[row])
                    if np.isfinite(s)
                ]
                out.sort(key=lambda t: (-t[1], t[0]))
                res.append([
                    Hit(record_id=rid, score=s, source=HitSource.VECTOR)
                    for rid, s in out
                ])
            return res

        return await asyncio.to_thread(work)

    async def bm25(self, tenant_id: int, terms: list[str], k: int) -> list[Hit]:
        def work():
            with self._lock:
                res = self._bm25.search(tenant_id, terms, k)
            return [
                Hit(record_id=d, score=s, source=HitSource.BM25) for d, s in res
            ]

        return await asyncio.to_thread(work)

    async def bm25_explain(
        self, tenant_id: int, terms: list[str], k: int
    ) -> list[tuple[Hit, list[TermHit]]]:
        def work():
            with self._lock:
                res = self._bm25.search_explain(tenant_id, terms, k)
            return [
                (Hit(record_id=d, score=s, source=HitSource.BM25), th)
                for d, s, th in res
            ]

        return await asyncio.to_thread(work)

    async def flush(self) -> None:
        # GroupCommitWal serializes engine access internally, so no
        # backend lock: a flush round must not stall writers
        wal = self._wal  # snapshot vs concurrent close()
        if wal is not None:
            await wal.wait_durable(wal.append_buffered([]))

    async def get_record_metadata(
        self, tenant_id: int, record_id: int
    ) -> FingerprintMeta:
        row = self._records.get((tenant_id, record_id))
        if row is None:
            raise RecordNotFound(f"record {tenant_id}/{record_id} not found")
        return FingerprintMeta(
            tenant_id=tenant_id,
            record_id=record_id,
            modality=Modality(row["modality"]),
            algorithm=row["algorithm"],
            config_hash=row["config_hash"],
            format_version=row["format_version"],
            fingerprint_bytes=len(row["fingerprint"]),
            has_embedding=row["embedding"] is not None,
            model_id=row["model_id"],
        )

    def list_records(self, tenant_id: int, offset: int = 0,
                     limit: int = 50) -> tuple[list[dict], int]:
        """Paginated per-tenant listing in INSERTION order (an extension;
        the reference web records page keeps its list client-side).
        -> ([{record_id, modality, algorithm, fingerprint_bytes,
        has_embedding}], total). O(offset + limit), not O(catalog)."""
        import itertools

        with self._lock:
            rows = self._tenant_rows.get(tenant_id, {})
            total = len(rows)
            ids = list(itertools.islice(rows.keys(), offset, offset + limit))
            out = []
            for rid in ids:
                row = self._records[(tenant_id, rid)]
                out.append({
                    "record_id": rid,
                    "modality": row["modality"],
                    "algorithm": row["algorithm"],
                    "fingerprint_bytes": len(row["fingerprint"]),
                    "has_embedding": row["embedding"] is not None,
                })
        return out, total

    def get_record(self, tenant_id: int, record_id: int) -> dict:
        row = self._records.get((tenant_id, record_id))
        if row is None:
            raise RecordNotFound(f"record {tenant_id}/{record_id} not found")
        return row

    def close(self) -> None:
        if self._wal is not None:
            self._wal.close()
            self._wal = None

    def compact(self) -> None:
        """Rewrite the WAL as a snapshot of current state (checkpoint).

        Two-phase: the store lock is held only to pin the snapshot
        (sorted row REFS — rows are replaced, never mutated, so the
        refs stay stable) and take the WAL buffer watermark; the encode
        + file write + fsync run OUTSIDE the lock, so queries and
        memory applies proceed during the rewrite (durability acks for
        concurrent ingest wait until the swap, then drain to the new
        log). On the native engine the snapshot is emitted as
        array-direct run frames (byte-identical to the per-event
        encode, so the compacted log is unchanged — only the encode
        cost drops) and the resulting uniform runs make the NEXT
        replay columnar too."""
        wal = self._wal
        begin = getattr(wal, "begin_rewrite", None)
        if begin is None:
            # bare engine (tests wiring a raw NativeWal/JsonWal): keep
            # the single-phase path under the lock
            with self._lock:
                items = sorted(self._records.items())
                wal.rewrite(_upsert_event(tid, rid, row)
                            for (tid, rid), row in items)
                self._wal_floor = self._wal_size()
            return
        ctx = begin()
        try:
            with self._lock:
                wal.mark_rewrite(ctx)
                items = sorted(self._records.items())
            if wal.supports_encoded_rewrite:
                wal.commit_rewrite(ctx, blobs=self._snapshot_frames(items))
            else:
                wal.commit_rewrite(ctx, events=[
                    _upsert_event(tid, rid, row)
                    for (tid, rid), row in items
                ])
        except BaseException:
            wal.abort_rewrite(ctx)
            raise
        self._wal_floor = self._wal_size()

    def _snapshot_frames(self, items: list) -> Iterator:
        """Encoded WAL frames of a pinned state snapshot (sorted
        ((tenant, rid), row) items) — single frames (bytes) for rows
        with optional fields, fixed-length frame blocks
        ((bytes, frame_len, count)) for maximal uniform
        fingerprint-only runs, the shape NativeWal.rewrite_encoded
        appends in one C call. The framed bytes are identical to
        [encode_event(_upsert_event(...))] in the same order
        (encode_fp_run_block's contract), so this changes the
        snapshot's cost, never its bytes."""
        from .wal import (encode_emb_run_block, encode_event,
                          encode_fp_run_block)

        n = len(items)
        i = 0
        while i < n:
            (tid, rid), row = items[i]
            if (row["text"] is not None
                    or (row["embedding"] is None and row["model_id"])
                    or (row["embedding"] is not None
                        and len(row["embedding"]) == 0)):
                # text rows, model-without-embedding, and degenerate
                # empty embeddings stay per-frame
                yield encode_event(_upsert_event(tid, rid, row))
                i += 1
                continue
            if row["embedding"] is not None:
                mod0 = row["modality"]
                alg0 = row["algorithm"]
                cfg0 = row["config_hash"]
                fmt0 = row["format_version"]
                meta0 = row["metadata"]
                model0 = row["model_id"]
                flen0 = len(row["fingerprint"])
                elen0 = len(row["embedding"])
                j = i + 1
                while j < n:
                    (t2, _), r2 = items[j]
                    e2 = r2["embedding"]
                    if (t2 != tid
                            or e2 is None or len(e2) != elen0
                            or r2["model_id"] != model0
                            or r2["text"] is not None
                            or r2["algorithm"] != alg0
                            or r2["modality"] != mod0
                            or r2["config_hash"] != cfg0
                            or r2["format_version"] != fmt0
                            or r2["metadata"] != meta0
                            or len(r2["fingerprint"]) != flen0):
                        break
                    j += 1
                yield encode_emb_run_block(
                    tid, mod0,
                    [items[k][0][1] for k in range(i, j)],
                    [items[k][1]["fingerprint"] for k in range(i, j)],
                    [items[k][1]["embedding"] for k in range(i, j)],
                    algorithm=alg0, model_id=model0, config_hash=cfg0,
                    format_version=fmt0, metadata=meta0,
                )
                i = j
                continue
            mod0 = row["modality"]
            alg0 = row["algorithm"]
            cfg0 = row["config_hash"]
            fmt0 = row["format_version"]
            meta0 = row["metadata"]
            flen0 = len(row["fingerprint"])
            j = i + 1
            while j < n:
                (t2, _), r2 = items[j]
                if (t2 != tid
                        or r2["embedding"] is not None or r2["model_id"]
                        or r2["text"] is not None
                        or r2["algorithm"] != alg0 or r2["modality"] != mod0
                        or r2["config_hash"] != cfg0
                        or r2["format_version"] != fmt0
                        or r2["metadata"] != meta0
                        or len(r2["fingerprint"]) != flen0):
                    break
                j += 1
            # validate=False: every row passed Record validation at
            # ingest (u64 rid, bytes fingerprint); the loop above pinned
            # the uniform width
            yield encode_fp_run_block(
                tid, mod0,
                [items[k][0][1] for k in range(i, j)],
                [items[k][1]["fingerprint"] for k in range(i, j)],
                algorithm=alg0, config_hash=cfg0, format_version=fmt0,
                metadata=meta0, validate=False,
            )
            i = j

    def _wal_size(self) -> int:
        try:
            return os.path.getsize(self._wal_path)
        except OSError:
            return 0

    async def _maybe_autocompact_async(self) -> None:
        """Event-loop-safe autocompact: the cheap threshold check runs
        inline; the compaction itself (backend lock + full WAL rewrite +
        fsyncs, ~0.3 s per 100k records) runs in a worker thread so it
        never freezes concurrent requests."""
        if self._autocompact_due():
            await asyncio.to_thread(self.maybe_autocompact)

    def _autocompact_due(self) -> bool:
        thresh_mb = float(os.environ.get("UCFP_AUTOCOMPACT_MB", "0") or 0)
        if thresh_mb <= 0:
            return False
        size = self._wal_size()
        floor = getattr(self, "_wal_floor", 0)
        return size > thresh_mb * 1024 * 1024 and size > 2 * max(floor, 1)

    def maybe_autocompact(self) -> bool:
        """Opt-in log-growth bound (UCFP_AUTOCOMPACT_MB): compact when
        the WAL exceeds the threshold AND has doubled since the last
        snapshot — churn-heavy deployments otherwise replay every
        superseded event on restart. Returns True when it compacted."""
        if self._autocompact_due():
            self.compact()
            return True
        return False
