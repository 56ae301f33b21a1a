"""Native (C++) host components, built lazily with the system toolchain."""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))


def _sanitize_flags() -> list[str]:
    """UCFP_NATIVE_SANITIZE=address,undefined builds the native modules
    under ASan/UBSan — the TSAN/ASAN gap the reference fills with Rust's
    own guarantees (SURVEY §5 race detection). The loading process must
    LD_PRELOAD the matching sanitizer runtime (scripts/sanitize.sh)."""
    san = os.environ.get("UCFP_NATIVE_SANITIZE", "").strip()
    return [f"-fsanitize={san}", "-fno-omit-frame-pointer", "-g"] if san else []


def _outname(base: str) -> str:
    """Sanitized builds get their own artifact so they never clobber the
    production .so — and each sanitizer MODE gets its own (an ASan
    .san.so loaded under a TSAN preload aborts at startup)."""
    san = os.environ.get("UCFP_NATIVE_SANITIZE", "").strip()
    if san:
        slug = san.replace(",", "-").replace("=", "")
        return base.replace(".so", f".{slug}.san.so")
    return base


def _build(src: str, out: str, extra_flags: tuple[str, ...] = ()) -> bool:
    # compile to a temp path and rename: an interrupted/timed-out or
    # concurrent g++ must never leave a corrupt .so with a fresh mtime
    # (it would be loaded forever and silently disable the native path)
    #
    # -O3 -march=x86-64-v3 (AVX2) first — the same CPU baseline the
    # reference pins (/root/reference/.cargo/config.toml:15-19); it
    # vectorizes the imgbatch luma loop 3x vs -O2. Non-x86 toolchains
    # reject the flag, so retry generic -O2 before giving up.
    tmp = f"{out}.{os.getpid()}.tmp"
    # -ffp-contract=off: FMA contraction (enabled by the AVX2 baseline)
    # perturbs the native BM25 scores in the last ulp vs the Python
    # engine — the two must stay float-identical (tests pin equality)
    for opt in (["-O3", "-march=x86-64-v3", "-ffp-contract=off"], ["-O2"]):
        try:
            subprocess.run(
                ["g++", *opt, "-std=c++17", "-pthread", "-fPIC", "-shared"]
                + list(extra_flags) + _sanitize_flags() + ["-o", tmp, src],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, out)
            return True
        except (subprocess.CalledProcessError, FileNotFoundError, OSError,
                subprocess.TimeoutExpired):
            try:
                os.unlink(tmp)
            except OSError:
                pass
    return False


class UcfpHttpReq(ctypes.Structure):
    _fields_ = [
        ("id", ctypes.c_uint64),
        ("method", ctypes.c_char_p),
        ("path", ctypes.c_char_p),
        ("headers", ctypes.c_char_p),
        ("body", ctypes.POINTER(ctypes.c_uint8)),
        ("body_len", ctypes.c_uint32),
        ("peer", ctypes.c_char_p),
    ]


@functools.lru_cache(maxsize=1)
def load_httpfront():
    """Load (building if needed) the native epoll HTTP front, or None."""
    src = os.path.join(_DIR, "httpfront.cpp")
    out = os.path.join(_DIR, _outname("libucfphttp.so"))
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        if not _build(src, out):
            return None
    try:
        lib = ctypes.CDLL(out)
    except OSError:
        return None
    lib.ucfp_http_start.restype = ctypes.c_void_p
    lib.ucfp_http_start.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_uint32]
    lib.ucfp_http_port.restype = ctypes.c_int
    lib.ucfp_http_port.argtypes = [ctypes.c_void_p]
    lib.ucfp_http_next.restype = ctypes.c_int
    lib.ucfp_http_next.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(UcfpHttpReq)
    ]
    lib.ucfp_http_free_req.argtypes = [ctypes.POINTER(UcfpHttpReq)]
    lib.ucfp_http_respond.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint32, ctypes.c_int,
    ]
    lib.ucfp_http_stop.argtypes = [ctypes.c_void_p]
    return lib


@functools.lru_cache(maxsize=1)
def load_bm25():
    """Load (building if needed) the native BM25 engine, or None when the
    toolchain is unavailable — callers fall back to the Python engine."""
    src = os.path.join(_DIR, "bm25.cpp")
    out = os.path.join(_DIR, _outname("libucfpbm25.so"))
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        if not _build(src, out):
            return None
    try:
        lib = ctypes.CDLL(out)
    except OSError:
        return None
    lib.ucfp_bm25_new.restype = ctypes.c_void_p
    lib.ucfp_bm25_free.argtypes = [ctypes.c_void_p]
    lib.ucfp_bm25_clear.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.ucfp_bm25_upsert.restype = ctypes.c_int
    lib.ucfp_bm25_upsert.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p, ctypes.c_uint32,
        ctypes.c_uint32,
    ]
    lib.ucfp_bm25_upsert_text.restype = ctypes.c_long
    lib.ucfp_bm25_upsert_text.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p, ctypes.c_uint32,
    ]
    for fn in ("ucfp_bm25_doc_count", "ucfp_bm25_total_doc_len",
               "ucfp_bm25_term_count"):
        getattr(lib, fn).restype = ctypes.c_uint64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.ucfp_bm25_df.restype = ctypes.c_uint64
    lib.ucfp_bm25_df.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint16]
    lib.ucfp_bm25_tf.restype = ctypes.c_uint32
    lib.ucfp_bm25_tf.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint16, ctypes.c_uint64
    ]
    lib.ucfp_bm25_doc_len.restype = ctypes.c_uint32
    lib.ucfp_bm25_doc_len.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.ucfp_bm25_search.restype = ctypes.c_long
    lib.ucfp_bm25_search.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_double),
    ]
    return lib


@functools.lru_cache(maxsize=1)
def load_imgbatch():
    """Load (building if needed) the native batch-image decoder, or None
    — the handler falls back to the per-image Python decode path."""
    src = os.path.join(_DIR, "imgbatch.cpp")
    out = os.path.join(_DIR, _outname("libucfpimgbatch.so"))
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        if not _build(src, out):
            return None
    try:
        lib = ctypes.CDLL(out)
    except OSError:
        return None
    # body rides as c_char_p: ctypes passes the bytes object's internal
    # pointer zero-copy (a POINTER(c_uint8) argtype would force a copy
    # of the ~1.5 MB batch body per request)
    lib.ucfp_imgbatch_probe.restype = ctypes.c_int
    lib.ucfp_imgbatch_probe.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ucfp_imgbatch_fill.restype = ctypes.c_int
    lib.ucfp_imgbatch_fill.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.ucfp_imgbatch_resize.restype = ctypes.c_int
    lib.ucfp_imgbatch_resize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    return lib


def _xxhash_include_dir():
    """pyarrow vendors the xxhash 0.8 header (XXH3) — the only extra
    include textsig.cpp needs. None when pyarrow is absent; the loader
    then returns None and callers keep the pure-Python path."""
    try:
        import pyarrow
    except ImportError:
        return None
    inc = os.path.join(os.path.dirname(pyarrow.__file__), "include")
    hdr = os.path.join(inc, "arrow", "vendored", "xxhash", "xxhash.h")
    return inc if os.path.exists(hdr) else None


@functools.lru_cache(maxsize=1)
def load_textsig():
    """Load (building if needed) the native text-signature hot path
    (ASCII UAX#29 tokenize + shingle XXH3 + minhash mix/min), or None —
    callers fall back to the regex/numpy pipeline."""
    inc = _xxhash_include_dir()
    if inc is None:
        return None
    src = os.path.join(_DIR, "textsig.cpp")
    out = os.path.join(_DIR, _outname("libucfptextsig.so"))
    # the rebuild trigger covers the GENERATED property table too:
    # re-running scripts/gen_wb_table.py (the documented regex-upgrade
    # workflow) rewrites wb_table.h without touching textsig.cpp, and a
    # stale .so would keep tokenizing with the OLD engine's tables
    hdr = os.path.join(_DIR, "wb_table.h")
    if not os.path.exists(hdr):  # deleted table: no native text path
        return None
    newest_src = max(os.path.getmtime(src), os.path.getmtime(hdr))
    if not os.path.exists(out) or os.path.getmtime(out) < newest_src:
        if not _build(src, out, extra_flags=(f"-I{inc}", f"-I{_DIR}")):
            return None
    try:
        lib = ctypes.CDLL(out)
    except OSError:
        return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.ucfp_text_tokens.restype = ctypes.c_int64
    # text rides as c_char_p: zero-copy pointer to the bytes object
    lib.ucfp_text_tokens.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, i64p, ctypes.c_int64
    ]
    lib.ucfp_minhash_mix_min.restype = None
    lib.ucfp_minhash_mix_min.argtypes = [
        u64p, ctypes.c_int64, u64p, ctypes.c_int32, u64p
    ]
    lib.ucfp_text_minhash_sig.restype = ctypes.c_int64
    lib.ucfp_text_minhash_sig.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
        u64p, ctypes.c_int32, u64p
    ]
    lib.ucfp_tlsh_128_1.restype = ctypes.c_int
    lib.ucfp_tlsh_128_1.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_char_p
    ]
    lib.ucfp_text_simhash64_tf.restype = ctypes.c_int
    lib.ucfp_text_simhash64_tf.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, u64p
    ]
    # full-Unicode (UTF-8) UAX#29 variants — wb_table.h generated from
    # the regex engine by scripts/gen_wb_table.py
    lib.ucfp_text_tokens_u8.restype = ctypes.c_int64
    lib.ucfp_text_tokens_u8.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, i64p, ctypes.c_int64
    ]
    lib.ucfp_text_minhash_sig_u8.restype = ctypes.c_int64
    lib.ucfp_text_minhash_sig_u8.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
        u64p, ctypes.c_int32, u64p
    ]
    lib.ucfp_text_simhash64_tf_u8.restype = ctypes.c_int
    lib.ucfp_text_simhash64_tf_u8.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, u64p
    ]
    lib.ucfp_text_graphemes_u8.restype = ctypes.c_int64
    lib.ucfp_text_graphemes_u8.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, i64p, ctypes.c_int64
    ]
    lib.ucfp_text_minhash_sig_gr.restype = ctypes.c_int64
    lib.ucfp_text_minhash_sig_gr.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
        u64p, ctypes.c_int32, u64p
    ]
    return lib


@functools.lru_cache(maxsize=1)
def load_walstore():
    """Load (building if needed) the native WAL library, or None when the
    toolchain is unavailable — callers fall back to the pure-Python WAL."""
    src = os.path.join(_DIR, "walstore.cpp")
    out = os.path.join(_DIR, _outname("libucfpwal.so"))
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        if not _build(src, out):
            return None
    try:
        lib = ctypes.CDLL(out)
    except OSError:
        return None
    lib.ucfp_wal_open.restype = ctypes.c_void_p
    lib.ucfp_wal_open.argtypes = [ctypes.c_char_p]
    lib.ucfp_wal_append.restype = ctypes.c_int
    lib.ucfp_wal_append.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32
    ]
    lib.ucfp_wal_append_many.restype = ctypes.c_int
    lib.ucfp_wal_append_many.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint32,
    ]
    lib.ucfp_wal_commit.restype = ctypes.c_int
    lib.ucfp_wal_commit.argtypes = [ctypes.c_void_p]
    lib.ucfp_wal_close.restype = ctypes.c_int
    lib.ucfp_wal_close.argtypes = [ctypes.c_void_p]
    lib.ucfp_wal_replace.restype = ctypes.c_int
    lib.ucfp_wal_replace.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    CB = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
                          ctypes.c_uint32)
    lib._replay_cb_type = CB
    lib.ucfp_wal_replay.restype = ctypes.c_long
    lib.ucfp_wal_replay.argtypes = [ctypes.c_char_p, CB, ctypes.c_void_p]
    lib.ucfp_wal_append_fixed.restype = ctypes.c_int
    lib.ucfp_wal_append_fixed.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_uint32,
        ctypes.c_uint64,
    ]
    lib.ucfp_wal_replay_concat.restype = ctypes.c_long
    lib.ucfp_wal_replay_concat.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint64)),
    ]
    lib.ucfp_wal_buf_free.restype = None
    lib.ucfp_wal_buf_free.argtypes = [ctypes.c_void_p]
    return lib
