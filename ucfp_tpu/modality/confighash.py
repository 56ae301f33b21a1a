"""Stable 64-bit config hashing.

The reference stamps every Record with the SDK's config_hash so records
produced under different knobs never compare (src/core/mod.rs:43-55). Ours
is xxh3_64 over a canonical "key=value" serialization — stable across
processes and releases as long as the knob set is unchanged.
"""

from __future__ import annotations

import xxhash


def config_hash64(algorithm: str, **knobs) -> int:
    parts = [algorithm]
    for k in sorted(knobs):
        parts.append(f"{k}={knobs[k]!r}")
    return xxhash.xxh3_64_intdigest("\x1f".join(parts).encode("utf-8"))
