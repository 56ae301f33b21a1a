"""Bulk ingestion helpers (sdk-python.md:153-169).

`bulk_text` / `bulk_image` / `bulk_audio` fan an iterable of inputs over
a thread pool driving the sync client, preserve input order, and rely on
the client's built-in 429/5xx backoff. Failures are captured per item
(never abort the whole run) and reported through `BulkResult.error` — UcfpError for API rejections, transport or
validation exceptions otherwise.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Any, Callable, Iterable, Optional

from ._client import Ucfp
from ._types import Fingerprint


@dataclass
class BulkSource:
    """Which input produced a result: its position and the raw value."""

    index: int
    value: Any


@dataclass
class BulkResult:
    fingerprint: Optional[Fingerprint]
    source: BulkSource
    # UcfpError for API failures; transport/validation exceptions are
    # captured here too so one bad item never aborts the run
    error: Optional[Exception] = None

    def __iter__(self):
        # allows the documented `for fp, source in results` unpacking
        yield self.fingerprint
        yield self.source


def _bulk(
    method: Callable[..., Fingerprint],
    inputs: Iterable[Any],
    concurrency: int,
    progress: Optional[Callable[[int, int], None]],
    kwargs: dict,
) -> list[BulkResult]:
    items = list(enumerate(inputs))
    done = 0
    results: list[Optional[BulkResult]] = [None] * len(items)

    def run(pair):
        i, value = pair
        try:
            return i, method(value, **kwargs), None
        except Exception as e:  # noqa: BLE001 - per-item capture is the contract
            return i, None, e

    with ThreadPoolExecutor(max_workers=max(1, concurrency)) as pool:
        for i, fp, err in pool.map(run, items):
            results[i] = BulkResult(fp, BulkSource(i, items[i][1]), err)
            done += 1
            if progress is not None:
                progress(done, len(items))
    return [r for r in results if r is not None]


def bulk_text(
    client: Ucfp,
    inputs: Iterable[Any],
    *,
    concurrency: int = 16,
    progress: Optional[Callable[[int, int], None]] = None,
    **kwargs: Any,
) -> list[BulkResult]:
    return _bulk(client.text, inputs, concurrency, progress, kwargs)


def bulk_image(
    client: Ucfp,
    inputs: Iterable[Any],
    *,
    concurrency: int = 16,
    progress: Optional[Callable[[int, int], None]] = None,
    **kwargs: Any,
) -> list[BulkResult]:
    return _bulk(client.image, inputs, concurrency, progress, kwargs)


def bulk_audio(
    client: Ucfp,
    inputs: Iterable[Any],
    *,
    concurrency: int = 16,
    progress: Optional[Callable[[int, int], None]] = None,
    **kwargs: Any,
) -> list[BulkResult]:
    return _bulk(client.audio, inputs, concurrency, progress, kwargs)
