"""Owner-process ingest ceiling: the scaling limit of the multi-worker
architecture (server/multiworker.py).

In the owner+workers design every byte a worker parses, decodes,
resizes, and hashes scales with worker cores; what CANNOT scale past
one core is the owner — the single WAL writer + host-table updater
(+ IPC server). This measures exactly that serialization point two
ways on one core:

  * in-process: EmbeddedBackend.upsert_fingerprint_batch directly
    (WAL group commit + tables) — the store's intrinsic ceiling.
  * via IPC: the same batches through OwnerServer/RemoteBackend
    (pickle + unix socket + dispatch) — what workers actually see.

Measured on this host (fresh store per leg — a shared store biased
the second leg ~20% slow via inherited reallocs): B=1024 (the image
route's max request batch) ~127-147k fingerprints/s, B=256 (the
2-worker soak's request batch) ~84-91k, IPC within a few % of
in-process either way (536 B multi-hash fingerprints; the
pickle+unix-socket layer costs ~nothing at batch granularity).
BASELINE.md "Served ceilings and the multi-worker scaling model"
builds the cores-to-target arithmetic on these keys.

Usage: python scripts/owner_ceiling.py [--cpu] [--seconds 4] [--batch 1024]
Prints one JSON line {owner_ipc_fp_per_sec, owner_inproc_fp_per_sec}.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import tempfile
import time


async def _measure(seconds: float, batch: int) -> dict:
    import shutil

    from ucfp_tpu.index.embedded import EmbeddedBackend
    from ucfp_tpu.server.ipc import OwnerServer, RemoteBackend

    fp = bytes(536)  # the 536 B multi-hash bundle

    async def rate(push) -> float:
        base = [0]

        async def once(n):
            await push(list(range(base[0], base[0] + n)), [fp] * n)
            base[0] += n

        await once(batch)  # warm (first WAL segment, first pickle)
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < seconds:
            await once(batch)
            n += batch
        return n / (time.perf_counter() - t0)

    # each leg gets a FRESH store: a shared store biases whichever leg
    # runs second slow (it inherits the first leg's ~10^5 rows, so its
    # capacity-doubling reallocs copy more — the r05 driver capture
    # showed the second leg 20% under the first from exactly this)
    async def inproc_leg() -> float:
        d = tempfile.mkdtemp(prefix="ucfp-ceiling-")
        try:
            be = EmbeddedBackend(d)
            r = await rate(
                lambda rids, fps: be.upsert_fingerprint_batch(
                    1, "imgfprint-multi-v1", rids, fps))
            be.close()
            return r
        finally:
            shutil.rmtree(d, ignore_errors=True)

    async def ipc_leg() -> float:
        d = tempfile.mkdtemp(prefix="ucfp-ceiling-")
        sock = os.path.join(d, "owner.sock")
        try:
            be = EmbeddedBackend(d)
            owner = OwnerServer(be, path=sock)
            await owner.start()
            rb = RemoteBackend(sock)
            r = await rate(
                lambda rids, fps: rb.upsert_fingerprint_batch(
                    1, "imgfprint-multi-v1", rids, fps))
            rb.close()
            await owner.close()
            be.close()
            return r
        finally:
            shutil.rmtree(d, ignore_errors=True)

    inproc = await inproc_leg()
    ipc = await ipc_leg()
    return {
        "owner_ipc_fp_per_sec": round(ipc, 1),
        "owner_inproc_fp_per_sec": round(inproc, 1),
        "batch": batch,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    json.dump(asyncio.run(_measure(args.seconds, args.batch)), sys.stdout)
    print()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
