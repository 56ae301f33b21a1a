"""ucfp command-line client.

    python -m ucfp text "The quick brown fox." --api-key ucfp_...
    python -m ucfp image photo.jpg --algorithm phash
    python -m ucfp audio clip.wav --algorithm wang
    python -m ucfp query --modality text --terms quick fox -k 5
    python -m ucfp get 12345 / delete 12345 / info / algorithms

Configuration falls back to env: UCFP_API_KEY, UCFP_BASE_URL,
UCFP_TENANT. Output is one JSON object per result (pipe to jq).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from pathlib import Path


def _emit(obj) -> None:
    if dataclasses.is_dataclass(obj):
        obj = dataclasses.asdict(obj)
    print(json.dumps(obj, default=str))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m ucfp")
    ap.add_argument("--api-key", default=os.environ.get("UCFP_API_KEY"))
    ap.add_argument("--base-url",
                    default=os.environ.get("UCFP_BASE_URL",
                                           "http://127.0.0.1:8080"))
    ap.add_argument("--tenant", type=int,
                    default=int(os.environ.get("UCFP_TENANT", "0")))
    ap.add_argument("--timeout", type=float, default=120.0)
    sub = ap.add_subparsers(dest="cmd", required=True)

    for name in ("info", "algorithms", "healthz"):
        sub.add_parser(name)

    t = sub.add_parser("text")
    t.add_argument("input", help="text, @file, or - for stdin")
    t.add_argument("--algorithm", default="minhash")
    t.add_argument("--record-id", type=int)
    t.add_argument("--h", type=int)
    t.add_argument("--k", type=int)
    t.add_argument("--tokenizer")

    i = sub.add_parser("image")
    i.add_argument("path")
    i.add_argument("--algorithm", default="multi")
    i.add_argument("--record-id", type=int)

    a = sub.add_parser("audio")
    a.add_argument("path", help="WAV container or raw .f32")
    a.add_argument("--algorithm", default="wang")
    a.add_argument("--record-id", type=int)
    a.add_argument("--sample-rate", type=int,
                   help="required for raw f32; WAV supplies its own")

    w = sub.add_parser("watermark")
    w.add_argument("path")
    w.add_argument("--sample-rate", type=int)

    q = sub.add_parser("query")
    q.add_argument("--modality", required=True,
                   choices=["text", "image", "audio"])
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--terms", nargs="*")
    q.add_argument("--vector", help="comma-separated floats or @file.json")
    q.add_argument("--fingerprint-hex")
    q.add_argument("--algorithm")
    q.add_argument("--explain", action="store_true")

    g = sub.add_parser("get")
    g.add_argument("record_id", type=int)
    g.add_argument("--include")

    d = sub.add_parser("delete")
    d.add_argument("record_id", type=int)

    args = ap.parse_args(argv)
    from . import Ucfp, UcfpError

    if args.cmd not in ("info", "algorithms", "healthz") and not args.api_key:
        print("error: --api-key (or UCFP_API_KEY) is required",
              file=sys.stderr)
        return 2
    client = Ucfp(api_key=args.api_key or "", base_url=args.base_url,
                  tenant_id=args.tenant, timeout_s=args.timeout)
    try:
        if args.cmd in ("info", "algorithms", "healthz"):
            _emit(getattr(client, args.cmd)())
        elif args.cmd == "text":
            raw = args.input
            if raw == "-":
                raw = sys.stdin.read()
            elif raw.startswith("@"):
                raw = Path(raw[1:]).read_text()
            kw = {k: v for k, v in
                  (("h", args.h), ("k", args.k), ("tokenizer", args.tokenizer))
                  if v is not None}
            _emit(client.text(raw, algorithm=args.algorithm,
                              record_id=args.record_id, **kw))
        elif args.cmd == "image":
            _emit(client.image(Path(args.path), algorithm=args.algorithm,
                               record_id=args.record_id))
        elif args.cmd == "audio":
            _emit(client.audio(Path(args.path), algorithm=args.algorithm,
                               record_id=args.record_id,
                               sample_rate=args.sample_rate))
        elif args.cmd == "watermark":
            _emit(client.audio_watermark(Path(args.path),
                                         sample_rate=args.sample_rate))
        elif args.cmd == "query":
            vector = None
            if args.vector:
                if args.vector.startswith("@"):
                    vector = json.loads(Path(args.vector[1:]).read_text())
                else:
                    vector = [float(x) for x in args.vector.split(",")]
            res = client.query(
                args.modality, k=args.k, terms=args.terms or None,
                vector=vector, fingerprint=args.fingerprint_hex,
                algorithm=args.algorithm, explain=args.explain,
            )
            _emit(res)
        elif args.cmd == "get":
            _emit(client.get_record(args.record_id, include=args.include))
        elif args.cmd == "delete":
            client.delete_record(args.record_id)
            _emit({"deleted": args.record_id})
        return 0
    except UcfpError as e:
        print(json.dumps({"error": e.code, "status": e.status,
                          "message": e.message}), file=sys.stderr)
        return 1
    finally:
        client.close()


if __name__ == "__main__":
    raise SystemExit(main())
