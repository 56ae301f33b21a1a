"""CLI launcher: python -m ucfp_tpu.server --bind HOST:PORT --token T --data-dir D."""

import argparse
import asyncio
import os

# UCFP_JAX_PLATFORM=cpu runs host-only (no accelerator claimed). Applied
# BEFORE importing the app: package imports are kept backend-free, but
# the platform override must win even if a future import regresses into
# touching the default backend (which can hang on an unreachable tunnel
# platform). A plain JAX_PLATFORMS env var is NOT enough on hosts whose
# TPU plugin injects itself ahead of env vars — the config update after
# `import jax` is the reliable override.
_plat = os.environ.get("UCFP_JAX_PLATFORM")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)

from .app import run, state_from_env


def main() -> None:
    p = argparse.ArgumentParser(prog="ucfp-tpu-server")
    p.add_argument("--bind", default=None, help="host:port (env UCFP_BIND)")
    p.add_argument("--token", default=None, help="service bearer (env UCFP_TOKEN)")
    p.add_argument("--keys-file", default=None, help="multi-tenant keys file")
    p.add_argument("--data-dir", default=None, help="index directory")
    p.add_argument("--usage-log", default=None, help="NDJSON usage log path")
    p.add_argument("--native-http", action="store_true",
                   help="serve through the C++ epoll front (env UCFP_HTTP=native)")
    p.add_argument("--workers", type=int, default=None,
                   help="N SO_REUSEPORT HTTP workers over one owner "
                        "process (env UCFP_WORKERS; see server/ipc.py)")
    p.add_argument("--worker-of", default=None, metavar="SOCK",
                   help=argparse.SUPPRESS)  # internal: worker mode
    args = p.parse_args()

    bind = args.bind or os.environ.get("UCFP_BIND", "127.0.0.1:8080")
    if args.worker_of:
        from .multiworker import run_worker

        run_worker(bind, args.worker_of, args)
        return
    workers = args.workers if args.workers is not None else int(
        os.environ.get("UCFP_WORKERS", "0"))
    if workers > 0:
        from .multiworker import run_multiworker

        run_multiworker(bind, workers, args)
        return
    # on-demand kernel tracing (SURVEY §5: JAX profiler + Perfetto are
    # the TPU equivalent of the reference's tracing stack): point
    # TensorBoard/xprof at this port to capture device traces live
    prof_port = os.environ.get("UCFP_PROFILER_PORT")
    if prof_port:
        import jax.profiler

        jax.profiler.start_server(int(prof_port))
        from .logging import logger

        logger().info("profiler", port=int(prof_port))
    state = state_from_env(
        data_dir=args.data_dir,
        token=args.token,
        keys_file=args.keys_file,
        usage_log=args.usage_log,
    )
    try:
        asyncio.run(run(bind, state, native_http=args.native_http or None))
    except KeyboardInterrupt:
        pass  # graceful ctrl-c shutdown (bin/ucfp.rs:279-284)


if __name__ == "__main__":
    main()
