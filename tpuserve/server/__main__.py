"""CLI entry point: `python -m tpuserve.server --repository models --port 8080`.

The reference server has no CLI flags at all (SURVEY.md §5 config); here the
basics are flags with env-var fallbacks.
"""

import argparse
import os

from tpuserve.server.http import run_server


def main():
    p = argparse.ArgumentParser(prog="tpuserve", description="TPU-native inference server")
    p.add_argument(
        "--repository",
        default=os.environ.get("TPUSERVE_REPOSITORY", "./models"),
        help="model repository path (default ./models)",
    )
    p.add_argument("--host", default=os.environ.get("TPUSERVE_HOST", "0.0.0.0"))
    p.add_argument("--port", type=int, default=int(os.environ.get("TPUSERVE_PORT", "8080")))
    p.add_argument(
        "--grpc-port",
        type=int,
        default=int(os.environ.get("TPUSERVE_GRPC_PORT", "0")),
        help="also serve gRPC on this port (0 = disabled)",
    )
    p.add_argument(
        "--platform",
        default=os.environ.get("TPUSERVE_PLATFORM", ""),
        help="force a JAX platform (e.g. 'cpu' for local dev without a TPU;"
             " on this environment the sitecustomize pins the TPU plugin, so"
             " the flag applies the post-import config override)",
    )
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    # multi-host serving: every host runs this same entry point with
    # TPUSERVE_COORDINATOR/NUM_PROCESSES/PROCESS_ID set; process 0 serves
    # the frontends below, the rest replay its dispatches (server/follower)
    multihost = False
    if os.environ.get("TPUSERVE_COORDINATOR"):
        from tpuserve.parallel import distributed

        distributed.initialize()
        import jax

        multihost = jax.process_count() > 1
        if multihost and jax.process_index() != 0:
            from tpuserve.server.follower import run_follower_server

            run_follower_server(args.repository)
            return

    try:
        if args.grpc_port:
            # one manager shared by both frontends
            from aiohttp import web

            from tpuserve.engine.manager import InferenceManager
            from tpuserve.server.grpc import create_grpc_server
            from tpuserve.server.http import create_app

            manager = InferenceManager(args.repository)
            grpc_server = create_grpc_server(manager, args.grpc_port, args.host)
            grpc_server.start()
            app = create_app(args.repository, manager=manager)
            try:
                web.run_app(app, host=args.host, port=args.port, shutdown_timeout=5.0, print=None)
            finally:
                grpc_server.stop(grace=5.0)
        else:
            run_server(args.repository, host=args.host, port=args.port)
    finally:
        if multihost:
            # release follower processes blocked in their event loop
            from tpuserve.parallel.dispatcher import publish_event

            publish_event(("shutdown",))


if __name__ == "__main__":
    main()
