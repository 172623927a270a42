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
    args = p.parse_args()
    run_server(args.repository, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
