#!/usr/bin/env python3
"""Concurrency soak: mixed infer/generate/status/metrics load against a live
server (no reference counterpart — the reference client is single-threaded).

Usage:
  python scripts/soak.py --url http://localhost:8080 \
      --infer-model test_model --llm-model tiny_llm \
      [--threads 12] [--requests 15]

Exits non-zero on any non-200 response or transport error.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import random
import sys
import time

import requests


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://localhost:8080")
    ap.add_argument("--infer-model", default="test_model")
    ap.add_argument("--llm-model", default="")
    ap.add_argument("--threads", type=int, default=12)
    ap.add_argument("--requests", type=int, default=15, help="per thread")
    args = ap.parse_args()

    base = args.url.rstrip("/")
    errors = []
    counts = {"infer": 0, "generate": 0, "status": 0, "metrics": 0}

    # learn the infer model's input shape from its status
    r = requests.get(f"{base}/models/{args.infer_model}", timeout=60)
    r.raise_for_status()
    inp = r.json()["config"]["inputs"][0]
    shape = [1 if d == -1 else int(d) for d in inp["shape"]]
    n_elems = 1
    for d in shape:
        n_elems *= d

    ops = ["infer", "infer", "status", "metrics"]
    if args.llm_model:
        ops.append("generate")

    def worker(i):
        rng = random.Random(i)
        for _ in range(args.requests):
            op = rng.choice(ops)
            try:
                if op == "infer":
                    r = requests.post(
                        f"{base}/models/{args.infer_model}/infer",
                        json={"inputs": {inp["name"]: [rng.random() for _ in range(n_elems)]}},
                        timeout=300,
                    )
                elif op == "generate":
                    r = requests.post(
                        f"{base}/models/{args.llm_model}/generate",
                        json={"input_ids": [rng.randint(1, 100) for _ in range(rng.randint(1, 6))],
                               "max_new_tokens": rng.randint(1, 8),
                               "temperature": rng.choice([0.0, 0.8])},
                        timeout=600,
                    )
                elif op == "status":
                    r = requests.get(f"{base}/models/{args.infer_model}", timeout=60)
                else:
                    r = requests.get(f"{base}/metrics", timeout=60)
                if r.status_code != 200:
                    errors.append((op, r.status_code, r.text[:120]))
                else:
                    counts[op] += 1
            except Exception as e:
                errors.append((op, type(e).__name__, str(e)[:120]))

    t0 = time.time()
    with cf.ThreadPoolExecutor(args.threads) as ex:
        list(ex.map(worker, range(args.threads)))

    print(f"soak: {sum(counts.values())} ok in {time.time()-t0:.0f}s {counts}, "
          f"{len(errors)} errors")
    for e in errors[:10]:
        print("  ERR", e)
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
