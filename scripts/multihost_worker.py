"""Multi-process worker for the jax.distributed CPU test.

Each spawned process joins the process group, builds the global (dp, tp)
mesh spanning all processes' CPU devices, and runs the controller-broadcast
generation loop (tpuserve/parallel/dispatcher.py). Process 0 supplies the
prompt; followers receive it over the collective fabric. Every process
writes its generated tokens to --out so the test can assert cross-process
identity (SURVEY.md §4: "multi-host tests via multiprocess jax.distributed
on CPU devices").

Usage (spawned by tests/test_multihost.py):
  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  python scripts/multihost_worker.py --coordinator 127.0.0.1:PORT \
      --num-processes 2 --process-id N --out /tmp/out_N.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--tp", type=int, default=4)
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--max-new", type=int, default=6)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize overrides env vars
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes, "process group incomplete"

    from tpuserve.models.llama import LlamaParams
    from tpuserve.parallel.dispatcher import MultiHostGenerator

    p = LlamaParams(vocab_size=128, dim=32, n_layers=2, n_heads=8, n_kv_heads=4,
                    head_dim=8, ffn_dim=64)
    gen = MultiHostGenerator(p, n_slots=4, max_len=64, tp=args.tp, dp=args.dp, seed=0)

    prompt = [5, 17, 100, 42, 7]
    if jax.process_index() == 0:
        tokens = gen.generate(prompt, max_new_tokens=args.max_new)
    else:
        tokens = gen.follow(max_new_tokens=args.max_new)

    with open(args.out, "w") as f:
        json.dump({
            "process_id": args.process_id,
            "process_count": jax.process_count(),
            "global_devices": len(jax.devices()),
            "local_devices": len(jax.local_devices()),
            "prompt": prompt,
            "tokens": tokens,
        }, f)
    print(f"process {args.process_id}: {tokens}", flush=True)


if __name__ == "__main__":
    main()
