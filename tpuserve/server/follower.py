"""Follower-process entry for multi-host serving (VERDICT r4 #3).

Topology (BASELINE.md configs[4], e.g. Llama-70B over N>=2 hosts): every
host runs `python -m tpuserve.server` with the same repository path and the
TPUSERVE_COORDINATOR/NUM_PROCESSES/PROCESS_ID env (or flags). Process 0
(controller) serves REST/gRPC exactly as single-host; processes > 0 land
here and replay the controller's dispatch events so all processes enter
the same jitted computations over the global device mesh (the GSPMD
contract — see parallel/dispatcher.py). Requirements: the model repository
must be visible at the same path on every host, and weights must be
byte-identical (same checkpoint files / same seeded init).

No reference counterpart: the reference is single-process by design
(server/main.go:35); this is the inverse topology SURVEY.md §7 step 7
calls for.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("tpuserve.follower")


def run_follower_server(repository: str) -> None:
    """Blocking loop: construct + drive engines as the controller loads and
    unloads models, until a ("shutdown",) event arrives."""
    from tpuserve.parallel.dispatcher import recv_event
    from tpuserve.repository.config import ModelConfig
    from tpuserve.serving.engine import GenerationEngine

    import jax

    log.info("follower %d/%d up (%d local devices)", jax.process_index(),
             jax.process_count(), jax.local_device_count())
    while True:
        ev = recv_event()
        op = ev[0]
        if op == "shutdown":
            log.info("follower shutdown")
            return
        if op != "load":
            raise RuntimeError(
                f"follower expected a load/shutdown event, got {op!r}")
        model_dir = ev[1]
        last = None
        try:
            cfg = ModelConfig.from_file(os.path.join(model_dir, "config.json"))
            log.info("follower loading %s", model_dir)
            eng = GenerationEngine(model_dir, cfg)
            try:
                eng.start()        # same placement + jits as the controller
                last = eng.run_follower()  # replay until unload/shutdown
            finally:
                eng.stop()
            log.info("follower unloaded %s", model_dir)
        except Exception:
            # a config-rejected load fails identically on the controller
            # (which then publishes no engine events), so returning to the
            # event loop keeps the bus aligned
            log.exception("follower load/replay failed for %s", model_dir)
        if last == "shutdown":
            return
