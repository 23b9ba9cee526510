"""Failure detection and elastic resumption for long-running jobs.

The reference keeps no long-running state (walks are ephemeral tensors —
SURVEY.md §5), so it needs none of this; the framework's trainers and
pod-scale sampling runs do.  TPU jobs fail differently from GPU clusters:

- **Preemption** arrives as SIGTERM shortly before the VM dies — the job
  gets one chance to checkpoint.
- **Device faults** surface asynchronously, as an ``XlaRuntimeError`` on a
  *later* dispatch (XLA execution is async); the recovery unit is "restore
  the last checkpoint and replay", not "retry the op".
- **Multi-host** jobs restart whole-job (`jax.distributed` has no per-host
  rejoin); elastic behavior therefore means *fast, bit-identical resume*,
  which the framework's (seed, step)-keyed threefry streams make exact:
  a killed-and-resumed run produces the same bits as an uninterrupted one.

Three pieces, composing `utils.checkpoint` and `utils.logging`:

- ``Heartbeat`` — per-step liveness file an external watchdog polls
  (``Heartbeat.is_stalled``); the TPU analogue of a collective watchdog.
- ``run_resumable`` — wraps a step function with restore-on-start,
  checkpoint-every-N, checkpoint-and-return on SIGTERM/SIGINT, and
  restore-and-replay retries on runtime faults.
- ``ElasticResult`` — what happened (completed / preempted / resumed-from).
"""

from __future__ import annotations

import dataclasses
import json
import os
import signal
import threading
import time

import jax

from . import checkpoint
from .logging import get_logger


class Heartbeat:
    """Atomic JSON liveness file: ``{"ts": ..., "step": ..., **info}``.

    The trainer beats it each step; an external watchdog (or a peer host)
    polls ``is_stalled`` to detect a hung device without being in-process.
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def beat(self, step: int, **info) -> None:
        record = {"ts": time.time(), "step": int(step), **info}
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, self.path)

    @staticmethod
    def read(path: str) -> dict | None:
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    @staticmethod
    def is_stalled(path: str, timeout_sec: float, now: float | None = None
                   ) -> bool:
        """True if the heartbeat is absent or older than ``timeout_sec``."""
        record = Heartbeat.read(path)
        if record is None:
            return True
        return ((now if now is not None else time.time())
                - record["ts"]) > timeout_sec


@dataclasses.dataclass
class ElasticConfig:
    ckpt_dir: str
    every_steps: int = 100          # checkpoint cadence
    heartbeat_path: str | None = None
    max_retries: int = 0            # restore-and-replay retries on faults
    retryable: tuple = ()           # extra exception types to treat as faults
    save_final: bool = True         # checkpoint after the last step


@dataclasses.dataclass
class ElasticResult:
    state: object
    steps_done: int                 # number of steps completed
    preempted: bool                 # stopped early on SIGTERM/SIGINT
    resumed_from: int | None        # checkpoint step resumed at start, if any
    retries_used: int


def run_resumable(step_fn, init_state, num_steps: int,
                  config: ElasticConfig) -> ElasticResult:
    """Run ``state = step_fn(state, step)`` for ``step in range(num_steps)``
    with restore-on-start, periodic checkpointing, preemption handling, and
    fault replay.

    Checkpoints save the state *after* step ``k`` under step number ``k+1``
    (= number of steps completed), so resume continues at exactly the next
    step.  Because every framework kernel derives randomness from
    (seed, step) threefry counters, the resumed trajectory is bit-identical
    to the uninterrupted one (asserted in tests/test_elastic.py).

    ``step_fn`` must be side-effect-free w.r.t. ``state`` (functional
    update), which every trainer in this framework already is.
    """
    log = get_logger("elastic")
    state, done = init_state, 0
    restored, ckpt_step = checkpoint.restore(config.ckpt_dir, init_state)
    resumed_from = None
    if restored is not None:
        state, done, resumed_from = restored, ckpt_step, ckpt_step
        log.info("resumed from checkpoint at step %d", ckpt_step)

    heartbeat = (Heartbeat(config.heartbeat_path)
                 if config.heartbeat_path else None)
    stop = {}

    def _handler(signum, frame):
        stop["signal"] = signum

    old_handlers = {}
    in_main = threading.current_thread() is threading.main_thread()
    if in_main:
        for sig in (signal.SIGTERM, signal.SIGINT):
            old_handlers[sig] = signal.signal(sig, _handler)

    fault_types = (jax.errors.JaxRuntimeError, *config.retryable)
    retries_used = 0
    preempted = False
    try:
        while done < num_steps:
            if stop:
                log.warning("signal %s: checkpointing at step %d and "
                            "stopping", stop["signal"], done)
                checkpoint.save(config.ckpt_dir, state, done)
                preempted = True
                break
            try:
                new_state = step_fn(state, done)
                if (done + 1) % config.every_steps == 0:
                    # Block before saving so async faults in this window
                    # surface here (inside the retry net), never as a
                    # corrupt checkpoint.
                    jax.block_until_ready(new_state)
            except fault_types as exc:
                if retries_used >= config.max_retries:
                    raise
                retries_used += 1
                log.warning("step %d failed (%s: %s); restoring last "
                            "checkpoint (retry %d/%d)", done,
                            type(exc).__name__, exc, retries_used,
                            config.max_retries)
                restored, ckpt_step = checkpoint.restore(config.ckpt_dir,
                                                         init_state)
                state, done = ((restored, ckpt_step)
                               if restored is not None else (init_state, 0))
                continue
            state, done = new_state, done + 1
            if heartbeat is not None:
                heartbeat.beat(done)
            if done % config.every_steps == 0 and done < num_steps:
                checkpoint.save(config.ckpt_dir, state, done)
        if not preempted and config.save_final and done > 0:
            jax.block_until_ready(state)
            checkpoint.save(config.ckpt_dir, state, done)
    finally:
        if in_main:
            for sig, handler in old_handlers.items():
                signal.signal(sig, handler)
    return ElasticResult(state=state, steps_done=done, preempted=preempted,
                         resumed_from=resumed_from, retries_used=retries_used)
