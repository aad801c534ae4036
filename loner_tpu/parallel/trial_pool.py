"""Per-device subprocess pool for parallel SLAM trials.

The reference fans ``--num_repeats``/sweep trials out one PROCESS per GPU
(reference examples/run_loner.py:339-424: a mp.Pool whose workers pin
``CUDA_VISIBLE_DEVICES`` before touching torch). A single loner_tpu
process cannot run concurrent trials — each trial spawns tracker/mapper
threads and ``jax.default_device`` is thread-local — so the TPU-native
equivalent is the same shape: one child process per trial, at most
``workers`` in flight, each pinned to a device via the environment
BEFORE its JAX backend initializes:

  * TPU hosts: ``TPU_VISIBLE_DEVICES=<k>`` (one chip per child; PJRT
    reads it at backend init, which is lazy — safe even though
    sitecustomize imports jax at interpreter startup)
  * CPU (tests / --cpu): no pinning needed — each child process IS its
    own device; the OS schedules them concurrently.

Children are plain CLI invocations (``run_loner.py --_trial_spec``), so
a crash in one trial cannot corrupt its siblings, exactly like the
reference's process pool.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence


@dataclass
class TrialResult:
    index: int
    returncode: int
    device: Optional[str]
    wall_s: float


def device_env(device: Optional[str]) -> dict:
    """Child environment pinning one accelerator device (no-op for None)."""
    env = os.environ.copy()
    if device is not None:
        env["TPU_VISIBLE_DEVICES"] = str(device)
        # CUDA spelled too: harmless on TPU, correct on GPU builds of jax.
        env["CUDA_VISIBLE_DEVICES"] = str(device)
    return env


def run_pool(
    commands: Sequence[List[str]],
    workers: int,
    devices: Optional[Sequence[str]] = None,
    poll_s: float = 0.2,
    on_start: Optional[Callable[[int, Optional[str]], None]] = None,
) -> List[TrialResult]:
    """Run ``commands`` with at most ``workers`` concurrent subprocesses.

    ``devices``: optional device tokens; worker slot i is pinned to
    ``devices[i % len(devices)]``. Children inherit stdout/stderr (their
    own run logs land in their per-trial output dirs). Returns one
    TrialResult per command, in order; never raises on child failure —
    the caller decides what a nonzero return means.
    """
    workers = max(1, int(workers))
    slots: List[Optional[tuple]] = [None] * workers  # (proc, idx, t0, dev)
    results: List[Optional[TrialResult]] = [None] * len(commands)
    next_idx = 0

    def slot_device(slot: int) -> Optional[str]:
        if not devices:
            return None
        return str(devices[slot % len(devices)])

    while next_idx < len(commands) or any(s is not None for s in slots):
        for i in range(workers):
            if slots[i] is not None:
                proc, idx, t0, dev = slots[i]
                rc = proc.poll()
                if rc is None:
                    continue
                results[idx] = TrialResult(idx, rc, dev, time.time() - t0)
                slots[i] = None
            if slots[i] is None and next_idx < len(commands):
                dev = slot_device(i)
                if on_start is not None:
                    on_start(next_idx, dev)
                proc = subprocess.Popen(commands[next_idx], env=device_env(dev))
                slots[i] = (proc, next_idx, time.time(), dev)
                next_idx += 1
        time.sleep(poll_s)
    return [r for r in results if r is not None]
