"""Share-nothing job pool over local accelerator devices.

TPU-native counterpart of the reference's multi-GPU worker pools, which
fork one process per GPU and pass work through an mp.Queue
(reference examples/run_loner.py:339-424, analysis/renderer.py:208-450,
analysis/renderer_lidar.py:185-345, analysis/meshing.py:134-163,
analysis/compute_l1_depth.py:66-258, keyed by CUDA_VISIBLE_DEVICES).

JAX addresses every local device from one process, so the pool is one
worker THREAD per device: each worker binds jobs to its device with
``jax.default_device`` and drains a shared queue. On a single chip this
degrades to sequential execution with zero overhead besides the thread;
on a multi-device host (e.g. the 8-device virtual CPU mesh used in
tests, or a v5e pod slice) jobs fan out device-parallel. Compilation is
shared across workers via the jit cache (same program, different device).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, List, Optional, Sequence, TypeVar

import jax

T = TypeVar("T")
R = TypeVar("R")


def map_jobs(
    fn: Callable[[T, "jax.Device"], R],
    jobs: Sequence[T],
    devices: Optional[List["jax.Device"]] = None,
    max_workers: Optional[int] = None,
) -> List[R]:
    """Run ``fn(job, device)`` for every job, one worker thread per device.

    Results are returned in job order. A worker exception cancels the
    remaining queue and re-raises.
    """
    jobs = list(jobs)
    if not jobs:
        return []
    devices = list(devices if devices is not None else jax.devices())
    if max_workers is not None:
        devices = devices[:max_workers]
    if len(devices) <= 1:
        dev = devices[0] if devices else None
        out = []
        for job in jobs:
            if dev is None:
                out.append(fn(job, None))
            else:
                with jax.default_device(dev):
                    out.append(fn(job, dev))
        return out

    work: "queue.Queue[tuple]" = queue.Queue()
    for item in enumerate(jobs):
        work.put(item)
    results: List[R] = [None] * len(jobs)  # type: ignore[list-item]
    errors: List[BaseException] = []
    stop = threading.Event()

    def worker(dev):
        while not stop.is_set():
            try:
                i, job = work.get_nowait()
            except queue.Empty:
                return
            try:
                with jax.default_device(dev):
                    results[i] = fn(job, dev)
            except BaseException as e:  # noqa: BLE001 — propagated below
                errors.append(e)
                stop.set()
                return

    threads = [
        threading.Thread(target=worker, args=(d,), daemon=True) for d in devices
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return results
