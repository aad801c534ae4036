"""Signal/Slot message bus for the tracker/mapper pipeline.

The reference runs tracker and mapper as separate spawned processes joined
by ``mp.Manager().Queue()`` proxies (reference: src/common/signals.py:19-121,
src/loner.py:68-75,204-210). TPU-native stance: one process, host threads,
XLA async dispatch providing the tracking/mapping overlap — so the bus is
plain ``queue.Queue`` fan-out with no pickling.

Semantics preserved from the reference:
  * one Signal, many Slots; every emit is delivered to every registered slot
  * ``synchronous=True`` emits rendezvous — block until all slots drained
  * ``StopSignal`` sentinel flows through the bus for 2-phase shutdown
  * ``single_process`` mode deep-copies payloads (determinism harness:
    mimics the process-boundary copy so consumers can't mutate shared data)
"""
from __future__ import annotations

import copy
import queue
import threading
import time
from typing import Any, List


class StopSignal:
    """Sentinel flushed through the bus at shutdown."""


class Slot:
    def __init__(self, deep_copy: bool) -> None:
        self._queue: "queue.Queue[Any]" = queue.Queue()
        self._deep_copy = deep_copy

    def _put(self, value: Any) -> None:
        if self._deep_copy and not isinstance(value, StopSignal):
            value = copy.deepcopy(value)
        self._queue.put(value)

    def has_value(self) -> bool:
        return not self._queue.empty()

    def get_value(self, block: bool = True, timeout: float = None) -> Any:
        return self._queue.get(block=block, timeout=timeout)

    def qsize(self) -> int:
        return self._queue.qsize()


class Signal:
    def __init__(self, synchronous: bool = False, single_process: bool = False) -> None:
        self._slots: List[Slot] = []
        self._synchronous = synchronous
        self._single_process = single_process
        self._lock = threading.Lock()

    def register(self) -> Slot:
        with self._lock:
            slot = Slot(deep_copy=self._single_process)
            self._slots.append(slot)
            return slot

    def emit(self, value: Any) -> None:
        with self._lock:
            slots = list(self._slots)
        for slot in slots:
            slot._put(value)
        # Rendezvous: wait until every consumer has drained the item
        # (reference signals.py:117-121 busy-waits the same way).
        # StopSignal is exempt: a consumer that already processed a stop
        # from another signal has exited its loop and will never drain
        # this one — rendezvous would deadlock the shutdown handshake.
        if (
            self._synchronous
            and not self._single_process
            and not isinstance(value, StopSignal)
        ):
            for slot in slots:
                while slot.has_value():
                    time.sleep(1e-3)

    def flush(self) -> int:
        """Drop all pending items; returns the number dropped."""
        count = 0
        with self._lock:
            slots = list(self._slots)
        for slot in slots:
            while slot.has_value():
                try:
                    slot.get_value(block=False)
                    count += 1
                except queue.Empty:
                    break
        return count


class SharedState:
    """Thread-shared scalars for tracker<->mapper throttling.

    Replaces the reference's ``mp.Value('d')`` (shared_state.py:15-17).
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._last_mapped_frame_time: float = None

    @property
    def last_mapped_frame_time(self):
        with self._lock:
            return self._last_mapped_frame_time

    @last_mapped_frame_time.setter
    def last_mapped_frame_time(self, value: float) -> None:
        with self._lock:
            self._last_mapped_frame_time = value
