"""Device job pool (reference's multi-GPU worker pools, TPU-native form).

Runs on the 8-device virtual CPU mesh from conftest."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loner_tpu.parallel.device_pool import map_jobs


def test_results_in_job_order_and_on_device():
    used = []

    def fn(x, device):
        used.append(device)
        y = jnp.asarray(float(x)) * 2.0
        assert next(iter(y.devices())) == device
        return float(y)

    out = map_jobs(fn, list(range(20)))
    assert out == [2.0 * i for i in range(20)]
    assert len(set(used)) > 1, "expected fan-out across the 8-device mesh"


def test_single_device_degrades_to_sequential():
    dev = jax.devices()[0]
    order = []

    def fn(x, device):
        assert device == dev
        order.append(x)
        return x

    out = map_jobs(fn, [3, 1, 2], devices=[dev])
    assert out == [3, 1, 2] and order == [3, 1, 2]


def test_worker_exception_propagates():
    def fn(x, device):
        if x == 5:
            raise ValueError("boom")
        time.sleep(0.01)
        return x

    with pytest.raises(ValueError, match="boom"):
        map_jobs(fn, list(range(10)))


def test_empty_jobs():
    assert map_jobs(lambda x, d: x, []) == []
