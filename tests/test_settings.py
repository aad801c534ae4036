"""Tests for the config system: includes, overlays, ablation sweeps."""
import textwrap

import pytest

from loner_tpu.common.settings import Settings, generate_change_list, generate_options


@pytest.fixture
def cfg_tree(tmp_path):
    (tmp_path / "inner.yaml").write_text("alpha: 1\nbeta: [2, 3]\n")
    (tmp_path / "base.yaml").write_text(
        textwrap.dedent(
            """
            mapper:
              optimizer:
                num_iterations: 10
                num_samples: 20
              model: !include inner.yaml
            tracker:
              num_icp_iterations: 20
            """
        )
    )
    return tmp_path


def test_include_and_attr_access(cfg_tree):
    s = Settings.load_from_file(str(cfg_tree / "base.yaml"))
    assert s.mapper.optimizer.num_iterations == 10
    assert s.mapper.model.alpha == 1
    assert s.mapper.model.beta == [2, 3]


def test_augment(cfg_tree):
    s = Settings.load_from_file(str(cfg_tree / "base.yaml"))
    s.augment({"mapper": {"optimizer": {"num_samples": 99}}, "tracker": {"num_icp_iterations": 5}})
    assert s.mapper.optimizer.num_samples == 99
    assert s.tracker.num_icp_iterations == 5
    assert s.mapper.optimizer.num_iterations == 10


def test_change_list():
    changes = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
    got = dict(generate_change_list(changes))
    assert got == {("a", "b"): 1, ("a", "c", "d"): 2, ("e",): 3}


def test_generate_options_one_at_a_time(cfg_tree):
    (cfg_tree / "overrides.yaml").write_text(
        textwrap.dedent(
            """
            mapper:
              optimizer:
                num_iterations: [5, 15]
            tracker:
              num_icp_iterations: [10]
            """
        )
    )
    opts, descs = generate_options(
        str(cfg_tree / "base.yaml"), str(cfg_tree / "overrides.yaml")
    )
    assert len(opts) == 3
    iters = sorted(o.mapper.optimizer.num_iterations for o in opts)
    assert iters == [5, 10, 15]
    # one-at-a-time: varying tracker leaves mapper at baseline
    tracker_variant = [o for o in opts if o.tracker.num_icp_iterations == 10][0]
    assert tracker_variant.mapper.optimizer.num_iterations == 10


def test_generate_options_cross_product(cfg_tree):
    (cfg_tree / "overrides.yaml").write_text(
        textwrap.dedent(
            """
            mapper:
              optimizer:
                num_iterations: [5, 15]
            tracker:
              num_icp_iterations: [10, 30]
            """
        )
    )
    opts, _ = generate_options(
        str(cfg_tree / "base.yaml"), str(cfg_tree / "overrides.yaml"), run_all_combos=True
    )
    assert len(opts) == 4
    combos = {(o.mapper.optimizer.num_iterations, o.tracker.num_icp_iterations) for o in opts}
    assert combos == {(5, 10), (5, 30), (15, 10), (15, 30)}


def test_deepcopy_independence(cfg_tree):
    import copy

    s = Settings.load_from_file(str(cfg_tree / "base.yaml"))
    s2 = copy.deepcopy(s)
    s2.mapper.optimizer.num_iterations = 999
    assert s.mapper.optimizer.num_iterations == 10
