"""Parallel SLAM-trial pool (reference examples/run_loner.py:339-424
fans trials one process per GPU; loner_tpu mirrors that with
loner_tpu/parallel/trial_pool.py + run_loner.py --trial_workers)."""
import os
import subprocess
import sys

import pytest

from loner_tpu.parallel.trial_pool import run_pool

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stamp_cmd(path: str, sleep_s: float) -> list:
    code = (
        "import time,sys;"
        "open(sys.argv[1],'w').write(str(time.time()));"
        f"time.sleep({sleep_s});"
        "open(sys.argv[1],'a').write(' '+str(time.time()))"
    )
    return [sys.executable, "-c", code, path]


def _interval(path: str):
    a, b = open(path).read().split()
    return float(a), float(b)


class TestRunPool:
    def test_concurrent_execution_and_bounded_parallelism(self, tmp_path):
        """3 jobs, 2 workers: the first two must OVERLAP in wall time
        (concurrency — even a 1-core host timeslices sleeping processes),
        and the third must start only after one of them ends (bound)."""
        paths = [str(tmp_path / f"t{i}") for i in range(3)]
        results = run_pool([_stamp_cmd(p, 1.5) for p in paths], workers=2)
        assert [r.returncode for r in results] == [0, 0, 0]
        iv = [_interval(p) for p in paths]
        assert iv[0][0] < iv[1][1] and iv[1][0] < iv[0][1]  # 0 and 1 overlap
        assert iv[2][0] >= min(iv[0][1], iv[1][1]) - 0.2  # 2 waits for a slot

    def test_device_pinning_env(self, tmp_path):
        """Worker slot i pins devices[i % len] via TPU_VISIBLE_DEVICES."""
        paths = [str(tmp_path / f"d{i}") for i in range(2)]
        code = (
            "import os,sys;"
            "open(sys.argv[1],'w').write(os.environ.get('TPU_VISIBLE_DEVICES','MISSING'))"
        )
        cmds = [[sys.executable, "-c", code, p] for p in paths]
        results = run_pool(cmds, workers=2, devices=["0", "1"])
        assert all(r.returncode == 0 for r in results)
        assert sorted(open(p).read() for p in paths) == ["0", "1"]

    def test_failure_reported_not_raised(self, tmp_path):
        ok = str(tmp_path / "ok")
        cmds = [
            [sys.executable, "-c", "import sys; sys.exit(3)"],
            _stamp_cmd(ok, 0.1),
        ]
        results = run_pool(cmds, workers=2)
        assert results[0].returncode == 3
        assert results[1].returncode == 0


@pytest.mark.slow
@pytest.mark.e2e
class TestCliTrialPool:
    """End-to-end: --num_repeats 2 --trial_workers 2 runs two seed-offset
    SLAM trials as concurrent subprocesses and both produce the full
    artifact contract."""

    def test_parallel_repeats(self, tmp_path):
        env = os.environ.copy()
        env["LONER_COMPILE_CACHE"] = os.path.expanduser(
            "~/.cache/jax_test_compilation"
        )
        out = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "examples", "run_loner.py"),
                "synthetic", os.path.join(REPO, "cfg/synthetic/box_room_tiny.yaml"),
                "--cpu", "--lite", "--synthetic_scans", "40",
                "--duration", "4.0",
                "--num_repeats", "2", "--trial_workers", "2",
                "--experiment_name", "pool_e2e",
            ],
            cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=1200,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        base = tmp_path / "outputs" / "pool_e2e"
        trial_dirs = sorted(p for p in base.iterdir() if p.name.startswith("trial_"))
        assert len(trial_dirs) == 2, list(base.iterdir())
        intervals = []
        for d in trial_dirs:
            traj = d / "trajectory" / "estimated_trajectory.txt"
            assert traj.exists(), d
            assert (d / "checkpoints" / "final.tar").exists()
            st = (d / "runtime.txt").stat()
            intervals.append(st.st_mtime)
        # Concurrency proof: both trials finished within each other's
        # lifetime — their runtime.txt mtimes are far closer than one
        # sequential trial's wall (the pool ran them together).
        run_walls = []
        for d in trial_dirs:
            txt = (d / "runtime.txt").read_text()
            run_walls.append(float(txt.splitlines()[1].split(":")[1]))
        assert abs(intervals[0] - intervals[1]) < max(run_walls)
