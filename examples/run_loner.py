#!/usr/bin/env python3
"""Run loner_tpu SLAM on a scan-stream dataset (or a synthetic scene).

TPU-native counterpart of the reference CLI (examples/run_loner.py:177-436)
with rosbag ingest replaced by the npz scan-stream format
(loner_tpu.datasets.scan_stream); ablation sweeps (--overrides), repeated
trials (--num_repeats), GT-pose world-cube computation, duration limits,
and runtime.txt all preserved.

Usage:
    python examples/run_loner.py <dataset_dir> <config.yaml> [options]
    python examples/run_loner.py synthetic cfg/synthetic/box_room.yaml
"""
from __future__ import annotations

import argparse
import copy
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from loner_tpu.common.jax_setup import enable_persistent_cache

enable_persistent_cache()

from loner_tpu.common.settings import Settings, generate_options
from loner_tpu.datasets.scan_stream import ScanStreamReader, apply_fov_mask
from loner_tpu.runtime.loner import Loner


def build_synthetic_dataset(
    tmp_dir: str, num_scans: int = 100, with_camera: bool = False,
    scene_name: str = "box_room", noise_std: float = 0.0,
    dropout: float = 0.0,
) -> str:
    from loner_tpu.common.pose import Pose
    from loner_tpu.datasets.scan_stream import ScanStreamWriter
    from loner_tpu.datasets.synthetic import (
        BoxRoomScene,
        VirtualCamera,
        VirtualLidar,
        generate_courtyard_sequence,
        generate_sequence,
    )

    if scene_name.startswith("courtyard"):
        # Reference-scale scene (64 x 48 m, ray_range [1, 50] envelope —
        # canteen-class per /root/reference/cfg/fusion_portable/
        # canteen.yaml:19); num_scans is ignored — the length is set by
        # the waypoint loop (~150 s at walking speed). The "_actors"
        # variant adds moving pedestrians (robustness drill).
        scans, poses, ts, scene, _ = generate_courtyard_sequence(
            with_actors=scene_name.endswith("_actors"),
            noise_std=noise_std, dropout=dropout,
        )
    else:
        # open_sky removes the ceiling: upward rays return nothing, so the
        # tracker's sky segmentation finds real sky regions and the mapper's
        # sky supervision has something to carve (reference tracker.py:257-296).
        scene = BoxRoomScene(open_top=(scene_name == "open_sky"))
        scans, poses, ts, scene, _ = generate_sequence(
            num_scans=num_scans, scene=scene,
            lidar=VirtualLidar(num_channels=32, num_columns=512),
            noise_std=noise_std,
        )
    # Write to a staging dir and rename: an interrupted build must not
    # leave a half-written dataset that later runs mistake for complete.
    staging = tmp_dir.rstrip("/") + ".partial"
    if os.path.exists(staging):
        import shutil

        shutil.rmtree(staging)
    writer = ScanStreamWriter(staging, meta={"sensor": "synthetic-box-room"})
    for s in scans:
        writer.add_scan(s)
    if with_camera:
        cam = VirtualCamera()
        for i, s in enumerate(scans):
            writer.add_image(cam.render(scene, Pose(poses[i])), s.get_start_time())
    writer.write_gt(poses, ts)
    os.rename(staging, tmp_dir)
    return tmp_dir


def load_sequence_config(config_path: str):
    """Parse a per-sequence yaml (reference cfg/<family>/<seq>.yaml shape:
    ``baseline`` + ``changes`` + runner keys + analysis keys). Returns
    (baseline_path, changes, passthrough, dataset) — all None when the
    file is a plain config. ``passthrough`` holds top-level keys the
    runner itself doesn't consume (lidar_vertical_fov,
    meshing_bounding_box, ...): they must land in the saved full config
    because the offline tools read them from there (the reference reads
    the sequence yaml directly — analysis/renderer_lidar.py:262,
    analysis/meshing.py:56-58)."""
    import yaml

    try:
        with open(config_path) as f:
            raw_cfg = yaml.safe_load(f)
    except yaml.YAMLError:
        # Plain configs may use !include (Settings' loader handles it);
        # sequence yamls are flat. Not-a-sequence-config is the answer.
        return None, None, None, None
    if not (isinstance(raw_cfg, dict) and "baseline" in raw_cfg):
        return None, None, None, None
    base = os.path.join(os.path.dirname(config_path), raw_cfg["baseline"])
    consumed = {
        "baseline", "changes", "dataset", "calibration",
        "groundtruth_traj", "experiment_name", "dataset_family",
    }
    passthrough = {
        k: v for k, v in raw_cfg.items() if k not in consumed
    } or None
    return base, raw_cfg.get("changes"), passthrough, raw_cfg.get("dataset")


def run_trial(
    settings: Settings,
    dataset_path: str,
    experiment_name: str = None,
    config_idx: int = None,
    trial_idx: int = None,
    duration: float = None,
    resume_from: str = None,
) -> str:
    reader = ScanStreamReader(dataset_path)

    gt_poses = reader.gt_poses()
    if gt_poses is not None and settings.system.world_cube.compute_from_groundtruth:
        # Zero-origin with the LEFT inverse: a global world-frame change
        # that keeps multi-scan geometry consistent.
        gt_zeroed = np.linalg.inv(gt_poses[0])[None] @ gt_poses
        lidar_poses, bbox = gt_zeroed, None
    else:
        lidar_poses, bbox = None, settings.system.world_cube.trajectory_bounding_box

    ray_range = settings.mapper.optimizer.model_config.data.ray_range

    loner = Loner(settings)
    loner.initialize(
        None,
        lidar_poses,
        None,
        ray_range,
        dataset_path=dataset_path,
        experiment_name=experiment_name,
        config_idx=config_idx,
        trial_idx=trial_idx,
        traj_bounding_box=bbox,
        log_directory=resume_from,
    )
    loner.start()

    resume_idx = 0
    if resume_from is not None:
        from loner_tpu.runtime.resume import resume_run

        resume_idx = resume_run(loner, reader, resume_from)
        print(f"Resuming {resume_from} at scan {resume_idx}/{len(reader)}")

    if settings.system.get("precompile", False) and len(reader) > 0:
        # Compile everything before the clock starts: the runtime.txt
        # real-time factor then measures steady-state SLAM, not XLA
        # compiles (which a deployed system pays once, offline, via the
        # persistent compilation cache). The warm-up point count must see
        # the SAME filtering the streamed scans get — an FOV-masked scan
        # can land in a different pow2 pad bucket than the raw one, which
        # would push the real compiles back inside the loop.
        scan0 = reader.read_scan(0)
        if settings.system.lidar_fov.enabled:
            scan0 = apply_fov_mask(scan0, settings.system.lidar_fov.range)
        t_warm = loner.warm_up(len(scan0))
        if settings.system.get("seed_cache_only", False):
            # Install-time cache seeding (docs/REAL_DATA.md cold-start
            # budget): compile every tracking/mapping program into the
            # persistent XLA cache, then exit without streaming. A later
            # cold process on this machine pays only cache DEserialization
            # at warm-up, not compiles.
            print(f"seed_cache_only: programs compiled in {t_warm:.1f}s; exiting")
            loner.stop()
            return

    gt_offset = None

    # Camera stream (intensity supervision): replayed in time order with
    # the scans, like the reference's bag loop (run_loner.py:281-328).
    image_files = (
        [] if settings.system.lidar_only else reader.image_files()
    )
    next_img = 0
    if resume_idx > 0 and image_files:
        # Skip pre-resume images by TIMESTAMP (cheap header reads) —
        # decoding every earlier npz just for the decimation gate to
        # discard it adds seconds of pointless startup on long sequences.
        # Keep anything within match tolerance of the first post-resume
        # scan's sweep start: it could still match that scan.
        resume_start = reader.read_scan(resume_idx).get_start_time()
        tol = float(
            settings.tracker.frame_synthesis.get("frame_match_tolerance", 0.01)
        )
        while (
            next_img < len(image_files)
            and reader.read_image_timestamp(next_img) < resume_start - tol
        ):
            next_img += 1

    if resume_idx > 0 and reader.gt_interpolator is not None:
        # The zero-origin offset must be the ORIGINAL run's (the first
        # scan's GT) — deriving it from the first post-resume scan would
        # re-zero the trajectory mid-sequence.
        first = reader.read_scan(0).get_start_time()
        if reader.gt_interpolator.contains(first):
            gt_offset = reader.gt_interpolator.at(first).inv()

    start = time.time()
    init_time = None
    fov = settings.system.lidar_fov

    def stream():
        gt_interp = reader.gt_interpolator
        for i in range(resume_idx, len(reader)):
            scan = reader.read_scan(i)
            gt = None
            if gt_interp is not None and gt_interp.contains(scan.get_start_time()):
                gt = gt_interp.at(scan.get_start_time())
            yield scan, gt

    for scan, gt in stream():
        if init_time is None:
            init_time = scan.get_start_time()
        if duration is not None and scan.get_start_time() - init_time > duration:
            break
        while next_img < len(image_files):
            img, img_ts = reader.read_image(next_img)
            if img_ts > scan.get_start_time():
                break
            from loner_tpu.common.sensors import Image

            loner.process_rgb(Image(img, img_ts))
            next_img += 1
        if fov.enabled:
            scan = apply_fov_mask(scan, fov.range)
        if len(scan) == 0:
            continue
        gt_pose = None
        if gt is not None:
            if gt_offset is None:
                gt_offset = gt.inv()
            gt_pose = gt_offset * gt
        loner.process_lidar(scan, gt_pose)
    ingest_done = time.time()
    loner.stop()
    end = time.time()

    with open(os.path.join(loner.log_directory, "runtime.txt"), "w") as f:
        f.write(f"Runtime: {ingest_done - start}\n")
        f.write(f"Runtime With Overhead: {end - start}\n")
    print(f"Finished. Logs in {loner.log_directory}")
    return loner.log_directory


def main() -> None:
    parser = argparse.ArgumentParser(description="Run LONER-TPU SLAM")
    parser.add_argument(
        "dataset_path", nargs="?", default=None,
        help="scan-stream dir or 'synthetic'",
    )
    parser.add_argument("config", nargs="?", default=None, help="path to the config yaml")
    parser.add_argument(
        "--resume", default=None, metavar="LOGDIR",
        help="continue a previous run from its newest full checkpoint "
             "(config + dataset come from the run's full_config.pkl; "
             "no reference analog — its checkpoints are analysis-only)",
    )
    parser.add_argument("--experiment_name", default=None)
    parser.add_argument("--overrides", default=None, help="ablation overrides yaml")
    parser.add_argument("--run_all_combos", action="store_true")
    parser.add_argument("--num_repeats", type=int, default=1)
    parser.add_argument("--duration", type=float, default=None, help="seconds of data")
    parser.add_argument(
        "--synthetic_scans", type=int, default=100,
        help="scan count when dataset_path is 'synthetic'",
    )
    parser.add_argument(
        "--synthetic_scene",
        choices=["box_room", "open_sky", "courtyard", "courtyard_actors"],
        default="box_room",
        help="scene variant when dataset_path is 'synthetic' (open_sky "
        "removes the ceiling so sky segmentation finds real sky; "
        "courtyard is the reference-scale 64x48 m outdoor scene, "
        "courtyard_actors adds moving pedestrians)",
    )
    parser.add_argument(
        "--synthetic_noise_std", type=float, default=0.0,
        help="Gaussian range-noise sigma (m) for the synthetic dataset "
             "(robustness drills)",
    )
    parser.add_argument(
        "--synthetic_dropout", type=float, default=0.0,
        help="per-return dropout probability for the synthetic dataset "
             "(robustness drills; courtyard scenes only)",
    )
    parser.add_argument(
        "--synthetic_camera", action="store_true",
        help="also render virtual-camera images into the synthetic "
             "dataset (intensity supervision)",
    )
    parser.add_argument(
        "--gpu_ids", nargs="*", default=None,
        help="device ordinals for --trial_workers pinning (reference "
             "--gpu_ids semantics; ignored when trials run sequentially)",
    )
    parser.add_argument(
        "--trial_workers", type=int, default=0,
        help="run sweep/repeat trials through a pool of this many "
             "per-device subprocesses (reference fans one process per "
             "GPU, run_loner.py:339-424); 0/1 = sequential in-process",
    )
    parser.add_argument(
        "--_trial_spec", default=None, help=argparse.SUPPRESS
    )
    parser.add_argument(
        "--lite", action="store_true", help="reduced model for quick runs / CPU"
    )
    parser.add_argument(
        "--cpu", action="store_true", help="force the CPU backend (debugging)"
    )
    parser.add_argument(
        "--seed_cache", action="store_true",
        help="compile all device programs into the persistent XLA cache "
             "and exit (install-time cold-start seeding, docs/REAL_DATA.md)",
    )
    parser.add_argument(
        "--precompile", action="store_true",
        help="pre-compile all device programs before streaming "
             "(system.precompile)",
    )
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args._trial_spec is not None:
        # Pool-worker mode: run exactly one trial from a pickled spec
        # (written by the parent below). Device pinning arrived via the
        # environment (TPU_VISIBLE_DEVICES) before the backend
        # initialized; --cpu was forwarded on the command line.
        import pickle

        with open(args._trial_spec, "rb") as f:
            spec = pickle.load(f)
        run_trial(
            Settings(spec["settings"]),
            spec["dataset_path"],
            experiment_name=spec["experiment_name"],
            config_idx=spec["config_idx"],
            trial_idx=spec["trial_idx"],
            duration=spec["duration"],
        )
        return

    if args.resume is not None:
        import pickle

        with open(os.path.join(args.resume, "full_config.pkl"), "rb") as f:
            cfg_dict = pickle.load(f)
        settings = Settings(cfg_dict)
        run_trial(
            settings,
            settings["dataset_path"],
            duration=args.duration,
            resume_from=args.resume,
        )
        return

    if args.dataset_path is None or args.config is None:
        parser.error("dataset_path and config are required unless --resume is given")

    # Sequence-config support (reference per-sequence yamls): a file with
    # `baseline:` + `changes:` loads the baseline and applies the overlay;
    # its `dataset:` provides the default dataset path.
    base_config, seq_changes, seq_passthrough, seq_dataset = (
        load_sequence_config(args.config)
    )
    if base_config is not None:
        args.config = base_config
        if args.dataset_path in ("auto", "-"):
            args.dataset_path = os.path.expanduser(seq_dataset)

    if args.dataset_path == "synthetic":
        n = args.synthetic_scans
        if args.synthetic_scene.startswith("courtyard"):
            suffix = ""  # sequence length comes from the waypoint loop
        else:
            suffix = "" if n == 100 else f"_{n}"
        if args.synthetic_camera:
            suffix += "_cam"
        if args.synthetic_scene != "box_room":
            suffix += f"_{args.synthetic_scene}"
        if args.synthetic_noise_std > 0:
            suffix += f"_n{args.synthetic_noise_std:g}"
        if args.synthetic_dropout > 0:
            suffix += f"_d{args.synthetic_dropout:g}"
        dataset_path = os.path.join("./outputs", f"synthetic_dataset{suffix}")
        if not os.path.exists(os.path.join(dataset_path, "scans")):
            desc = (
                args.synthetic_scene
                if args.synthetic_scene.startswith("courtyard")
                else f"{n} scans"
            )
            print(f"Generating synthetic dataset ({desc})...")
            build_synthetic_dataset(
                dataset_path, num_scans=n, with_camera=args.synthetic_camera,
                scene_name=args.synthetic_scene,
                noise_std=args.synthetic_noise_std,
                dropout=args.synthetic_dropout,
            )
    else:
        dataset_path = args.dataset_path

    lite_changes = (
        {
            "mapper": {
                "optimizer": {
                    "num_samples": {"lidar": 256, "sky": 32},
                    "model_config": {
                        "model": {"render": {"N_samples_train": 128, "N_samples_test": 256}},
                    },
                }
            }
        }
        if args.lite
        else None
    )

    precompile_changes = (
        {"system": {"precompile": True}} if args.precompile else None
    )
    if args.seed_cache:
        precompile_changes = {
            "system": {"precompile": True, "seed_cache_only": True}
        }

    options, descriptions = generate_options(
        args.config,
        args.overrides,
        args.run_all_combos,
        augmentations=[
            seq_passthrough, seq_changes, lite_changes, precompile_changes
        ],
    )

    multi = len(options) > 1 or args.num_repeats > 1
    jobs = []
    for config_idx, (settings, desc) in enumerate(zip(options, descriptions)):
        if desc:
            print(f"config_{config_idx}: {desc}")
        for trial_idx in range(args.num_repeats):
            # Each trial gets its OWN Settings copy: a running trial
            # mutates its settings (experiment_name, log paths, debug
            # flag ANDing), which must not leak into sibling trials.
            trial_settings = copy.deepcopy(settings)
            if args.num_repeats > 1:
                # Offset the PRNG seed per trial: the pipeline is
                # deterministic (explicit keys), so identical seeds would
                # make every repeat bit-identical — the reference's
                # 5-trial statistics rely on CUDA nondeterminism instead.
                base = int(trial_settings.mapper.optimizer.get("seed", 0))
                trial_settings.augment(
                    {"mapper": {"optimizer": {"seed": base + trial_idx}}}
                )
            jobs.append((trial_settings, config_idx, trial_idx))

    def run_one(job, _device):
        settings, config_idx, trial_idx = job
        return run_trial(
            settings,
            dataset_path,
            experiment_name=args.experiment_name,
            config_idx=config_idx if multi else None,
            trial_idx=trial_idx if args.num_repeats > 1 else None,
            duration=args.duration,
        )

    # Multi-trial fan-out (reference run_loner.py:339-424): one
    # SUBPROCESS per trial, at most --trial_workers in flight, each
    # pinned to a device via the environment (a single process cannot
    # run concurrent trials: each spawns tracker/mapper threads and
    # jax.default_device is thread-local). Default stays sequential
    # in-process — correct on the 1-chip/1-core hosts this repo is
    # benchmarked on.
    if args.trial_workers > 1 and len(jobs) > 1:
        import pickle
        import tempfile

        from loner_tpu.parallel.trial_pool import run_pool

        spec_dir = tempfile.mkdtemp(prefix="loner_trials_")
        commands = []
        for j, (settings, config_idx, trial_idx) in enumerate(jobs):
            spec = {
                "settings": settings.as_plain_dict(),
                "dataset_path": dataset_path,
                "experiment_name": args.experiment_name,
                "config_idx": config_idx if multi else None,
                "trial_idx": trial_idx if args.num_repeats > 1 else None,
                "duration": args.duration,
            }
            spec_path = os.path.join(spec_dir, f"trial_{j}.pkl")
            with open(spec_path, "wb") as f:
                pickle.dump(spec, f)
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--_trial_spec", spec_path]
            if args.cpu:
                cmd.append("--cpu")
            commands.append(cmd)
        results = run_pool(
            commands, args.trial_workers, devices=args.gpu_ids,
            on_start=lambda idx, dev: print(
                f"trial {idx}: started"
                + (f" on device {dev}" if dev is not None else "")
            ),
        )
        failed = [r for r in results if r.returncode != 0]
        for r in results:
            print(
                f"trial {r.index}: rc={r.returncode} wall={r.wall_s:.1f}s"
                + (f" device={r.device}" if r.device is not None else "")
            )
        if failed:
            sys.exit(1)
        return

    for job in jobs:
        run_one(job, None)


if __name__ == "__main__":
    main()
