"""LONER-TPU: a TPU-native LiDAR-only neural-implicit SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
umautobots/LONER (RA-L 2023): real-time LiDAR odometry (batched XLA
point-to-plane ICP) + online neural-implicit mapping (hash-grid NeRF with
the JS dynamic-margin line-of-sight loss), plus the offline analysis suite
(depth/LiDAR renderers, meshing, trajectory and map metrics).

Subpackages:
  common    — SE(3) math, poses, world cube, sensors, config, signals
  models    — neural field, volume rendering, samplers, losses, occ grid
  ops       — TPU compute kernels (Pallas) and geometry ops (ICP, voxel)
  mapping   — keyframes, windowed joint pose+map optimization
  tracking  — ICP odometry, frame synthesis, motion compensation
  runtime   — orchestrator, logging, checkpoints
  parallel  — multi-chip sharding (jax.sharding Mesh + shard_map)
  analysis  — offline renderers, meshing, metrics
  datasets  — scan-stream readers and synthetic scenes
"""

__version__ = "0.1.0"
