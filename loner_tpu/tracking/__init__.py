from loner_tpu.tracking.frame_synthesis import FrameSynthesis
from loner_tpu.tracking.icp import estimate_normals, registration_icp, run_icp_schedule
from loner_tpu.tracking.tracker import Tracker

__all__ = [
    "FrameSynthesis", "Tracker", "estimate_normals", "registration_icp",
    "run_icp_schedule",
]
