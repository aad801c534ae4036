from loner_tpu.common.frame import Frame
from loner_tpu.common.pose import Pose
from loner_tpu.common.sensors import Image, LidarScan
from loner_tpu.common.settings import Settings, generate_options
from loner_tpu.common.signals import SharedState, Signal, Slot, StopSignal
from loner_tpu.common.world_cube import WorldCube, compute_world_cube

__all__ = [
    "Frame", "Pose", "Image", "LidarScan", "Settings", "generate_options",
    "SharedState", "Signal", "Slot", "StopSignal", "WorldCube",
    "compute_world_cube",
]
