from loner_tpu.runtime.logger import DefaultLogger
from loner_tpu.runtime.loner import Loner

__all__ = ["DefaultLogger", "Loner"]
