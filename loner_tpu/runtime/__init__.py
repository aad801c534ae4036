from loner_tpu.runtime.logger import DefaultLogger
from loner_tpu.runtime.loner import Loner
from loner_tpu.runtime.resume import find_resume_checkpoint, resume_run

__all__ = ["DefaultLogger", "Loner", "find_resume_checkpoint", "resume_run"]
