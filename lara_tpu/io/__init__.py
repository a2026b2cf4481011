from lara_tpu.io.records import RnaRecord, InputStorage
from lara_tpu.io.writers import OutputLibrary

__all__ = ["RnaRecord", "InputStorage", "OutputLibrary"]
