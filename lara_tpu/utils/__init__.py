from lara_tpu.utils.logging import log, set_verbosity, get_verbosity

__all__ = ["log", "set_verbosity", "get_verbosity"]
