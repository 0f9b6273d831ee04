from .logging import get_logger
from .config import Config, load_config
from .profiling import StageTimer, trace_profile
