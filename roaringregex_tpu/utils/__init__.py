from .config import RrxConfig, get_config, set_config  # noqa: F401
from .profiling import ScanTimer, throughput_report, trace  # noqa: F401
