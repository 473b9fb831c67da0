from . import scan_xla  # noqa: F401
