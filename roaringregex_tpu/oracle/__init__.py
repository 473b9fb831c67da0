from .engine import OracleEngine  # noqa: F401
