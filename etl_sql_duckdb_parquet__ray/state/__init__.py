from .memtune import tune_malloc  # noqa: F401
