from .loader import TABLE_NAMES, load  # noqa: F401
