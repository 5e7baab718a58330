from .checks import explain_str, has_operator, pushed_filters  # noqa: F401
