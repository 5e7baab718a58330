from .helpers import net_price, r4, r6  # noqa: F401
