from .core import (  # noqa: F401
    clamp,
    derive_pip_size,
    gross_pnl_from_price_diff,
    mid_price,
    normalize_broker_type,
    rescale,
    session_from_utc_hour,
)
