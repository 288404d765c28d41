from .expressions import (  # noqa: F401
    decode_map,
    half_open_window,
    null_default,
    year_month,
)
