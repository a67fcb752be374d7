from .core import (  # noqa: F401
    bitcoin_to_satoshi,
    item_id,
    nonstandard_address,
    unix_ts_to_string,
)
