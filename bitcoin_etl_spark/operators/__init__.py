from .reduce import last_event_wins  # noqa: F401
from .validate import split_valid_invalid, tokens_valid_udf  # noqa: F401
from .apply import EpochApplier  # noqa: F401
