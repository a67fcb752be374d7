from .tail import ChangeLogTailer  # noqa: F401
from .feed import ChangeFeedTailer  # noqa: F401
