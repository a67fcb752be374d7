from .tail import ChangeLogTailer  # noqa: F401
