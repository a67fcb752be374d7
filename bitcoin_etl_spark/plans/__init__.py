from .queries import QUERIES, ORACLES, run_query  # noqa: F401
