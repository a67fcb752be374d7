from .generator import ChangeLogSpec, compute_oracle, generate_scenario  # noqa: F401
