from .inspect import explain_str, physical_ops, count_exchanges  # noqa: F401
