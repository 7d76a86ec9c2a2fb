from .builder import Workflow, ThreadBuilder  # noqa: F401
