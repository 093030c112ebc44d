from .graph import GraphFrame  # noqa: F401
