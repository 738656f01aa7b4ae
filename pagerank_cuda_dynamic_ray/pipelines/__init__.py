from . import graph, analytics  # noqa: F401
