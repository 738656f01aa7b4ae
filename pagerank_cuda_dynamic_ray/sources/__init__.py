from . import transcripts, edges  # noqa: F401
