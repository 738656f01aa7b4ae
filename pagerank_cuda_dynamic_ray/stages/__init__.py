from . import dedup, similarity, text_stage, multimodal  # noqa: F401
