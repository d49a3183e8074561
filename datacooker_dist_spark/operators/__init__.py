from . import dedup, multimodal, relational, similarity, text, timeseries  # noqa: F401
