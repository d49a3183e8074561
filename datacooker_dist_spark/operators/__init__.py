from . import audit, dedup, graph, multimodal, pipeline, relational, similarity, spatial, text, timeseries  # noqa: F401
