from . import hadoop, jdbc  # noqa: F401  (import registers the adapters)
