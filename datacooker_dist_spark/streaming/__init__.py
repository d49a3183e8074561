from .pipeline import run_available_now, windowed_counts  # noqa: F401
