from .config import Configuration, DistLocation, DistTask  # noqa: F401
from .runner import run  # noqa: F401
