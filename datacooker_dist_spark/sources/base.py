"""Adapter lifecycle contract (reference §3.2/§3.3).

The reference instantiates adapters reflectively, then calls
``configure(params)`` + ``initialize(context, config, path)`` + ``load(name,
partCount, partitioning)`` / ``save(name, stream)`` (reference
``Main.java:121-146``). The same lifecycle here, minus reflection: the
registry hands back classes, ``load`` returns an ordered dict of named
sub-streams (reference returns ``ListOrderedMap<String, DataStream>``,
``Main.java:126``).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import SparkSession

from ..model import DataStream, Partitioning


class Adapter(ABC):
    verb: str = ""

    def __init__(self) -> None:
        self.params: dict = {}
        self.spark: SparkSession | None = None
        self.path: str = ""

    def configure(self, params: dict | None) -> "Adapter":
        self.params = dict(params or {})
        return self

    def initialize(self, spark: SparkSession, path: str) -> "Adapter":
        self.spark = spark
        self.path = path
        return self


class InputAdapter(Adapter):
    @abstractmethod
    def load(
        self,
        name: str,
        part_count: int | None = None,
        partitioning: Partitioning = Partitioning.HASHCODE,
    ) -> dict[str, DataStream]:
        """Load the source into one or more named sub-streams."""


class OutputAdapter(Adapter):
    @abstractmethod
    def save(self, name: str, stream: DataStream) -> None:
        """Persist one stream under ``name`` (an action — runs the job)."""
