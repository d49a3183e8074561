"""Copy-direction configuration (reference A20/A22).

Same JSON shape as the reference (``dist/Configuration.java:89-107``):

    {"direction_name": [
        {"source": {"adapter": verb, "path": uri, "name": n,
                    "part_count": k, "partitioning": "HASHCODE",
                    "params": {...}},
         "dest":   {...}},
        ...]}

``partitioning`` (source side only) picks the repartition mode:
HASHCODE (default) / RANDOM / SOURCE / BY_SOURCE (see ``model.Partitioning``).

Config may live on any Spark-readable filesystem: ``Configuration.load``
reads it through the SparkContext like the reference's ``wholeTextFiles``
trick (``Main.java:66-83``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class DistLocation:
    adapter: str
    path: str
    name: str = ""
    part_count: int | None = None
    partitioning: str = "HASHCODE"
    params: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "DistLocation":
        part = d.get("partitioning", "HASHCODE")
        valid = {"HASHCODE", "RANDOM", "SOURCE", "BY_SOURCE"}
        if part not in valid:
            raise ValueError(
                f"Unknown partitioning '{part}'; expected one of {sorted(valid)}"
            )
        return cls(
            adapter=d["adapter"],
            path=d["path"],
            name=d.get("name", ""),
            part_count=d.get("part_count"),
            partitioning=part,
            params=d.get("params") or {},
        )


@dataclass
class DistTask:
    source: DistLocation
    dest: DistLocation

    @classmethod
    def from_dict(cls, d: dict) -> "DistTask":
        return cls(
            source=DistLocation.from_dict(d["source"]),
            dest=DistLocation.from_dict(d["dest"]),
        )


@dataclass
class Configuration:
    directions: dict[str, list[DistTask]]

    @classmethod
    def from_json(cls, text: str) -> "Configuration":
        raw = json.loads(text)
        return cls(
            directions={
                name: [DistTask.from_dict(t) for t in tasks]
                for name, tasks in raw.items()
            }
        )

    @classmethod
    def load(cls, spark, path: str) -> "Configuration":
        """Read the config JSON through Spark so it may live on HDFS/S3
        (reference ``Main.java:71-83``)."""
        text = "\n".join(
            spark.sparkContext.textFile(path).collect()
        )
        return cls.from_json(text)

    def direction(self, name: str | None = None) -> list[DistTask]:
        """Pick a direction: explicit name, or the sole one (several present
        but unspecified is an error — reference ``Main.java:85-99``)."""
        if name:
            if name not in self.directions:
                raise KeyError(f"No direction '{name}' in config")
            return self.directions[name]
        if len(self.directions) != 1:
            raise ValueError(
                f"Config has {len(self.directions)} directions "
                f"({sorted(self.directions)}); specify one with -d"
            )
        return next(iter(self.directions.values()))
