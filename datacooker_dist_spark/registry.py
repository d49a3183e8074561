"""Adapter registry: verb → adapter class (reference A21).

The reference discovers adapters via a ``@RegisteredPackage`` annotation scan
into ``Adapters.INPUTS/OUTPUTS`` maps (reference ``Main.java:114-117,129-132``,
``datacooker-jdbc/.../package-info.java:5``). Here the same contract is a pair
of dicts populated by decorators at import time.
"""

from __future__ import annotations

INPUTS: dict[str, type] = {}
OUTPUTS: dict[str, type] = {}


def input_adapter(verb: str):
    """Register a class as the input adapter for ``verb``."""

    def deco(cls: type) -> type:
        cls.verb = verb
        INPUTS[verb] = cls
        return cls

    return deco


def output_adapter(verb: str):
    """Register a class as the output adapter for ``verb``."""

    def deco(cls: type) -> type:
        cls.verb = verb
        OUTPUTS[verb] = cls
        return cls

    return deco


def resolve_input(verb: str) -> type:
    try:
        return INPUTS[verb]
    except KeyError:
        raise KeyError(
            f"Unknown input adapter verb '{verb}'. Known: {sorted(INPUTS)}"
        ) from None


def resolve_output(verb: str) -> type:
    try:
        return OUTPUTS[verb]
    except KeyError:
        raise KeyError(
            f"Unknown output adapter verb '{verb}'. Known: {sorted(OUTPUTS)}"
        ) from None
