"""Adapter registry: verb → adapter class + typed param metadata (A21).

The reference discovers adapters via a ``@RegisteredPackage`` annotation scan
into ``Adapters.INPUTS/OUTPUTS`` maps (reference ``Main.java:114-117,129-132``,
``datacooker-jdbc/.../package-info.java:5``) and carries per-adapter metadata
— verb, description, typed param descriptors with defaults — that its doc
generator renders into adapter documentation and example configs (reference
``DocGen.java:68-76,209-227``; meta declarations e.g.
``S3DirectColumnarInput.java:35-66``). Here the same contract is a pair of
dicts populated by decorators at import time, a :class:`Param` descriptor
tuple per adapter class, and :func:`adapter_docs`, which renders the
registry to a markdown page.

Param metadata is enforced, not decorative: ``Adapter.configure`` validates
every supplied param name against the declared set and raises on typos or
missing required params — the reference's typed-param contract, where a
misspelled key can never silently no-op.
"""

from __future__ import annotations

from dataclasses import dataclass

INPUTS: dict[str, type] = {}
OUTPUTS: dict[str, type] = {}


@dataclass(frozen=True)
class Param:
    """One declared adapter parameter (reference ``DefinitionMetaBuilder``
    entries, e.g. ``S3DirectColumnarInput.java:35-66``: name + type +
    default + doc, required when no default makes sense)."""

    name: str
    type: str = "str"
    default: object = None
    required: bool = False
    doc: str = ""


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


def _render_adapter(verb: str, cls: type, kind: str) -> str:
    summary = (cls.__doc__ or "").strip().splitlines()[0] if cls.__doc__ else ""
    lines = [f"### `{verb}` ({kind})", "", summary, ""]
    params = getattr(cls, "PARAMS", ())
    if params:
        lines += [
            "| param | type | required | default | doc |",
            "|---|---|---|---|---|",
        ]
        for p in params:
            default = "" if p.default is None else repr(p.default)
            lines.append(
                f"| `{p.name}` | {p.type} | {'yes' if p.required else 'no'} "
                f"| {default} | {p.doc} |"
            )
        lines.append("")
    # Example config stanza the way DocGen.java:209-227 emits one.
    example = {p.name: (p.default if p.default is not None else f"<{p.type}>")
               for p in params if p.required or p.default is not None}
    import json

    stanza = {
        "verb": verb,
        "path": "<uri>",
        "params": example,
    }
    lines += ["```json", json.dumps(stanza, indent=2, default=str), "```", ""]
    return "\n".join(lines)


def adapter_docs() -> str:
    """Render every registered adapter (verb, summary, param table, example
    config) to one markdown page — the registry self-documentation the
    reference generates in ``DocGen.java:209-227``."""
    out = [
        "# Storage adapters",
        "",
        "Generated from the adapter registry "
        "(`python -m datacooker_dist_spark.registry > docs/ADAPTERS.md`). "
        "Param names and defaults are enforced at `configure()` time: "
        "unknown names and missing required params raise.",
        "",
        "## Inputs",
        "",
    ]
    for verb in sorted(INPUTS):
        out.append(_render_adapter(verb, INPUTS[verb], "input"))
    out += ["## Outputs", ""]
    for verb in sorted(OUTPUTS):
        out.append(_render_adapter(verb, OUTPUTS[verb], "output"))
    return "\n".join(out)


def main() -> None:  # pragma: no cover - thin CLI shim
    # Run via the canonical module object: under ``python -m`` this file
    # executes as ``__main__``, whose INPUTS/OUTPUTS dicts are distinct
    # from the instance the adapters registered into.
    from datacooker_dist_spark import registry as canonical
    from datacooker_dist_spark import sources  # noqa: F401 — populate registry

    print(canonical.adapter_docs())


if __name__ == "__main__":  # pragma: no cover
    main()
