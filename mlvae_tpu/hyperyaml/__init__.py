from mlvae_tpu.hyperyaml.loader import (
    load_hyperyaml,
    load_hyperpyyaml,
    resolve_references,
    recursive_update,
    TaggedValue,
    Placeholder,
    RefTag,
    dump_hyperyaml,
)

__all__ = [
    "load_hyperyaml",
    "load_hyperpyyaml",
    "resolve_references",
    "recursive_update",
    "TaggedValue",
    "Placeholder",
    "RefTag",
    "dump_hyperyaml",
]
