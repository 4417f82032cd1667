from .core import (
    EXTRACT_SCHEMA,
    SPANS_TYPE,
    assemble_conversations,
    extract_batch,
    extract_turns,
)

__all__ = [
    "EXTRACT_SCHEMA",
    "SPANS_TYPE",
    "assemble_conversations",
    "extract_batch",
    "extract_turns",
]
