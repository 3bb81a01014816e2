from .corpus import (  # noqa: F401
    DOCUMENT_SCHEMA,
    quarantine_split,
    read_jsonl_corpus,
    write_jsonl_corpus,
)
