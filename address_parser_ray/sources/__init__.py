from address_parser_ray.sources.corpus import (
    detect_format,
    documents_as_corpus,
    read_corpus,
    read_csv_corpus,
    write_csv,
    write_jsonl,
)

__all__ = [
    "read_corpus",
    "documents_as_corpus",
    "detect_format",
    "write_jsonl",
    "read_csv_corpus",
    "write_csv",
]
