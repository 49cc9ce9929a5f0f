from address_parser_ray.sources.corpus import (
    documents_as_corpus,
    read_corpus,
)

__all__ = ["read_corpus", "documents_as_corpus"]
