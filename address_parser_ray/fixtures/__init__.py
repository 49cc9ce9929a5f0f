from address_parser_ray.fixtures.generator import (
    VARIANT_SPECS,
    generate_corpus,
    write_corpus,
    write_corpus_ray,
)

__all__ = ["VARIANT_SPECS", "generate_corpus", "write_corpus", "write_corpus_ray"]
