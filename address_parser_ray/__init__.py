"""address_parser_ray — a Ray-Data-native record-linkage / dedup engine.

Re-expresses the semantics of the reference entity-resolution system
(``dathuynh1108/address-parser``: normalize → shingle → block → gated
pairwise similarity → canonical-cluster mapping; see
``fuzz/inexus_parser.py:133-466``) as idiomatic Ray Data pipelines over a
Parquet corpus of source-code repositories with schema
``(repo, path, commit, lang, content)``.

Layout
------
- ``functions/`` — stateless vectorized kernels (normalization, hashing,
  MinHash/SimHash, similarity, text analysis).
- ``fixtures/``  — deterministic synthetic corpus generator with known
  ground-truth clusters (the reference's ``VariantSpec`` pattern,
  ``ner/build_standard_dataset.py:208-372``, re-targeted at code).
- ``stages/``    — the Ray Data pipeline stages: fingerprint, exact dedup,
  LSH blocking, actor-pool pairwise scoring, distributed connected
  components.
- ``pipelines/`` — end-to-end pipelines + the query/oracle registry.
- ``sources/``   — readers/adapters (Parquet corpus, documents-table adapter).
- ``state/``     — per-stage Parquet checkpoints with lineage sidecars.

Nothing in this package calls ``ray.init`` — the caller owns the session.
"""

from address_parser_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
