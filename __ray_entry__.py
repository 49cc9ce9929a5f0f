"""Driver contract for the Ray-Data entity-resolution engine.

``entry()`` runs the flagship blocking → scoring → clustering pipeline
on the sf0.001 documents table (adapted to the corpus schema).
``queries()`` exposes every implemented operator (SURVEY.md §2 +
training-data extensions) as ``sf_dir -> result`` callables;
``oracle_sql()`` gives the DuckDB-equivalent SQL for the
SQL-expressible ones.

Ray is initialised by the driver BEFORE this module is imported —
nothing here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents-as-corpus →
    entity clusters (record_id, cluster_id, content_sha256)."""
    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.rayutil import pinned_join, project
    from address_parser_ray.sources import documents_as_corpus

    corpus = documents_as_corpus("/root/testdata/sf0.001")
    result = dedup_pipeline(corpus)
    # attach the invariant column so the driver sees a stable schema:
    # (record_id, cluster_id, content_sha256)
    sha = project(
        result.fingerprints, {"record_id": "rid", "content_sha256": "content_sha256"}
    )
    joined = pinned_join(result.assignments, sha, on="record_id", right_on="rid")
    return joined


def queries() -> dict[str, Callable[[str], Any]]:
    from address_parser_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from address_parser_ray.pipelines.oracle import ORACLE_SQL

    return dict(ORACLE_SQL)
