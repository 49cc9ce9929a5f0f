import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (init is ~seconds)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_corpus(tmp_path_factory):
    """Deterministic fixture corpus with ground-truth clusters
    (30 seeds, ≈175 rows)."""
    from address_parser_ray.fixtures import write_corpus

    out = str(tmp_path_factory.mktemp("fx"))
    corpus_dir, labels_path = write_corpus(out, n_seeds=30, variants_per_seed=8)
    return corpus_dir, labels_path
