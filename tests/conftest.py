import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (per the repo test contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Deterministic 40-doc corpus shared by pipeline tests."""
    from pytorchocr_ray.synth.generate import generate_corpus

    out = tmp_path_factory.mktemp("corpus")
    generate_corpus(str(out), n_docs=40, seed=123)
    return str(out)
