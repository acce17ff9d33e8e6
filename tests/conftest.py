from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from osmgraft.session import get_spark

    s = get_spark(app_name="osmgraft-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def synth_small(spark):
    """Deterministic 600-doc synthetic documents+blobs pair (seed 42)."""
    from osmgraft.sources.synth import SynthParams, synth_blobs, synth_documents

    p = SynthParams(n_docs=600, seed=42)
    docs = synth_documents(spark, p, partitions=8).cache()
    blobs = synth_blobs(spark, p, partitions=8).cache()
    docs.count(), blobs.count()
    return docs, blobs, p
