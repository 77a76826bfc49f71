"""Cold-start integration: build_all into a FRESH prepared root and run
a representative entry per asset family — guards the ingest-job
bootstrap (asset build ordering, path wiring) that every other test
inherits from the shared .prepared cache."""

import pytest

import datawave_spark.sources.prepared as prepared_mod

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def fresh_root(monkeypatch, tmp_path):
    monkeypatch.setattr(prepared_mod, "PREPARED_ROOT", str(tmp_path))
    return str(tmp_path)


def test_build_all_and_query_cold(spark, fresh_root):
    counts = prepared_mod.build_all(spark, SF)
    # every registered asset builder ran and produced rows (path-only
    # assets report -1 by convention)
    assert all(v != 0 for v in counts.values())
    assert {"index_frame", "doc_tf", "embedding_pq", "events_zorder",
            "classifier_weights", "wiki_dump", "bpe_merges",
            "bpe_segments", "evolving_events"} <= set(counts)
    # one query per family over the cold-built assets
    from datawave_spark.entries import QUERIES
    for key in ("index_driven_query", "content_phrase",
                "zorder_two_axis_query", "text_classifier_score",
                "text_bpe_encode", "schema_evolution_query"):
        assert QUERIES[key](spark, SF).count() >= 0
