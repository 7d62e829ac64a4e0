"""Session-scoped Ray + shared fixture corpus for the test suite."""

from __future__ import annotations

import os
import shutil

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_corpus(ray_session, tmp_path_factory):
    """Small generated pages corpus + built index, shared by the suite."""
    from lucene_solr_ray.fixtures import write_pages_parquet
    from lucene_solr_ray.index.build import build_index

    root = str(tmp_path_factory.mktemp("corpus"))
    pages_dir = os.path.join(root, "pages")
    index_dir = os.path.join(root, "index")
    files = write_pages_parquet(pages_dir, 600, n_files=4)
    manifest = build_index(
        files,
        index_dir,
        rows_per_partition=128,
        multi_facet_fields=("links_sim",),
        stored_fields=("text",),
    )
    yield {"files": files, "index_dir": index_dir, "manifest": manifest, "root": root}
    shutil.rmtree(root, ignore_errors=True)


@pytest.fixture(scope="session")
def oracle_rows(pages_corpus):
    """Deduped (keep-most-recent per url) rows, the oracle's view."""
    import pyarrow.parquet as pq

    df = pq.read_table(pages_corpus["files"]).to_pandas()
    df = df.sort_values(["url", "warc_ts", "doc_id"]).groupby("url", as_index=False).last()
    return df.to_dict("records")


@pytest.fixture(scope="session")
def oracle_index(oracle_rows):
    from lucene_solr_ray.oracle import OracleIndex

    return OracleIndex(oracle_rows)
