import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tlgs_spark.corpus import generate_pandas, generate_spark  # noqa: E402
from tlgs_spark.indexer.build import build_index  # noqa: E402
from tlgs_spark.session import get_spark  # noqa: E402

N_CONV = 60  # t1-scale corpus: ~1.2k turns, builds in ~1 min once per session
INDEX_DIR = "/tmp/tlgs_spark_test_index"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tlgs_spark_tests", cores=8)
    yield s


@pytest.fixture(scope="session")
def corpus_pdf():
    pdf = generate_pandas(N_CONV)
    return pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@pytest.fixture(scope="session")
def index_dir(spark):
    """A built index over the deterministic corpus (session-cached on
    disk: rebuilt only when absent, so repeated pytest runs are fast)."""
    meta_ok = os.path.exists(os.path.join(INDEX_DIR, "index_meta.json"))
    if meta_ok:
        import json

        from tlgs_spark.indexer.build import DOCS_LAYOUT_SHARDED, POSTINGS_FORMAT
        from tlgs_spark.tokenizer import ANALYZER_VERSION

        with open(os.path.join(INDEX_DIR, "index_meta.json")) as f:
            cached = json.load(f)
        # stale cache from an older layout/format/analyzer generation →
        # rebuild
        meta_ok = (
            cached.get("docs_layout") == DOCS_LAYOUT_SHARDED
            and cached.get("postings_format") == POSTINGS_FORMAT
            and cached.get("tokenizer") == ANALYZER_VERSION
        )
    if not meta_ok:
        shutil.rmtree(INDEX_DIR, ignore_errors=True)
        sdf = generate_spark(spark, N_CONV, partitions=4)
        build_index(spark, sdf, INDEX_DIR, n_shards=7, lineage="tests:N_CONV=60")
    return INDEX_DIR


@pytest.fixture(scope="session")
def oracle_index(corpus_pdf):
    from tlgs_spark import oracle as O

    return O.build_index(list(zip(range(len(corpus_pdf)), corpus_pdf.text)))


@pytest.fixture(scope="session")
def search_index(spark, index_dir):
    from tlgs_spark.query.engine import SearchIndex

    return SearchIndex(spark, index_dir)
