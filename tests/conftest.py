import shutil

import pytest

from lucene_spark.corpus import synthetic_transcripts, synthetic_transcripts_pdf
from lucene_spark.indexing.builder import IndexBuilder
from lucene_spark.session import get_spark

N_CONVS = 80


@pytest.fixture(scope="session")
def spark():
    s = get_spark(4, app="lucene_spark_tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def corpus_pdf():
    return synthetic_transcripts_pdf(N_CONVS)


@pytest.fixture(scope="session")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx") / "index")
    shutil.rmtree(d, ignore_errors=True)
    df = synthetic_transcripts(spark, N_CONVS)
    IndexBuilder(spark, d, num_segments=4).build(df)
    return d
