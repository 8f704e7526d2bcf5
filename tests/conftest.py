import os
import shutil

import pytest

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("veloci_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def index_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("index")
    yield str(d)
    shutil.rmtree(str(d), ignore_errors=True)


# ---- shared golden corpus + built index (used across test modules) --------

N_DOCS = 120
SEGMENT_DOCS = 32  # small → several segments even on the tiny corpus


def sorted_rows(n=N_DOCS):
    from veloci_spark.synth import generate_rows

    rows = generate_rows(n)
    rows.sort(key=lambda r: r["url"])
    for i, r in enumerate(rows):
        r["doc_id"] = i
    return rows


@pytest.fixture(scope="session")
def corpus():
    return sorted_rows()


@pytest.fixture(scope="session")
def ref_index(corpus):
    from veloci_spark import pyref
    from veloci_spark.config import webtext_config

    return pyref.RefIndex(corpus, webtext_config(segment_docs=SEGMENT_DOCS))


@pytest.fixture(scope="session")
def spark_index(spark, corpus, index_dir):
    from veloci_spark.build import build_index
    from veloci_spark.config import webtext_config
    from veloci_spark.search import FulltextIndex
    from veloci_spark.synth import WEBTEXT_SCHEMA

    cfg = webtext_config(segment_docs=SEGMENT_DOCS)
    df = spark.createDataFrame(
        [{k: r[k] for k in ("url", "warc_ts", "html", "text", "lang")} for r in corpus],
        schema=WEBTEXT_SCHEMA,
    ).repartition(4)
    build_index(spark, df, cfg, index_dir)
    return FulltextIndex(spark, index_dir).cache()
