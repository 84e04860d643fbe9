import pytest


@pytest.fixture(scope="session")
def spark():
    from indu_doc_transformer_spark.plans.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
