from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hypercane_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hypercane-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def memento_rows():
    from hypercane_spark.synth import gen_mementos

    return gen_mementos(n_urits=40)  # unit tier (~1k mementos)


@pytest.fixture(scope="session")
def mementos(spark, memento_rows):
    schema = (
        "urim string, urit string, urir string, host string, "
        "memento_datetime timestamp, pubdate timestamp, language string, "
        "raw_simhash long, tf_simhash long, bpfree_text string, bpfree_len int, "
        "image_count int, card_title boolean, card_desc boolean, "
        "card_image boolean, damage double, offtopic_score double, "
        "cluster string, score_seed double, seq long"
    )
    cols = [c.split()[0] for c in schema.split(", ")]
    data = [tuple(r[c] for c in cols) for r in memento_rows]
    return spark.createDataFrame(data, schema).cache()


@pytest.fixture(scope="session")
def images_rows():
    from hypercane_spark.synth import gen_images

    return gen_images(200)


@pytest.fixture(scope="session")
def images(spark, images_rows):
    schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long"
    )
    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    data = [tuple(r[c] for c in cols) for r in images_rows]
    return spark.createDataFrame(data, schema).cache()
