"""C4 config pass-through (mirrors RuntimeArgumentsTest)."""
from database_delta_plugins_spark.common import extract_prefixed, merge_pipeline_config


def test_extract_prefixed():
    args = {
        "source.connector.max.batch.size": "500",
        "source.connector.snapshot.mode": "initial",
        "other.key": "x",
        "source.connector.": "empty-suffix-ignored",
    }
    assert extract_prefixed(args) == {
        "max.batch.size": "500",
        "snapshot.mode": "initial",
    }


def test_merge_pipeline_config_types():
    defaults = {"max_files_per_trigger": 2, "normalize_lang": False, "note": "a"}
    args = {
        "source.connector.max_files_per_trigger": "8",
        "source.connector.normalize_lang": "true",
        "source.connector.extra": "y",
    }
    got = merge_pipeline_config(defaults, args)
    assert got == {"max_files_per_trigger": 8, "normalize_lang": True,
                   "note": "a", "extra": "y"}
