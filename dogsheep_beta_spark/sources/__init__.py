from dogsheep_beta_spark.sources.registry import (
    register_testdata,
    register_table,
    TESTDATA_TABLES,
)

__all__ = ["register_testdata", "register_table", "TESTDATA_TABLES"]
