import os
import sys
import tempfile

import pytest

# A relative TMPDIR (e.g. "s/tmp") would drop every test's mkdtemp inside the
# repo tree and get swept into git; pin the temp root absolute for all tests.
if not os.path.isabs(tempfile.gettempdir()):
    tempfile.tempdir = "/tmp"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # SPARK_GRAFT_MASTER=local-cluster[2,4,4096] runs the whole suite
    # under a real executor boundary (r11 cluster-evidence task);
    # default stays local[4] for iteration speed.
    master = os.environ.get("SPARK_GRAFT_MASTER", "local[4]")
    builder = (
        SparkSession.builder.master(master)
        .appName("dogsheep_beta_spark_tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    if master.startswith("local-cluster"):
        builder = builder.config("spark.executor.memory", "4g")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if not master.startswith("local["):
        # real executor boundary: ship the package like --py-files would
        from dogsheep_beta_spark.deploy import ship_package

        ship_package(spark)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session", autouse=True)
def _no_repo_relative_debris():
    """Fail the session if any test wrote a repo-relative temp tree.
    Round 7's `s/` debris came from str.join on this module's plain-str
    tmpdir fixture (`tmpdir.join("ssj_src")` interleaves the tmpdir
    between the CHARACTERS of the argument, yielding a relative path
    starting with 's'); this guard makes any recurrence of that class
    loud instead of a gitignored surprise."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    yield
    stray = os.path.join(repo, "s")
    assert not os.path.exists(stray), (
        f"repo-relative temp debris regrew at {stray} — some path is "
        "resolving against the repo cwd (str.join on a str tmpdir, or "
        "a relative TMPDIR/checkpoint dir)"
    )


@pytest.fixture(scope="session")
def dogs_index(spark):
    """The CLI round-trip fixture from FIXTURES.md §1 / tests/test_cli.py."""
    from dogsheep_beta_spark.indexer import build_search_index

    rows = [
        (1, "Cleo", "running", 5, "2020-08-22 04:41:33"),
        (2, "Pancakes", "chasing", 4, "2020-08-17 11:35:42"),
    ]
    spark.createDataFrame(
        rows, "id int, name string, likes string, age int, created string"
    ).createOrReplaceTempView("dogs")
    config = {
        "dogs.db": {
            "dogs": {
                "sql": """
                    select
                        id as key,
                        name as title,
                        created as timestamp,
                        case name when 'Cleo' then 1 else 2 end as category,
                        likes as search_1
                    from dogs
                """
            }
        }
    }
    return build_search_index(spark, config)


SHA_COMMIT_1 = "a5b39c5052e9fc4a6ba5d4a0e74e3a1f3b8e7523"
SHA_COMMIT_2 = "5becbf70e5a4f16dbacedaecb40f78bca343c57b"


@pytest.fixture(scope="session")
def plugin_index(spark):
    """emails + commits fixture (FIXTURES.md §2-3 / tests/test_plugin.py)."""
    from dogsheep_beta_spark.indexer import build_search_index

    emails = [
        (1, "Hey there #dogfest", "An email about things", "blah@example.com", "2020-08-01T00:05:02"),
        (2, "What's going on", "Another email about things", "blah@example.com", "2020-08-02T00:05:02"),
    ]
    spark.createDataFrame(
        emails, "id int, subject string, body string, from_ string, date string"
    ).createOrReplaceTempView("emails")
    commits = [
        (
            SHA_COMMIT_1,
            "Another commit to things",
            "dogsheep/dogsheep-beta",
            "2020-08-01T00:05:02",
        ),
        (
            SHA_COMMIT_2,
            "Added some tests",
            "dogsheep/dogsheep-beta",
            "2020-08-02T12:35:48",
        ),
    ]
    spark.createDataFrame(
        commits, "sha string, message string, repo_name string, committer_date string"
    ).createOrReplaceTempView("commits")
    config = {
        "emails.db": {
            "emails": {
                "sql": """
                    select id as key, subject as title, date as timestamp,
                           0 as is_public, body as search_1
                    from emails
                """
            }
        },
        "github.db": {
            "commits": {
                "sql": """
                    select sha as key, 'Commit to ' || repo_name as title,
                           committer_date as timestamp, 1 as category,
                           1 as is_public, message as search_1
                    from commits
                """
            }
        },
    }
    return build_search_index(spark, config)
