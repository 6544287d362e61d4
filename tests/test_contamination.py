"""L23 contamination-report adversarial parity (ADVICE r10): a train doc
with <3 words has ZERO shingles — it must count as exact-gate CLEAN in
both engines (it can overlap nothing). Before the fix the oracle's
exact_clean CTE started from `tagged` (shingled docs only), so a
shingle-less train doc silently counted as a FAIL on the DuckDB side
while Spark marked it clean."""
import hashlib

import duckdb
import pytest


def _split(doc_id: int) -> int:
    return int(hashlib.md5(f"split:{doc_id}".encode())
               .hexdigest()[:8], 16) % 10


def _pick(pred, start=0):
    i = start
    while True:
        if pred(_split(i)):
            return i
        i += 1


LONG_A = ("the quick brown fox jumps over the lazy dog and then runs "
          "far away into the deep dark forest tonight under the moon")
LONG_B = ("microscopy plates under the confocal objective emit "
          "fluorescence captured as z stacks across channels with "
          "physical pixel sizes recorded in metadata blocks")


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("l23fix")
    eval_id = _pick(lambda s: s == 0)
    # train docs: one sharing shingles with the eval doc (exact-gate
    # FAIL), one clean long doc, and the adversarial SHORT doc
    t_dirty = _pick(lambda s: s != 0, eval_id + 1)
    t_clean = _pick(lambda s: s != 0, t_dirty + 1)
    t_short = _pick(lambda s: s != 0, t_clean + 1)
    rows = [
        (eval_id, LONG_A, "en", "web", len(LONG_A)),
        (t_dirty, LONG_A, "en", "web", len(LONG_A)),
        (t_clean, LONG_B, "en", "web", len(LONG_B)),
        (t_short, "hi there", "en", "web", 8),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet"))
    return str(d), t_short


def test_zero_shingle_train_doc_parity(spark, fixture_dir):
    from bioio_spark.queries import REGISTRY

    sf_dir, t_short = fixture_dir
    spec = REGISTRY["l23_contamination_report"]
    srows = sorted(tuple(r) for r in spec.fn(spark, sf_dir).collect())

    con = duckdb.connect()
    # Spark writes a directory of part files; DuckDB needs the glob
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet/*.parquet'")
    drows = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert srows == drows, (srows, drows)
    # the exact gate must NOT count the shingle-less train doc as a
    # fail: exactly one train doc (the LONG_A twin) fails it
    exact = [r for r in srows if r[1] == "exact_overlap"][0]
    assert exact[2] == 1  # n_fail
