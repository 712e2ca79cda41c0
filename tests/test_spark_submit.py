"""North-rule packaging check: the build + search jobs run via
``spark-submit --py-files tlgs_spark.zip`` (same invocation shape as a
multi-executor cluster; master comes from the CLI, never the code)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit():
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else shutil.which("spark-submit")


@pytest.mark.slow
def test_spark_submit_build_and_search(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit binary")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_pyfiles_zip import make_zip

    zip_path = make_zip(str(tmp_path / "tlgs_spark.zip"), REPO)
    idx = str(tmp_path / "idx")
    env = dict(os.environ)
    env.pop("PYSPARK_DRIVER_PYTHON", None)
    env["PYSPARK_PYTHON"] = sys.executable

    common = [
        submit, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
    ]
    r = subprocess.run(
        common
        + [
            os.path.join(REPO, "jobs", "build_index_job.py"),
            "--synthesize", "30", "--index-dir", idx, "--n-shards", "5",
        ],
        capture_output=True, text=True, env=env, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert m["shards_built"] == 5 and m["n_docs"] > 0

    r2 = subprocess.run(
        common
        + [
            os.path.join(REPO, "jobs", "search_job.py"),
            "--index-dir", idx, "--query", "marker000", "--k", "5",
        ],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    out = json.loads([l for l in r2.stdout.splitlines() if l.startswith("{")][-1])
    assert len(out["results"]) >= 1

    # distributed path through spark-submit as well
    r3 = subprocess.run(
        common
        + [
            os.path.join(REPO, "jobs", "search_job.py"),
            "--index-dir", idx, "--query", "marker000", "--k", "5", "--distributed",
        ],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r3.returncode == 0, r3.stderr[-2000:]
    out3 = json.loads([l for l in r3.stdout.splitlines() if l.startswith("{")][-1])
    assert [r["doc_id"] for r in out3["results"]] == [r["doc_id"] for r in out["results"]]

    # admin CLI (the tlgs_ctl analog): indexstatus → purge → indexstatus
    # → vacuum, all through the same spark-submit packaging
    def _ctl(*argv, timeout=420):
        r = subprocess.run(
            common + [os.path.join(REPO, "jobs", "ctl_job.py"), *argv],
            capture_output=True, text=True, env=env, timeout=timeout,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])

    stat = _ctl("indexstatus", "--index-dir", idx)
    assert stat["shards_done"] == 5 and not stat["shards_pending"]
    n_docs_before = stat["collection_stats"]["n_docs"]
    assert n_docs_before > 0

    # purge needs the transcript source; generate_pandas is row-identical
    # to the --synthesize corpus the build used
    from tlgs_spark.corpus import generate_pandas

    src = str(tmp_path / "transcripts.parquet")
    pdf = generate_pandas(30)
    # Spark can't scan TIMESTAMP(NANOS) parquet — write microsecond ts
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(src, index=False)
    purged = _ctl("purge", "--index-dir", idx, "--input", src,
                  "--pattern", "conv000001")
    assert purged["purged_pattern"] == "conv000001"

    stat2 = _ctl("indexstatus", "--index-dir", idx)
    assert stat2["collection_stats"]["n_docs"] < n_docs_before
    # the purge commit appended to the snapshot log
    assert len(stat2["snapshots"]) > len(stat["snapshots"])

    vac = _ctl("vacuum", "--index-dir", idx, "--grace-s", "0",
               "--retain-snapshots", "1")
    assert vac["n_removed"] >= 0

    # compact: the purge left id gaps (ceiling > live docs); compaction
    # re-densifies from the committed docs with no input corpus
    assert stat2["id_space"]["ceiling_ratio"] > 1.0
    comp = _ctl("compact", "--index-dir", idx)
    assert comp["mode"] == "compact"
    assert comp["ceiling_after"] == stat2["collection_stats"]["n_docs"]
    stat3 = _ctl("indexstatus", "--index-dir", idx)
    assert stat3["id_space"]["ceiling_ratio"] == 1.0
    assert stat3["collection_stats"]["n_docs"] == stat2["collection_stats"]["n_docs"]
