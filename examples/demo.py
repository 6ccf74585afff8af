"""Runnable tour of the engine. `python examples/demo.py [sf_dir]`.

Shows the three usage styles side by side:
  1. SQL with the registered function surface (the reference's UX)
  2. DataFrame API with the operator library
  3. the scheduled runner executing a task script
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from data_misc_tools_spark import build_session
    from data_misc_tools_spark.session import load_tables

    spark = build_session(app_name="demo")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)

    print("== 1. SQL surface (reference-style) ==")
    spark.sql(
        """
        SELECT n_name,
               max_by(c_name, c_acctbal) AS top_customer,
               round(max(c_acctbal), 2)  AS top_acctbal
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name LIMIT 5
        """
    ).show()
    spark.sql(
        "SELECT url_encode('a b&c') AS enc, su_strip('[42]', '[]') AS stripped, "
        "m_add(map('a','1'), map('a','2','b','3')) AS merged"
    ).show(truncate=False)

    print("== 2. Operator library ==")
    from data_misc_tools_spark.operators.dedup import minhash_candidate_pairs
    from data_misc_tools_spark.operators.similarity import cosine_topk
    from data_misc_tools_spark.operators.text import language_id

    docs = spark.table("documents")
    print("minhash candidate pairs:", minhash_candidate_pairs(docs).count())
    language_id(docs).show(5)
    emb = spark.table("embeddings")
    cosine_topk(emb.filter("vec_id < 2"), emb, k=3).show()

    print("== 3. Scheduled runner ==")
    from data_misc_tools_spark.runner import Runner, ScriptTask

    workdir = tempfile.mkdtemp(prefix="demo_runner_")
    script = os.path.join(workdir, "task.py")
    with open(script, "w") as f:
        f.write(
            "def run(spark, param):\n"
            "    n = spark.table('events').count()\n"
            "    return {'tick': (param or {}).get('tick', 0) + 1, 'events': n}\n"
        )
    runner = Runner(spark, os.path.join(workdir, "records"))
    task = ScriptTask(script, interval="PT0S")
    print("run 1:", runner.run_once(task))
    print("run 2 (result fed back):", runner.run_once(task, force=True))
    runner.records().show(truncate=60)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
